"""TPC-DS-shaped analytic corpus, adapted to the driver schema.

The reference's secondary workload is TPC-DS (205 query files,
`testdata/workloads/tpcds/queries/`). The full schema isn't present,
so these entries reproduce the *distinctive plan shapes* of well-known
DS queries on the TPC-H-subset tables: rollup + grouping() + rank
within grouping level (q36), compare-to-group-average with a
correlated threshold (q1), one-row multi-band scalar aggregates (q88),
order-size distribution banding (q34), period-over-period self-join
of an aggregate (q59), and rolling-window deviation filtering (q89).

Determinism: ratios are single double divisions of exact decimal sums;
every rank has a total tie-break; rollup NULL slots are normalized
through grouping() so both engines label subtotal rows identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from incubator_impala_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _d(col: str):
    return F.col(col).cast("decimal(12,2)")


# ---------------------------------------------------------------------------
# q36 shape: margin over ROLLUP(type, brand), rank within grouping level
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q36_style_rollup_rank",
    """
    WITH m AS (
      SELECT p_type, p_brand,
        CAST(GROUPING(p_type) * 2 + GROUPING(p_brand) AS INT) AS lvl,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
          AS DOUBLE) AS margin
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY ROLLUP(p_type, p_brand))
    SELECT lvl, p_type, p_brand, margin,
      CAST(RANK() OVER (PARTITION BY lvl, p_type
                        ORDER BY margin, p_brand) AS BIGINT) AS rnk
    FROM m
    """,
)
def tpcds_q36_style_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3): the ROLLUP's Expand would push three copies of
    # the joined fact through the aggregate; the margin's numerator and
    # denominator are algebraic decimal sums, so the two super-levels
    # re-aggregate from the (p_type, p_brand) leaf result — one fact
    # pass, bit-identical margins (exact sums; the double division
    # happens per level on identical operands). lvl is the
    # grouping()-arith value as a per-level literal.
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (_d("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _d("l_discount")))
    leaf = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_brand")
        .agg(
            F.sum(disc).alias("_sd"),
            F.sum(_d("l_extendedprice")).alias("_sp"),
        )
    )
    null_s = F.lit(None).cast("string")

    def lvl(df, type_col, brand_col, level):
        return df.select(
            type_col.alias("p_type"), brand_col.alias("p_brand"),
            F.lit(level).cast("int").alias("lvl"),
            (F.col("_sd").cast("double") / F.col("_sp").cast("double"))
            .alias("margin"),
        )

    m = (
        lvl(leaf, F.col("p_type"), F.col("p_brand"), 0)
        .unionByName(lvl(
            leaf.groupBy("p_type")
            .agg(F.sum("_sd").alias("_sd"), F.sum("_sp").alias("_sp")),
            F.col("p_type"), null_s, 1,
        ))
        .unionByName(lvl(
            leaf.agg(F.sum("_sd").alias("_sd"), F.sum("_sp").alias("_sp")),
            null_s, null_s, 3,
        ))
    )
    w = Window.partitionBy("lvl", "p_type").orderBy("margin", "p_brand")
    return m.select(
        "lvl", "p_type", "p_brand", "margin",
        F.rank().over(w).cast("bigint").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# q1 shape: customers above 1.2× their nation's average spend
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q1_style_above_group_avg",
    """
    WITH spend AS (
      SELECT c_nationkey, c_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_nationkey, c_custkey),
    threshold AS (
      SELECT c_nationkey,
        CAST(SUM(total) AS DOUBLE) / COUNT(*) AS avg_total
      FROM spend GROUP BY c_nationkey)
    SELECT s.c_custkey, s.total
    FROM spend s JOIN threshold t ON s.c_nationkey = t.c_nationkey
    WHERE CAST(s.total AS DOUBLE) > t.avg_total * 1.2
    ORDER BY s.c_custkey
    """,
)
def tpcds_q1_style_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    spend = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(_d("o_totalprice")).cast("decimal(38,2)").alias("total"))
    )
    threshold = spend.groupBy("c_nationkey").agg(
        (F.sum("total").cast("double") / F.count("*")).alias("avg_total")
    )
    return (
        spend.join(F.broadcast(threshold), "c_nationkey")
        .where(F.col("total").cast("double") > F.col("avg_total") * 1.2)
        .select("c_custkey", "total")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# q88 shape: one row, N band counts (conditional aggregation)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q88_style_band_counts",
    """
    SELECT
      CAST(count(*) FILTER (l_quantity < 10) AS BIGINT) AS b1,
      CAST(count(*) FILTER (l_quantity >= 10 AND l_quantity < 25) AS BIGINT) AS b2,
      CAST(count(*) FILTER (l_quantity >= 25 AND l_quantity < 40) AS BIGINT) AS b3,
      CAST(count(*) FILTER (l_quantity >= 40) AS BIGINT) AS b4
    FROM lineitem
    """,
)
def tpcds_q88_style_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")

    def band(cond):
        return F.count(F.when(cond, 1))

    return li.agg(
        band(q < 10).alias("b1"),
        band((q >= 10) & (q < 25)).alias("b2"),
        band((q >= 25) & (q < 40)).alias("b3"),
        band(q >= 40).alias("b4"),
    )


# ---------------------------------------------------------------------------
# q34 shape: order-size distribution (two-level aggregation + banding)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q34_style_order_sizes",
    """
    WITH sizes AS (
      SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey)
    SELECT
      CASE WHEN n_items <= 2 THEN 'small'
           WHEN n_items <= 4 THEN 'medium'
           ELSE 'large' END AS size_band,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(min(n_items) AS BIGINT) AS min_items,
      CAST(max(n_items) AS BIGINT) AS max_items
    FROM sizes GROUP BY 1
    """,
)
def tpcds_q34_style_order_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    band = (
        F.when(F.col("n_items") <= 2, "small")
        .when(F.col("n_items") <= 4, "medium")
        .otherwise("large")
    )
    return (
        sizes.groupBy(band.alias("size_band"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min("n_items").cast("bigint").alias("min_items"),
            F.max("n_items").cast("bigint").alias("max_items"),
        )
    )


# ---------------------------------------------------------------------------
# q59 shape: period-over-period — the same aggregate joined to itself
# one month apart, ratio per segment
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q59_style_month_over_month",
    """
    WITH monthly AS (
      SELECT c_mktsegment AS seg,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, year(o_orderdate), month(o_orderdate))
    SELECT a.seg, CAST(a.y AS INT) AS y, CAST(a.m AS INT) AS m,
      CAST(a.rev AS DECIMAL(38,2)) AS rev,
      CAST(b.rev AS DECIMAL(38,2)) AS prev_rev,
      CAST(a.rev AS DOUBLE) / CAST(b.rev AS DOUBLE) AS mom_ratio
    FROM monthly a JOIN monthly b
      ON a.seg = b.seg AND a.y * 12 + a.m = b.y * 12 + b.m + 1
    ORDER BY a.seg, y, m
    """,
)
def tpcds_q59_style_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period self-join of one aggregate (q59 shape).
    Scale: monthly agg shuffles once on (seg, y, m); the self-join key
    reuses that partitioning; ratio is one double division over exact
    decimal sums (bit-identical both engines)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.sum(_d("o_totalprice")).alias("rev"))
    )
    a = monthly.select(
        "seg", F.col("y").alias("ya"), F.col("m").alias("ma"),
        F.col("rev").alias("rev_a"),
    )
    b = monthly.select(
        F.col("seg").alias("seg_b"), F.col("y").alias("yb"),
        F.col("m").alias("mb"), F.col("rev").alias("rev_b"),
    )
    return (
        a.join(
            b,
            (F.col("seg") == F.col("seg_b"))
            & (F.col("ya") * 12 + F.col("ma") == F.col("yb") * 12 + F.col("mb") + 1),
        )
        .select(
            "seg",
            F.col("ya").cast("int").alias("y"),
            F.col("ma").cast("int").alias("m"),
            F.col("rev_a").cast("decimal(38,2)").alias("rev"),
            F.col("rev_b").cast("decimal(38,2)").alias("prev_rev"),
            (F.col("rev_a").cast("double") / F.col("rev_b").cast("double"))
            .alias("mom_ratio"),
        )
        .orderBy("seg", "y", "m")
    )


# ---------------------------------------------------------------------------
# q89 shape: rolling-window deviation — monthly revenue per part type
# vs its 3-month centered rolling sum, flag months far above trend
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q89_style_rolling_deviation",
    """
    WITH monthly AS (
      SELECT p_type,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY p_type, year(o_orderdate), month(o_orderdate)),
    rolled AS (
      SELECT p_type, y, m, rev,
        SUM(rev) OVER (PARTITION BY p_type ORDER BY y * 12 + m
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS roll_sum,
        COUNT(*) OVER (PARTITION BY p_type ORDER BY y * 12 + m
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS roll_n
      FROM monthly)
    SELECT p_type, CAST(y AS INT) AS y, CAST(m AS INT) AS m,
      CAST(rev AS DECIMAL(38,2)) AS rev,
      CAST(roll_sum AS DECIMAL(38,2)) AS roll_sum,
      CAST(roll_n AS BIGINT) AS roll_n
    FROM rolled
    WHERE rev * 2 > roll_sum AND roll_n = 3
    ORDER BY p_type, y, m
    """,
)
def tpcds_q89_style_rolling_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window deviation filter (q89 shape): months whose
    revenue exceeds the rest of their 3-month window combined. The
    deviation test is pure decimal arithmetic (rev*2 > roll_sum) —
    no float rounding at the filter boundary."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "p_type",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.sum(_d("l_extendedprice")).alias("rev"))
    )
    w = Window.partitionBy("p_type").orderBy(F.col("y") * 12 + F.col("m")).rowsBetween(-1, 1)
    rolled = monthly.select(
        "p_type", "y", "m", "rev",
        F.sum("rev").over(w).alias("roll_sum"),
        F.count("*").over(w).alias("roll_n"),
    )
    return (
        rolled.where((F.col("rev") * 2 > F.col("roll_sum")) & (F.col("roll_n") == 3))
        .select(
            "p_type",
            F.col("y").cast("int").alias("y"),
            F.col("m").cast("int").alias("m"),
            F.col("rev").cast("decimal(38,2)").alias("rev"),
            F.col("roll_sum").cast("decimal(38,2)").alias("roll_sum"),
            F.col("roll_n").cast("bigint").alias("roll_n"),
        )
        .orderBy("p_type", "y", "m")
    )
