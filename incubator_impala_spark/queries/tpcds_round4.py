"""TPC-DS plan shapes, round 4 — the remaining distinct shapes named in
the round-3 review (reference corpus: 205 files under
`testdata/workloads/tpcds/queries/`, e.g. tpcds-q4.test, tpcds-q14a.test,
tpcds-q31.test, tpcds-q64.test, tpcds-q72.test, tpcds-q77a.test,
tpcds-q80a.test), adapted to the driver's TPC-H-subset tables:

- q4 (also q11): multi-year customer spend per channel, self-joined
  across 3 channels x 2 years; keep customers whose "catalog" growth
  beats both other channels.
- q14: items shared by all three channels (INTERSECT chain) feeding a
  channel/type ROLLUP of sales of only those items.
- q31: per-nation quarter-over-quarter growth ratio of one channel
  compared against another across consecutive quarters (6-leg
  self-join chain).
- q64: wide snowflake join (fact + 5 dims) aggregated per
  (brand, nation, year), year legs self-joined with a count compare.
- q72: hash join with a residual date-offset conjunct (ship date more
  than 5 days after order date), weekly late-shipment report.
- q77: per-channel P&L — sales and returns aggregated separately,
  FULL OUTER joined, rolled up over (channel, nation).
- q80: item-level net-of-returns P&L via LEFT JOIN to a pre-aggregated
  returns side, per channel.
- q9: single-row CASE report over five quantity-bucket conditional
  aggregates (the reference's scalar-subquery bucket report).

Determinism rules follow tpcds_round3.py: all money math is DECIMAL
end-to-end; ratios are ONE double division of exact decimals; ratio
comparisons cross-multiply in decimal; every rank/limit has a total
tie-break; channels are deterministic key-mod predicates.
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
# q4/q11 shape: three-channel year-over-year preference self-join
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q4_style_three_channel_yoy_preference",
    """
    WITH t AS (
      SELECT o_custkey, year(o_orderdate) AS y, o_orderkey % 3 AS ch,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      FROM orders WHERE year(o_orderdate) IN (1996, 2000)
      GROUP BY o_custkey, year(o_orderdate), o_orderkey % 3)
    SELECT st1.o_custkey AS custkey,
      CAST(st1.rev AS DECIMAL(38,2)) AS st_y1,
      CAST(st2.rev AS DECIMAL(38,2)) AS st_y2,
      CAST(ct1.rev AS DECIMAL(38,2)) AS ct_y1,
      CAST(ct2.rev AS DECIMAL(38,2)) AS ct_y2,
      CAST(wb1.rev AS DECIMAL(38,2)) AS wb_y1,
      CAST(wb2.rev AS DECIMAL(38,2)) AS wb_y2
    FROM t st1
    JOIN t st2 ON st1.o_custkey = st2.o_custkey
    JOIN t ct1 ON st1.o_custkey = ct1.o_custkey
    JOIN t ct2 ON st1.o_custkey = ct2.o_custkey
    JOIN t wb1 ON st1.o_custkey = wb1.o_custkey
    JOIN t wb2 ON st1.o_custkey = wb2.o_custkey
    WHERE st1.ch = 0 AND st1.y = 1996 AND st2.ch = 0 AND st2.y = 2000
      AND ct1.ch = 1 AND ct1.y = 1996 AND ct2.ch = 1 AND ct2.y = 2000
      AND wb1.ch = 2 AND wb1.y = 1996 AND wb2.ch = 2 AND wb2.y = 2000
      AND st1.rev > 0 AND ct1.rev > 0 AND wb1.rev > 0
      AND ct2.rev * st1.rev > st2.rev * ct1.rev
      AND ct2.rev * wb1.rev > wb2.rev * ct1.rev
    ORDER BY custkey
    """,
)
def tpcds_q4_style_three_channel_yoy_preference(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q4 shape (and q11's two-channel special case): customers whose
    "catalog" channel year-over-year growth exceeds both the "store"
    and "web" channels'. One aggregate self-joined six ways on
    custkey; both growth comparisons cross-multiply in exact decimal,
    so no division enters any predicate. Scale: the agg shuffles once
    on (custkey, y, ch); all six join legs reuse the custkey hash
    partitioning (Spark plans one Exchange under the agg and sorts/
    re-uses for each equi-join leg), and each leg is pre-filtered to
    one (ch, y) cell before joining, so leg cardinality is ~|custkey|.
    Reference: testdata/workloads/tpcds/queries/tpcds-q4.test,
    tpcds-q11.test."""
    # r11 (guide §2.3/§2.4): the six join legs each select one
    # (channel, year) cell of the same per-(custkey, y, ch) aggregate
    # — equivalently ONE per-custkey aggregate with six conditional
    # sums. The 6-way self-join (five joins plus six consumers of the
    # aggregate subtree) collapses into one exchange; the inner-join
    # requirement (a customer must have rows in every cell) becomes
    # six NOT-NULL predicates (a conditional sum is NULL exactly when
    # its cell has no rows). Values identical: same decimal sums, same
    # cross-multiplied growth predicates.
    orders = load_table(spark, sf_dir, "orders")

    def cell(chv: int, yv: int):
        return F.sum(
            F.when(
                (F.col("o_orderkey") % 3 == chv)
                & (F.year("o_orderdate") == yv),
                _d("o_totalprice"),
            )
        ).cast("decimal(18,2)")

    t = (
        orders.where(F.year("o_orderdate").isin(1996, 2000))
        .groupBy("o_custkey")
        .agg(
            cell(0, 1996).alias("st_y1"), cell(0, 2000).alias("st_y2"),
            cell(1, 1996).alias("ct_y1"), cell(1, 2000).alias("ct_y2"),
            cell(2, 1996).alias("wb_y1"), cell(2, 2000).alias("wb_y2"),
        )
    )
    cols = ["st_y1", "st_y2", "ct_y1", "ct_y2", "wb_y1", "wb_y2"]
    import functools
    all_cells = functools.reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in cols]
    )
    out = t.where(all_cells).where(
        (F.col("st_y1") > 0) & (F.col("ct_y1") > 0) & (F.col("wb_y1") > 0)
        & (F.col("ct_y2") * F.col("st_y1") > F.col("st_y2") * F.col("ct_y1"))
        & (F.col("ct_y2") * F.col("wb_y1") > F.col("wb_y2") * F.col("ct_y1"))
    )
    return out.select(
        F.col("o_custkey").alias("custkey"),
        *[F.col(c).cast("decimal(38,2)").alias(c) for c in cols],
    ).orderBy("custkey")


# ---------------------------------------------------------------------------
# q14 shape: cross-channel shared items (INTERSECT) + channel rollup
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q14_style_shared_items_rollup",
    """
    WITH shared AS (
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_orderkey % 3 = 0
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_orderkey % 3 = 1
      INTERSECT
      SELECT DISTINCT l_partkey FROM lineitem WHERE l_orderkey % 3 = 2)
    SELECT
      CAST(GROUPING(ch) * 2 + GROUPING(p_type) AS INT) AS lvl,
      ch, p_type,
      CAST(SUM(rev) AS DECIMAL(38,2)) AS rev,
      CAST(SUM(qty) AS DECIMAL(38,2)) AS qty,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
      SELECT CASE l.l_orderkey % 3 WHEN 0 THEN 'store'
                  WHEN 1 THEN 'catalog' ELSE 'web' END AS ch,
             p.p_type,
             CAST(l.l_extendedprice AS DECIMAL(12,2)) AS rev,
             CAST(l.l_quantity AS DECIMAL(12,2)) AS qty
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_partkey IN (SELECT l_partkey FROM shared)) s
    GROUP BY ROLLUP(ch, p_type)
    ORDER BY lvl, COALESCE(ch, ''), COALESCE(p_type, '')
    """,
)
def tpcds_q14_style_shared_items_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q14 shape: the INTERSECT chain finds items sold in every
    channel; the outer query rolls sales of only those items up over
    (channel, item-type) with subtotals. Scale: each INTERSECT arm is
    a distinct-agg on partkey (map-side partial dedup), the chain is
    two semi-join-shaped intersects on the same partkey key, and the
    shared set feeds a LEFT SEMI join that prunes the fact scan before
    the single rollup shuffle. Subtotal rows order via COALESCEd keys
    + a grouping-level column so both engines sort identically.
    Reference: testdata/workloads/tpcds/queries/tpcds-q14a.test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def arm(m: int):
        return li.where(F.col("l_orderkey") % 3 == m).select("l_partkey").distinct()

    shared = arm(0).intersect(arm(1)).intersect(arm(2))
    base = (
        li.join(shared, "l_partkey", "left_semi")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.when(F.col("l_orderkey") % 3 == 0, "store")
            .when(F.col("l_orderkey") % 3 == 1, "catalog")
            .otherwise("web")
            .alias("ch"),
            "p_type",
            _d("l_extendedprice").alias("rev"),
            _d("l_quantity").alias("qty"),
        )
    )
    agg = base.rollup("ch", "p_type").agg(
        F.sum("rev").cast("decimal(38,2)").alias("rev"),
        F.sum("qty").cast("decimal(38,2)").alias("qty"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        (F.grouping("ch") * 2 + F.grouping("p_type")).cast("int").alias("lvl"),
    )
    return agg.select("lvl", "ch", "p_type", "rev", "qty", "n_lines").orderBy(
        "lvl", F.coalesce("ch", F.lit("")), F.coalesce("p_type", F.lit(""))
    )


# ---------------------------------------------------------------------------
# q31 shape: per-nation quarter-over-quarter two-channel ratio chain
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q31_style_qoq_ratio_chain",
    """
    WITH t AS (
      SELECT n_name, CAST(quarter(o_orderdate) AS INT) AS q,
        o_orderkey % 2 AS ch,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS rev
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE year(o_orderdate) = 1998 AND quarter(o_orderdate) <= 3
      GROUP BY n_name, quarter(o_orderdate), o_orderkey % 2)
    SELECT w1.n_name AS n_name,
      CAST(w2.rev AS DOUBLE) / CAST(w1.rev AS DOUBLE) AS web_q1_q2,
      CAST(w3.rev AS DOUBLE) / CAST(w2.rev AS DOUBLE) AS web_q2_q3,
      CAST(s2.rev AS DOUBLE) / CAST(s1.rev AS DOUBLE) AS store_q1_q2,
      CAST(s3.rev AS DOUBLE) / CAST(s2.rev AS DOUBLE) AS store_q2_q3
    FROM t w1
    JOIN t w2 ON w1.n_name = w2.n_name
    JOIN t w3 ON w1.n_name = w3.n_name
    JOIN t s1 ON w1.n_name = s1.n_name
    JOIN t s2 ON w1.n_name = s2.n_name
    JOIN t s3 ON w1.n_name = s3.n_name
    WHERE w1.ch = 0 AND w1.q = 1 AND w2.ch = 0 AND w2.q = 2
      AND w3.ch = 0 AND w3.q = 3
      AND s1.ch = 1 AND s1.q = 1 AND s2.ch = 1 AND s2.q = 2
      AND s3.ch = 1 AND s3.q = 3
      AND w1.rev > 0 AND w2.rev > 0 AND s1.rev > 0 AND s2.rev > 0
      AND w2.rev * s1.rev > s2.rev * w1.rev
      AND w3.rev * s2.rev > s3.rev * w2.rev
    ORDER BY n_name
    """,
)
def tpcds_q31_style_qoq_ratio_chain(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q31 shape: nations where the web channel's quarter-over-quarter
    growth beats the store channel's in BOTH consecutive quarter
    transitions of 1998. One (nation, quarter, channel) aggregate
    self-joined six ways on nation; both QoQ comparisons cross-
    multiply in decimal, the four reported ratios are each ONE double
    division of exact decimals. Scale: fact⋈dim joins broadcast the
    small dims, the agg shuffles once on its composite key, the six
    legs reuse the n_name hash; leg inputs are one (ch, q) cell each
    (~|nation| rows), so the chain is broadcast-sized at any SF.
    Reference: testdata/workloads/tpcds/queries/tpcds-q31.test."""
    # r11 (guide §2.3/§2.4, same collapse as q4-style): the six join
    # legs each select one (channel, quarter) cell of the same
    # aggregate — ONE per-nation aggregate with six conditional sums
    # replaces five joins; the inner-join all-cells-present
    # requirement becomes six NOT-NULL predicates.
    import functools

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def cell(chv: int, qv: int):
        return F.sum(
            F.when(
                (F.col("o_orderkey") % 2 == chv)
                & (F.quarter("o_orderdate") == qv),
                _d("o_totalprice"),
            )
        ).cast("decimal(18,2)")

    t = (
        orders.where(
            (F.year("o_orderdate") == 1998) & (F.quarter("o_orderdate") <= 3)
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            cell(0, 1).alias("w1"), cell(0, 2).alias("w2"),
            cell(0, 3).alias("w3"),
            cell(1, 1).alias("s1"), cell(1, 2).alias("s2"),
            cell(1, 3).alias("s3"),
        )
    )
    cells = ["w1", "w2", "w3", "s1", "s2", "s3"]
    all_cells = functools.reduce(
        lambda a, b: a & b, [F.col(c).isNotNull() for c in cells]
    )
    out = t.where(all_cells).where(
        (F.col("w1") > 0) & (F.col("w2") > 0) & (F.col("s1") > 0)
        & (F.col("s2") > 0)
        & (F.col("w2") * F.col("s1") > F.col("s2") * F.col("w1"))
        & (F.col("w3") * F.col("s2") > F.col("s3") * F.col("w2"))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "n_name",
        (dbl("w2") / dbl("w1")).alias("web_q1_q2"),
        (dbl("w3") / dbl("w2")).alias("web_q2_q3"),
        (dbl("s2") / dbl("s1")).alias("store_q1_q2"),
        (dbl("s3") / dbl("s2")).alias("store_q2_q3"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# q64 shape: wide snowflake join, two year legs compared
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q64_style_snowflake_year_compare",
    """
    WITH sales AS (
      SELECT p.p_brand, n.n_name, year(o.o_orderdate) AS y,
        CAST(COUNT(*) AS BIGINT) AS cnt,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE year(o.o_orderdate) IN (1996, 1997) AND s.s_acctbal > 0
      GROUP BY p.p_brand, n.n_name, year(o.o_orderdate))
    SELECT y1.p_brand AS p_brand, y1.n_name AS n_name,
      y1.cnt AS cnt_y1, y2.cnt AS cnt_y2,
      y1.rev AS rev_y1, y2.rev AS rev_y2
    FROM sales y1
    JOIN sales y2 ON y1.p_brand = y2.p_brand AND y1.n_name = y2.n_name
    WHERE y1.y = 1996 AND y2.y = 1997 AND y2.cnt <= y1.cnt
    ORDER BY p_brand, n_name
    """,
)
def tpcds_q64_style_snowflake_year_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q64 shape: a wide snowflake (fact + orders + customer + nation
    + part + supplier) aggregated per (brand, nation, year), with the
    two year legs self-joined and filtered where activity declined
    (cnt_y2 <= cnt_y1 — q64's cnt <= cnt join predicate). Scale: ONE
    orderkey shuffle joins fact to orders; every other dim broadcasts
    (customer/nation/part/supplier are all dimension-sized); the agg
    shuffles once on its composite key and both year legs reuse that
    partitioning for the final join.
    Reference: testdata/workloads/tpcds/queries/tpcds-q64.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    sales = (
        li.join(
            orders.where(F.year("o_orderdate").isin(1996, 1997)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(supp.where(F.col("s_acctbal") > 0)),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        # r11 note: a q4-style conditional-aggregate collapse of the
        # two year legs was measured and REJECTED here (median
        # 2.48 -> 3.88 s at sf0.1): with this composite grouping key
        # the per-row conditional branches cost more than the one
        # (brand, nation)-sized join they save.
        .groupBy("p_brand", "n_name", F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("rev"),
        )
    )
    y1 = sales.where(F.col("y") == 1996).select(
        F.col("p_brand").alias("b1"), F.col("n_name").alias("n1"),
        F.col("cnt").alias("cnt_y1"), F.col("rev").alias("rev_y1"),
    )
    y2 = sales.where(F.col("y") == 1997).select(
        F.col("p_brand").alias("b2"), F.col("n_name").alias("n2"),
        F.col("cnt").alias("cnt_y2"), F.col("rev").alias("rev_y2"),
    )
    return (
        y1.join(
            y2,
            (F.col("b1") == F.col("b2")) & (F.col("n1") == F.col("n2")),
        )
        .where(F.col("cnt_y2") <= F.col("cnt_y1"))
        .select(
            F.col("b1").alias("p_brand"), F.col("n1").alias("n_name"),
            "cnt_y1", "cnt_y2", "rev_y1", "rev_y2",
        )
        .orderBy("p_brand", "n_name")
    )


# ---------------------------------------------------------------------------
# q72 shape: hash join with residual date-offset conjunct
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q72_style_late_ship_residual_probe",
    """
    SELECT date_trunc('week', l_shipdate) AS wk,
      CAST(COUNT(*) AS BIGINT) AS late_lines,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS late_qty,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        AS BIGINT) AS urgent_late
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 5 DAY
    GROUP BY date_trunc('week', l_shipdate)
    ORDER BY wk
    """,
)
def tpcds_q72_style_late_ship_residual_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q72 shape: the reference's inventory probe joins on an equi key
    PLUS a date-offset residual (d1.d_date + 5 <= d2.d_date) — a hash
    join carrying `other_join_conjuncts` (PlanNodes.thrift:380-390).
    Here: lines shipped more than 5 days after their order date,
    reported weekly. Spark plans the equi part as the hash key and
    evaluates the offset as a residual filter on matches — never a
    nested-loop. Scale: one orderkey shuffle, then one week-key agg
    shuffle; the week truncation keeps timestamp type on both engines
    so the group key is bit-identical.
    Reference: testdata/workloads/tpcds/queries/tpcds-q72.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(
        orders,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 5 DAY")),
    )
    return (
        joined.groupBy(F.date_trunc("week", "l_shipdate").alias("wk"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("late_lines"),
            F.sum(_d("l_quantity")).cast("decimal(38,2)").alias("late_qty"),
            F.sum(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).cast("bigint").alias("urgent_late"),
        )
        .orderBy("wk")
    )


# ---------------------------------------------------------------------------
# q77 shape: per-channel P&L (sales FULL OUTER returns) + rollup
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q77_style_channel_pnl_rollup",
    """
    WITH sales AS (
      SELECT l_orderkey % 3 AS chk, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS sales
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag <> 'R'
      GROUP BY l_orderkey % 3, n_name),
    rets AS (
      SELECT l_orderkey % 3 AS chk, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS returns
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY l_orderkey % 3, n_name),
    j AS (
      SELECT CASE COALESCE(s.chk, r.chk) WHEN 0 THEN 'store'
                  WHEN 1 THEN 'catalog' ELSE 'web' END AS ch,
             COALESCE(s.n_name, r.n_name) AS n_name,
             COALESCE(s.sales, 0) AS sales, COALESCE(r.returns, 0) AS returns
      FROM sales s FULL OUTER JOIN rets r
        ON s.chk = r.chk AND s.n_name = r.n_name)
    SELECT CAST(GROUPING(ch) * 2 + GROUPING(n_name) AS INT) AS lvl,
      ch, n_name,
      CAST(SUM(sales) AS DECIMAL(38,2)) AS sales,
      CAST(SUM(returns) AS DECIMAL(38,2)) AS returns,
      CAST(SUM(sales) - SUM(returns) AS DECIMAL(38,2)) AS net
    FROM j
    GROUP BY ROLLUP(ch, n_name)
    ORDER BY lvl, COALESCE(ch, ''), COALESCE(n_name, '')
    """,
)
def tpcds_q77_style_channel_pnl_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q77 shape: sales and returns aggregated independently per
    (channel, nation), FULL OUTER joined on the composite key, then a
    ROLLUP produces per-channel subtotals and a grand total of net
    profit. Scale: both aggregates shuffle once on the same composite
    key so the FULL OUTER JOIN reuses the partitioning; the rollup
    input is dimension-sized (channels x nations). Subtotal ordering
    is COALESCE-totalized as in the q67 entry.
    Reference: testdata/workloads/tpcds/queries/tpcds-q77a.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )

    def side(pred, out: str):
        return (
            base.where(pred)
            .groupBy((F.col("l_orderkey") % 3).alias("chk"), "n_name")
            .agg(
                F.sum(_d("l_extendedprice")).cast("decimal(18,2)").alias(out)
            )
        )

    s = side(F.col("l_returnflag") != "R", "sales").withColumnsRenamed(
        {"chk": "s_chk", "n_name": "s_n"}
    )
    r = side(F.col("l_returnflag") == "R", "returns").withColumnsRenamed(
        {"chk": "r_chk", "n_name": "r_n"}
    )
    j = s.join(
        r,
        (F.col("s_chk") == F.col("r_chk")) & (F.col("s_n") == F.col("r_n")),
        "full_outer",
    ).select(
        F.when(F.coalesce("s_chk", "r_chk") == 0, "store")
        .when(F.coalesce("s_chk", "r_chk") == 1, "catalog")
        .otherwise("web")
        .alias("ch"),
        F.coalesce("s_n", "r_n").alias("n_name"),
        F.coalesce("sales", F.lit(0).cast("decimal(18,2)")).alias("sales"),
        F.coalesce("returns", F.lit(0).cast("decimal(18,2)")).alias("returns"),
    )
    agg = j.rollup("ch", "n_name").agg(
        F.sum("sales").cast("decimal(38,2)").alias("sales"),
        F.sum("returns").cast("decimal(38,2)").alias("returns"),
        (F.sum("sales") - F.sum("returns")).cast("decimal(38,2)").alias("net"),
        (F.grouping("ch") * 2 + F.grouping("n_name")).cast("int").alias("lvl"),
    )
    return agg.select("lvl", "ch", "n_name", "sales", "returns", "net").orderBy(
        "lvl", F.coalesce("ch", F.lit("")), F.coalesce("n_name", F.lit(""))
    )


# ---------------------------------------------------------------------------
# q80 shape: item-level net-of-returns via LEFT JOIN to pre-agg returns
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q80_style_item_net_returns",
    """
    WITH rets AS (
      SELECT l_orderkey AS r_ok, l_partkey AS r_pk,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS ret_amt
      FROM lineitem
      WHERE l_returnflag = 'R' AND l_linestatus = 'F'
      GROUP BY l_orderkey, l_partkey)
    SELECT CASE s.l_orderkey % 3 WHEN 0 THEN 'store'
                WHEN 1 THEN 'catalog' ELSE 'web' END AS ch,
      p.p_brand,
      CAST(SUM(CAST(s.l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS sales,
      CAST(SUM(COALESCE(r.ret_amt, 0)) AS DECIMAL(38,2)) AS returns,
      CAST(SUM(CAST(s.l_extendedprice AS DECIMAL(12,2))
               - COALESCE(r.ret_amt, 0)) AS DECIMAL(38,2)) AS net
    FROM lineitem s
    LEFT JOIN rets r ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
    JOIN part p ON s.l_partkey = p.p_partkey
    WHERE s.l_linestatus = 'O'
    GROUP BY CASE s.l_orderkey % 3 WHEN 0 THEN 'store'
                  WHEN 1 THEN 'catalog' ELSE 'web' END, p.p_brand
    ORDER BY ch, p_brand
    """,
)
def tpcds_q80_style_item_net_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q80 shape: open sales LEFT JOINed to a PRE-AGGREGATED returns
    side on the (order, item) line identity — aggregating returns
    before the join keeps the outer join 1:≤1 (deterministic, no
    fan-out) exactly like the reference's catalog_sales LEFT OUTER
    catalog_returns pattern — then channel/brand P&L on top. Scale:
    returns pre-agg and the outer join share the orderkey-grained
    shuffle; part broadcasts; the final agg is channel x brand sized.
    Reference: testdata/workloads/tpcds/queries/tpcds-q80a.test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rets = (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F"))
        .groupBy(
            F.col("l_orderkey").alias("r_ok"), F.col("l_partkey").alias("r_pk")
        )
        .agg(F.sum(_d("l_extendedprice")).cast("decimal(18,2)").alias("ret_amt"))
    )
    sales = li.where(F.col("l_linestatus") == "O")
    joined = (
        sales.join(
            rets,
            (F.col("l_orderkey") == F.col("r_ok"))
            & (F.col("l_partkey") == F.col("r_pk")),
            "left",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    zero = F.lit(0).cast("decimal(18,2)")
    ch = (
        F.when(F.col("l_orderkey") % 3 == 0, "store")
        .when(F.col("l_orderkey") % 3 == 1, "catalog")
        .otherwise("web")
    )
    return (
        joined.groupBy(ch.alias("ch"), "p_brand")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("sales"),
            F.sum(F.coalesce("ret_amt", zero)).cast("decimal(38,2)")
            .alias("returns"),
            F.sum(_d("l_extendedprice") - F.coalesce("ret_amt", zero))
            .cast("decimal(38,2)")
            .alias("net"),
        )
        .orderBy("ch", "p_brand")
    )


# ---------------------------------------------------------------------------
# q9 shape: single-row CASE report over bucket conditional aggregates
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q9_style_case_bucket_scalars",
    """
    WITH b AS (
      SELECT
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 ELSE 0 END)
          AS BIGINT) AS cnt1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS ep1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10
          THEN CAST(l_discount AS DECIMAL(12,4)) ELSE 0 END)
          AS DECIMAL(38,4)) AS di1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 ELSE 0 END)
          AS BIGINT) AS cnt2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS ep2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20
          THEN CAST(l_discount AS DECIMAL(12,4)) ELSE 0 END)
          AS DECIMAL(38,4)) AS di2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 ELSE 0 END)
          AS BIGINT) AS cnt3,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS ep3,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30
          THEN CAST(l_discount AS DECIMAL(12,4)) ELSE 0 END)
          AS DECIMAL(38,4)) AS di3,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 ELSE 0 END)
          AS BIGINT) AS cnt4,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS ep4,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40
          THEN CAST(l_discount AS DECIMAL(12,4)) ELSE 0 END)
          AS DECIMAL(38,4)) AS di4,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 ELSE 0 END)
          AS BIGINT) AS cnt5,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS ep5,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50
          THEN CAST(l_discount AS DECIMAL(12,4)) ELSE 0 END)
          AS DECIMAL(38,4)) AS di5
      FROM lineitem)
    SELECT
      CASE WHEN cnt1 > 2000 THEN CAST(ep1 AS DOUBLE) / cnt1
           ELSE CAST(di1 AS DOUBLE) / cnt1 END AS bucket1,
      CASE WHEN cnt2 > 2000 THEN CAST(ep2 AS DOUBLE) / cnt2
           ELSE CAST(di2 AS DOUBLE) / cnt2 END AS bucket2,
      CASE WHEN cnt3 > 2000 THEN CAST(ep3 AS DOUBLE) / cnt3
           ELSE CAST(di3 AS DOUBLE) / cnt3 END AS bucket3,
      CASE WHEN cnt4 > 2000 THEN CAST(ep4 AS DOUBLE) / cnt4
           ELSE CAST(di4 AS DOUBLE) / cnt4 END AS bucket4,
      CASE WHEN cnt5 > 2000 THEN CAST(ep5 AS DOUBLE) / cnt5
           ELSE CAST(di5 AS DOUBLE) / cnt5 END AS bucket5
    FROM b
    """,
)
def tpcds_q9_style_case_bucket_scalars(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q9 shape: the reference runs 15 scalar subqueries over the same
    fact, picked between by CASE on bucket counts. Here all buckets
    collapse into ONE conditional-aggregate pass (the plan the
    reference's subquery battery *should* produce), then a single-row
    CASE projection; each reported value is ONE double division of an
    exact decimal sum by an exact count. Scale: one scan, one 1-row
    agg, no joins, no shuffle beyond the final reduce.
    Reference: testdata/workloads/tpcds/queries/tpcds-q9.test."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for i, (lo, hi) in enumerate(
        [(1, 10), (11, 20), (21, 30), (31, 40), (41, 50)], start=1
    ):
        inb = F.col("l_quantity").between(lo, hi)
        aggs.append(
            F.sum(F.when(inb, 1).otherwise(0)).cast("bigint").alias(f"cnt{i}")
        )
        aggs.append(
            F.sum(F.when(inb, _d("l_extendedprice")).otherwise(0))
            .cast("decimal(38,2)")
            .alias(f"ep{i}")
        )
        aggs.append(
            F.sum(
                F.when(inb, F.col("l_discount").cast("decimal(12,4)")).otherwise(0)
            )
            .cast("decimal(38,4)")
            .alias(f"di{i}")
        )
    b = li.agg(*aggs)
    out = []
    for i in range(1, 6):
        out.append(
            F.when(
                F.col(f"cnt{i}") > 2000,
                F.col(f"ep{i}").cast("double") / F.col(f"cnt{i}"),
            )
            .otherwise(F.col(f"di{i}").cast("double") / F.col(f"cnt{i}"))
            .alias(f"bucket{i}")
        )
    return b.select(*out)


# ---------------------------------------------------------------------------
# q16/q94 shape: multi-supplier orders with no returned lines
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q16_style_multi_supplier_no_returns",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS order_count,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS total_price
    FROM orders o
    WHERE year(o_orderdate) = 1997
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        GROUP BY l.l_orderkey
        HAVING COUNT(DISTINCT l.l_suppkey) >= 2)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem r
        WHERE r.l_orderkey = o.o_orderkey AND r.l_returnflag = 'R')
    """,
)
def tpcds_q16_style_multi_supplier_no_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q16 shape (q94 is the web-channel twin): orders fulfilled from
    at least two suppliers (EXISTS over a grouped HAVING) with no
    returned line (NOT EXISTS), reduced to a single-row count + sum.
    Spark plan: distinct-supplier agg on orderkey -> LEFT SEMI join,
    returned-keys LEFT ANTI join — both reuse the orderkey hash; the
    final agg is a 1-row reduce. No correlated re-execution: the
    reference's subplan becomes two hash joins.
    Reference: testdata/workloads/tpcds/queries/tpcds-q16.test,
    tpcds-q94.test."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .where(F.col("ns") >= 2)
        .select(F.col("l_orderkey").alias("m_ok"))
    )
    returned = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("r_ok"))
        .distinct()
    )
    qual = (
        orders.where(F.year("o_orderdate") == 1997)
        .join(multi, F.col("o_orderkey") == F.col("m_ok"), "left_semi")
        .join(returned, F.col("o_orderkey") == F.col("r_ok"), "left_anti")
    )
    return qual.agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count"),
        F.sum(_d("o_totalprice")).cast("decimal(38,2)").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# q21 shape: per-supplier before/after pivot-date quantity ratio band
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q21_style_pivot_ratio_bands",
    """
    WITH t AS (
      SELECT s_name,
        CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
          THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS qty_before,
        CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01'
          THEN CAST(l_quantity AS DECIMAL(12,2)) ELSE 0 END)
          AS DECIMAL(38,2)) AS qty_after
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE year(l_shipdate) = 1998
      GROUP BY s_name)
    SELECT s_name, qty_before, qty_after
    FROM t
    WHERE qty_before > 0 AND qty_after > 0
      AND 3 * qty_after >= 2 * qty_before
      AND 2 * qty_after <= 3 * qty_before
    ORDER BY s_name
    """,
)
def tpcds_q21_style_pivot_ratio_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q21 shape: inventory-style before/after split around a pivot
    date, keeping suppliers whose after/before ratio lies in
    [2/3, 3/2]. Both band bounds cross-multiply in decimal — no
    division. Scale: single fact pass with conditional aggregates
    (the reference plans two scans + a join; conditional sums do it
    in one), supplier broadcasts, one s_name-keyed shuffle.
    Reference: testdata/workloads/tpcds/queries/tpcds-q21.test."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    pivot = F.lit("1998-07-01").cast("timestamp")
    t = (
        li.where(F.year("l_shipdate") == 1998)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < pivot, _d("l_quantity")).otherwise(0)
            ).cast("decimal(38,2)").alias("qty_before"),
            F.sum(
                F.when(F.col("l_shipdate") >= pivot, _d("l_quantity")).otherwise(0)
            ).cast("decimal(38,2)").alias("qty_after"),
        )
    )
    return (
        t.where(
            (F.col("qty_before") > 0) & (F.col("qty_after") > 0)
            & (3 * F.col("qty_after") >= 2 * F.col("qty_before"))
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
        )
        .select("s_name", "qty_before", "qty_after")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q32/q92 shape: excess-discount revenue vs 1.3x per-item average
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q32_style_excess_discount",
    """
    WITH avg_d AS (
      SELECT l_partkey AS a_pk,
        CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS sd,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey)
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS excess_revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN avg_d ON l_partkey = a_pk
    WHERE CAST(l_discount AS DECIMAL(12,4)) * 10 * cnt > 13 * sd
    """,
)
def tpcds_q32_style_excess_discount(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q32 shape (q92 is the web twin): revenue of lines discounted
    more than 1.3x their item's average discount. The correlated
    scalar subquery decorrelates to a per-item aggregate joined back
    to the fact; the 1.3x-average comparison cross-multiplies
    (d * 10 * cnt > 13 * sum_d) so the average is never divided and
    the predicate is exact decimal on both engines. Scale: the agg
    and the join share the partkey shuffle; final agg is a 1-row
    reduce. Reference: testdata/workloads/tpcds/queries/
    tpcds-q32.test, tpcds-q92.test."""
    li = load_table(spark, sf_dir, "lineitem")
    dd = F.col("l_discount").cast("decimal(12,4)")
    avg_d = li.groupBy(F.col("l_partkey").alias("a_pk")).agg(
        F.sum(dd).cast("decimal(38,4)").alias("sd"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    joined = li.join(avg_d, F.col("l_partkey") == F.col("a_pk"))
    return joined.where(dd * 10 * F.col("cnt") > 13 * F.col("sd")).agg(
        F.sum(_d("l_extendedprice")).cast("decimal(38,2)")
        .alias("excess_revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q35/q69 shape: customers active in one channel AND (either of two)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q35_style_multi_channel_exists",
    """
    SELECT n_name,
      CAST(COUNT(*) AS BIGINT) AS cnt,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderkey % 3 = 0)
      AND EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderkey % 3 IN (1, 2))
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q35_style_multi_channel_exists(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q35 shape (q69 is the NOT-EXISTS twin): customers with store
    activity AND web-or-catalog activity (EXISTS and an OR of EXISTS,
    planned as two LEFT SEMI joins), demographic rollup per nation.
    Scale: both semi joins hash on custkey against pre-filtered order
    sets; nation broadcasts; the group-by key space is |nation|.
    Reference: testdata/workloads/tpcds/queries/tpcds-q35.test,
    tpcds-q69.test."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    store = orders.where(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_custkey").alias("st_ck")
    )
    wb_ct = orders.where((F.col("o_orderkey") % 3).isin(1, 2)).select(
        F.col("o_custkey").alias("wc_ck")
    )
    qual = (
        cust.join(store, F.col("c_custkey") == F.col("st_ck"), "left_semi")
        .join(wb_ct, F.col("c_custkey") == F.col("wc_ck"), "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        qual.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(_d("c_acctbal")).cast("decimal(38,2)").alias("sum_bal"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q37/q82 shape: price-band items with activity in a date window
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q37_style_price_band_active_items",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice BETWEEN 900 AND 1100
      AND p_size IN (10, 20, 30, 40, 50)
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1998-07-01')
    ORDER BY p_partkey
    LIMIT 100
    """,
)
def tpcds_q37_style_price_band_active_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q37 shape (q82 is the store twin): items in a retail-price band
    and size list that had activity in a six-month window — a dim
    filter plus a LEFT SEMI probe into the fact, top-100 by key.
    Scale: the part filter prunes before the semi join; the fact side
    prunes on the ship-date window at the scan (pushed predicate);
    the semi join hashes on partkey. p_retailprice passes through
    untouched (no arithmetic), so DOUBLE is bit-stable.
    Reference: testdata/workloads/tpcds/queries/tpcds-q37.test,
    tpcds-q82.test."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    window_lines = li.where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    ).select("l_partkey")
    return (
        part.where(
            F.col("p_retailprice").between(900, 1100)
            & F.col("p_size").isin(10, 20, 30, 40, 50)
        )
        .join(window_lines, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q40 shape: before/after pivot net sales with return adjustment
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q40_style_pivot_net_returns",
    """
    SELECT n_name,
      CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
        THEN CASE WHEN l_returnflag = 'R' THEN 0
                  ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END
        ELSE 0 END) AS DECIMAL(38,2)) AS net_before,
      CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01'
        THEN CASE WHEN l_returnflag = 'R' THEN 0
                  ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END
        ELSE 0 END) AS DECIMAL(38,2)) AS net_after
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE year(l_shipdate) = 1998
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q40_style_pivot_net_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q40 shape: net-of-returns sales split before/after a pivot date
    per supplier nation (the reference LEFT JOINs catalog_returns and
    zeroes returned amounts — here the return flag zeroes in place,
    same algebra). Scale: one fact pass, both dims broadcast, one
    |nation|-key shuffle; nested CASEs stay in codegen.
    Reference: testdata/workloads/tpcds/queries/tpcds-q40.test."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    pivot = F.lit("1998-07-01").cast("timestamp")
    net = F.when(F.col("l_returnflag") == "R", F.lit(0)).otherwise(
        _d("l_extendedprice")
    )
    return (
        li.where(F.year("l_shipdate") == 1998)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("l_shipdate") < pivot, net).otherwise(0))
            .cast("decimal(38,2)").alias("net_before"),
            F.sum(F.when(F.col("l_shipdate") >= pivot, net).otherwise(0))
            .cast("decimal(38,2)").alias("net_after"),
        )
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q76 shape: UNION ALL of channels counting null-keyed rows
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q76_style_null_key_channels",
    """
    SELECT ch, y,
      CAST(COUNT(*) AS BIGINT) AS n_null_key,
      CAST(SUM(price) AS DECIMAL(38,2)) AS revenue
    FROM (
      SELECT 'store' AS ch, year(o_orderdate) AS y,
        CAST(o_totalprice AS DECIMAL(12,2)) AS price
      FROM orders
      WHERE NULLIF(o_orderpriority, '4-NOT SPECIFIED') IS NULL
      UNION ALL
      SELECT 'web' AS ch, year(l_shipdate) AS y,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem
      WHERE NULLIF(l_returnflag, 'N') IS NULL
      UNION ALL
      SELECT 'catalog' AS ch, year(l_shipdate) AS y,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS price
      FROM lineitem
      WHERE NULLIF(l_linestatus, 'O') IS NULL) u
    GROUP BY ch, y
    ORDER BY ch, y
    """,
)
def tpcds_q76_style_null_key_channels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q76 shape: three channel branches each selecting rows whose
    dimension key is NULL (here NULLIF manufactures the reference's
    null-key semantics over never-null synthetic columns), UNION ALLed
    and counted per (channel, year). Scale: three scans with pushed
    filters union cheaply (no shuffle until the final small agg);
    each branch's filter is sargable post-NULLIF simplification.
    Reference: testdata/workloads/tpcds/queries/tpcds-q76.test."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    store = orders.where(
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).isNull()
    ).select(
        F.lit("store").alias("ch"),
        F.year("o_orderdate").alias("y"),
        _d("o_totalprice").alias("price"),
    )
    web = li.where(F.nullif(F.col("l_returnflag"), F.lit("N")).isNull()).select(
        F.lit("web").alias("ch"),
        F.year("l_shipdate").alias("y"),
        _d("l_extendedprice").alias("price"),
    )
    catalog = li.where(
        F.nullif(F.col("l_linestatus"), F.lit("O")).isNull()
    ).select(
        F.lit("catalog").alias("ch"),
        F.year("l_shipdate").alias("y"),
        _d("l_extendedprice").alias("price"),
    )
    return (
        store.unionAll(web).unionAll(catalog)
        .groupBy("ch", "y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_null_key"),
            F.sum("price").cast("decimal(38,2)").alias("revenue"),
        )
        .orderBy("ch", "y")
    )


# ---------------------------------------------------------------------------
# q22 shape: product-hierarchy ROLLUP of average quantity
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q22_style_rollup_avg_qty",
    """
    SELECT CAST(GROUPING(p_type) * 4 + GROUPING(p_brand) * 2
                + GROUPING(p_size) AS INT) AS lvl,
      p_type, p_brand, CAST(p_size AS INT) AS p_size,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS sum_qty,
      CAST(COUNT(*) AS BIGINT) AS cnt,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_qty
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    GROUP BY ROLLUP(p_type, p_brand, p_size)
    ORDER BY lvl, COALESCE(p_type, ''), COALESCE(p_brand, ''),
      COALESCE(p_size, -1)
    """,
)
def tpcds_q22_style_rollup_avg_qty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q22 shape: average on-hand quantity rolled up the full product
    hierarchy (type -> brand -> size) with subtotals at every level.
    The average is ONE double division of an exact decimal sum by an
    exact count, computed after the rollup so every engine divides
    identical inputs. Scale: part broadcasts; Spark expands grouping
    sets after the partial agg so the fact shuffles once.
    Reference: testdata/workloads/tpcds/queries/tpcds-q22.test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    agg = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand", "p_size")
        .agg(
            F.sum(_d("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            (F.grouping("p_type") * 4 + F.grouping("p_brand") * 2
             + F.grouping("p_size")).cast("int").alias("lvl"),
        )
    )
    return agg.select(
        "lvl", "p_type", "p_brand",
        F.col("p_size").cast("int").alias("p_size"),
        "sum_qty", "cnt",
        (F.col("sum_qty").cast("double") / F.col("cnt")).alias("avg_qty"),
    ).orderBy(
        "lvl", F.coalesce("p_type", F.lit("")),
        F.coalesce("p_brand", F.lit("")), F.coalesce("p_size", F.lit(-1)),
    )


# ---------------------------------------------------------------------------
# q6 shape: items priced above 1.2x their type average, per nation
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q6_style_above_avg_price_items",
    """
    WITH t AS (
      SELECT p_type AS t_type,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS sum_price,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_type),
    pricey AS (
      SELECT p_partkey FROM part JOIN t ON p_type = t_type
      WHERE CAST(p_retailprice AS DECIMAL(12,2)) * 10 * cnt
            >= 12 * sum_price)
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_partkey IN (SELECT p_partkey FROM pricey)
      AND year(l_shipdate) = 1998 AND month(l_shipdate) = 1
    GROUP BY n_name
    HAVING COUNT(*) >= 10
    ORDER BY cnt DESC, n_name
    """,
)
def tpcds_q6_style_above_avg_price_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q6 shape: customers (by nation) buying items priced at least
    1.2x the average for their item type in one month. The correlated
    type-average decorrelates to a per-type aggregate joined back to
    part; the 1.2x compare cross-multiplies (price*10*cnt >= 12*sum)
    so no division enters the predicate. Scale: the pricey-item set
    is dimension-sized and semi-joins the fact scan (month-pruned);
    dims broadcast; one |nation| agg shuffle.
    Reference: testdata/workloads/tpcds/queries/tpcds-q6.test."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    t = part.groupBy(F.col("p_type").alias("t_type")).agg(
        F.sum(_d("p_retailprice")).cast("decimal(38,2)").alias("sum_price"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    pricey = (
        part.join(F.broadcast(t), F.col("p_type") == F.col("t_type"))
        .where(_d("p_retailprice") * 10 * F.col("cnt") >= 12 * F.col("sum_price"))
        .select("p_partkey")
    )
    return (
        li.where((F.year("l_shipdate") == 1998) & (F.month("l_shipdate") == 1))
        .join(F.broadcast(pricey), F.col("l_partkey") == F.col("p_partkey"),
              "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .where(F.col("cnt") >= 10)
        .orderBy(F.desc("cnt"), "n_name")
    )


# ---------------------------------------------------------------------------
# q7/q26 shape: dimension-filtered average battery per item
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q7_style_dim_filtered_avgs",
    """
    SELECT p_brand,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
        AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE o_orderpriority = '3-MEDIUM' AND year(o_orderdate) = 1997
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def tpcds_q7_style_dim_filtered_avgs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q7 shape (q26 is the catalog twin): the four-AVG battery per
    item under demographic/promo dimension filters. Each average is
    ONE double division of an exact decimal sum by the group count —
    both engines divide identical inputs, so doubles hash-match.
    Scale: one orderkey shuffle (priority+year filters push to the
    orders scan), part broadcasts, one |brand| agg shuffle.
    Reference: testdata/workloads/tpcds/queries/tpcds-q7.test,
    tpcds-q26.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    base = (
        li.join(
            orders.where(
                (F.col("o_orderpriority") == "3-MEDIUM")
                & (F.year("o_orderdate") == 1997)
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    cnt = F.count(F.lit(1))
    return (
        base.groupBy("p_brand")
        .agg(
            (F.sum(_d("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / cnt)
            .alias("avg_price"),
            (F.sum(F.col("l_discount").cast("decimal(12,4)")).cast("double")
             / cnt).alias("avg_disc"),
            cnt.cast("bigint").alias("cnt"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q15 shape: disjunctive customer/order qualification per nation
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q15_style_disjunctive_qualification",
    """
    SELECT n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1998 AND quarter(o_orderdate) = 1
      AND (c_acctbal > 9000
           OR c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
           OR o_totalprice > 300000)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q15_style_disjunctive_qualification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q15 shape: the OR-of-qualifications filter (zip list OR state
    list OR sale amount) that cannot fully push to either side of the
    join — it must evaluate post-join while the conjunctive
    quarter/year part still prunes the orders scan. Scale: customer
    broadcasts; one |nation| agg shuffle; the sargable date conjuncts
    reach the scan (plan-guarded).
    Reference: testdata/workloads/tpcds/queries/tpcds-q15.test."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.where(
            (F.year("o_orderdate") == 1998) & (F.quarter("o_orderdate") == 1)
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("c_acctbal") > 9000)
            | F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            | (F.col("o_totalprice") > 300000)
        )
        .groupBy("n_name")
        .agg(F.sum(_d("o_totalprice")).cast("decimal(38,2)").alias("revenue"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q42/q52/q55 (and q3) shape: year x brand revenue top-N
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q42_style_year_brand_topn",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS y, p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_type LIKE 'STANDARD%'
    GROUP BY year(o_orderdate), p_brand
    ORDER BY revenue DESC, y, p_brand
    LIMIT 10
    """,
)
def tpcds_q42_style_year_brand_topn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q42 shape (q52/q55/q3 are the same plan with different dim
    filters): filtered dim join -> (year, brand) aggregate -> revenue
    top-N. Spark plans TakeOrderedAndProject (the reference's TopNNode)
    over the agg — no global sort. The LIMIT carries a total (y,
    brand) tie-break so equal revenues order identically.
    Reference: testdata/workloads/tpcds/queries/tpcds-q42.test,
    tpcds-q52.test, tpcds-q55.test, tpcds-q3.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(part.where(F.col("p_type").like("STANDARD%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.year("o_orderdate").cast("int").alias("y"), "p_brand")
        .agg(F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("revenue"))
        .orderBy(F.desc("revenue"), "y", "p_brand")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q45 shape: IN-subquery OR local predicate (the unpushable OR)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q45_style_subquery_or_local",
    """
    SELECT p_type,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 1)
       OR p_brand = 'Brand#11'
    GROUP BY p_type
    ORDER BY p_type
    """,
)
def tpcds_q45_style_subquery_or_local(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q45 shape: `key IN (subquery) OR local_predicate` — the OR
    means the IN cannot lower to a plain semi join (rows failing the
    IN may still pass the local side). Planned as a LEFT OUTER join
    to the DISTINCT subquery set with a mark column, then a filter on
    (mark OR local) — the standard existence-join decorrelation the
    reference plans for this. Scale: the subquery set is dim-sized
    (broadcast); the fact never duplicates (distinct keys); one
    |p_type| agg shuffle.
    Reference: testdata/workloads/tpcds/queries/tpcds-q45.test."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    small = (
        part.where(F.col("p_size") == 1)
        .select(F.col("p_partkey").alias("sq_pk"))
        .distinct()
        .withColumn("mark", F.lit(True))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(small), F.col("l_partkey") == F.col("sq_pk"), "left")
        .where(F.coalesce("mark", F.lit(False)) | (F.col("p_brand") == "Brand#11"))
        .groupBy("p_type")
        .agg(F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("revenue"))
        .orderBy("p_type")
    )


# ---------------------------------------------------------------------------
# q48 shape: sum under a three-arm band disjunction
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q48_style_band_disjunction_sum",
    """
    SELECT
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS total_qty,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE (o_orderpriority = '1-URGENT'
           AND l_quantity BETWEEN 1 AND 20
           AND l_discount BETWEEN 0.00 AND 0.05)
       OR (o_orderpriority = '3-MEDIUM'
           AND l_quantity BETWEEN 21 AND 40
           AND l_discount BETWEEN 0.02 AND 0.08)
       OR (o_orderpriority = '5-LOW'
           AND l_quantity BETWEEN 41 AND 50
           AND l_discount BETWEEN 0.04 AND 0.10)
    """,
)
def tpcds_q48_style_band_disjunction_sum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q48 shape: a single-row sum under a three-arm disjunction of
    ANDed range bands spanning both join sides (demographic x price
    bands in the reference). The common columns (quantity 1..50,
    discount 0..0.10 envelopes) are inferable but the cross-side OR
    itself evaluates post-join. Scale: one orderkey shuffle, 1-row
    reduce; all arms stay in codegen as one predicate tree.
    Reference: testdata/workloads/tpcds/queries/tpcds-q48.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    arm = lambda pri, qlo, qhi, dlo, dhi: (  # noqa: E731
        (F.col("o_orderpriority") == pri)
        & F.col("l_quantity").between(qlo, qhi)
        & F.col("l_discount").between(dlo, dhi)
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            arm("1-URGENT", 1, 20, 0.00, 0.05)
            | arm("3-MEDIUM", 21, 40, 0.02, 0.08)
            | arm("5-LOW", 41, 50, 0.04, 0.10)
        )
        .agg(
            F.sum(_d("l_quantity")).cast("decimal(38,2)").alias("total_qty"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q65 shape: items earning at most 10% of their group's average
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q65_style_low_revenue_items",
    """
    WITH rev AS (
      SELECT n_name, p_brand,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
          AS brand_rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN part ON l_partkey = p_partkey
      GROUP BY n_name, p_brand),
    tot AS (
      SELECT n_name AS t_n,
        CAST(SUM(brand_rev) AS DECIMAL(38,2)) AS nation_rev,
        CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM rev GROUP BY n_name)
    SELECT r.n_name, r.p_brand, r.brand_rev
    FROM rev r JOIN tot t ON r.n_name = t.t_n
    WHERE r.brand_rev * 10 * t.n_brands <= t.nation_rev
    ORDER BY n_name, p_brand
    """,
)
def tpcds_q65_style_low_revenue_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q65 shape: items whose revenue is at most 10% of the average
    item revenue in their store (here: brand revenue vs its nation's
    average). Two-level aggregate — the inner (nation, brand) agg
    re-aggregates to nation totals, joined back on nation; the 0.1x-
    average compare cross-multiplies (rev*10*cnt <= total), keeping
    the whole predicate exact decimal. Scale: the outer agg and the
    join reuse the nation key; dims broadcast into the fact pass.
    Reference: testdata/workloads/tpcds/queries/tpcds-q65.test."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("n_name", "p_brand")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)")
            .alias("brand_rev")
        )
    )
    tot = rev.groupBy(F.col("n_name").alias("t_n")).agg(
        F.sum("brand_rev").cast("decimal(38,2)").alias("nation_rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
    )
    return (
        rev.join(tot, F.col("n_name") == F.col("t_n"))
        .where(
            F.col("brand_rev") * 10 * F.col("n_brands") <= F.col("nation_rev")
        )
        .select("n_name", "p_brand", "brand_rev")
        .orderBy("n_name", "p_brand")
    )


# ---------------------------------------------------------------------------
# q70 shape: rollup restricted to window-ranked top groups
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q70_style_ranked_nation_rollup",
    """
    WITH base AS (
      SELECT n_name, s_name,
        CAST(l_extendedprice AS DECIMAL(12,2)) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey),
    top5 AS (
      SELECT n_name FROM (
        SELECT n_name,
          RANK() OVER (ORDER BY SUM(rev) DESC, n_name) AS rk
        FROM base GROUP BY n_name) t
      WHERE rk <= 5)
    SELECT CAST(GROUPING(n_name) * 2 + GROUPING(s_name) AS INT) AS lvl,
      n_name, s_name,
      CAST(SUM(rev) AS DECIMAL(38,2)) AS revenue
    FROM base WHERE n_name IN (SELECT n_name FROM top5)
    GROUP BY ROLLUP(n_name, s_name)
    ORDER BY lvl, COALESCE(n_name, ''), COALESCE(s_name, '')
    """,
)
def tpcds_q70_style_ranked_nation_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q70 shape: a ROLLUP report restricted to the top-5 states by
    profitability, where "top-5" is itself a windowed rank over an
    aggregate (subquery in the IN). The rank's ORDER BY carries the
    n_name tie-break. Scale: the rank input is a |nation|-row
    aggregate (broadcast semi join back into the fact); the rollup
    shuffles the fact once on its composite key.
    Reference: testdata/workloads/tpcds/queries/tpcds-q70.test."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", _d("l_extendedprice").alias("rev"))
    )
    by_nation = base.groupBy("n_name").agg(F.sum("rev").alias("nrev"))
    w = Window.orderBy(F.desc("nrev"), "n_name")
    top5 = (
        by_nation.select("n_name", F.rank().over(w).alias("rk"))
        .where(F.col("rk") <= 5)
        .select(F.col("n_name").alias("top_n"))
    )
    agg = (
        base.join(F.broadcast(top5), F.col("n_name") == F.col("top_n"),
                  "left_semi")
        .rollup("n_name", "s_name")
        .agg(
            F.sum("rev").cast("decimal(38,2)").alias("revenue"),
            (F.grouping("n_name") * 2 + F.grouping("s_name")).cast("int")
            .alias("lvl"),
        )
    )
    return agg.select("lvl", "n_name", "s_name", "revenue").orderBy(
        "lvl", F.coalesce("n_name", F.lit("")), F.coalesce("s_name", F.lit(""))
    )


# ---------------------------------------------------------------------------
# q91 shape: returned-revenue loss matrix by priority x segment
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q91_style_returns_loss_matrix",
    """
    SELECT o_orderpriority, c_mktsegment,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS returned_loss,
      CAST(COUNT(*) AS BIGINT) AS n_returns
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_returnflag = 'R'
      AND year(l_shipdate) = 1998 AND month(l_shipdate) = 9
    GROUP BY o_orderpriority, c_mktsegment
    ORDER BY o_orderpriority, c_mktsegment
    """,
)
def tpcds_q91_style_returns_loss_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q91 shape: one month's returned-revenue loss cross-tabbed over
    two demographic dimensions (call center x demographics in the
    reference). Scale: the return flag and ship month push to the
    fact scan; customer broadcasts; the matrix key space is tiny
    (5 priorities x 5 segments).
    Reference: testdata/workloads/tpcds/queries/tpcds-q91.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        li.where(
            (F.col("l_returnflag") == "R")
            & (F.year("l_shipdate") == 1998)
            & (F.month("l_shipdate") == 9)
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderpriority", "c_mktsegment")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)")
            .alias("returned_loss"),
            F.count(F.lit(1)).cast("bigint").alias("n_returns"),
        )
        .orderBy("o_orderpriority", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q96 shape: narrow-band count probe
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q96_style_band_count",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE year(l_shipdate) = 1998 AND quarter(l_shipdate) = 2
      AND o_orderpriority = '1-URGENT' AND l_linestatus = 'O'
    """,
)
def tpcds_q96_style_band_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q96 shape: a bare COUNT(*) through a narrow dimensional band
    (half-hour x household x store in the reference) — the "how fast
    is a filtered count through a join" probe. Scale: both filters
    push to their scans before the orderkey join; the count is a
    1-row reduce with map-side partials.
    Reference: testdata/workloads/tpcds/queries/tpcds-q96.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.where(
            (F.year("l_shipdate") == 1998)
            & (F.quarter("l_shipdate") == 2)
            & (F.col("l_linestatus") == "O")
        )
        .join(
            orders.where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# ---------------------------------------------------------------------------
# q5 shape: UNION ALL of per-channel sales/returns arms + rollup
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q5_style_union_pnl_rollup",
    """
    WITH u AS (
      SELECT 'store' AS ch, n_name,
        CASE WHEN l_returnflag = 'R' THEN 0
             ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END AS sales,
        CASE WHEN l_returnflag = 'R'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END AS returns
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_orderkey % 3 = 0
      UNION ALL
      SELECT 'catalog' AS ch, n_name,
        CASE WHEN l_returnflag = 'R' THEN 0
             ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END,
        CASE WHEN l_returnflag = 'R'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_orderkey % 3 = 1
      UNION ALL
      SELECT 'web' AS ch, n_name,
        CASE WHEN l_returnflag = 'R' THEN 0
             ELSE CAST(l_extendedprice AS DECIMAL(12,2)) END,
        CASE WHEN l_returnflag = 'R'
             THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_orderkey % 3 = 2)
    SELECT CAST(GROUPING(ch) * 2 + GROUPING(n_name) AS INT) AS lvl,
      ch, n_name,
      CAST(SUM(sales) AS DECIMAL(38,2)) AS sales,
      CAST(SUM(returns) AS DECIMAL(38,2)) AS returns,
      CAST(SUM(sales) - SUM(returns) AS DECIMAL(38,2)) AS profit
    FROM u
    GROUP BY ROLLUP(ch, n_name)
    ORDER BY lvl, COALESCE(ch, ''), COALESCE(n_name, '')
    """,
)
def tpcds_q5_style_union_pnl_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q5 shape: each channel contributes its own (sales, returns)
    arm; the arms UNION ALL into one relation rolled up over
    (channel, nation) — distinct from the q77 entry, which FULL OUTER
    JOINs two aggregates instead of unioning arms. Scale: the three
    arms share scan structure (Spark reuses the exchange under AQE
    where possible); the rollup shuffles the union once on its
    composite key; dims broadcast into each arm.
    Reference: testdata/workloads/tpcds/queries/tpcds-q5.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    zero = F.lit(0).cast("decimal(12,2)")

    def arm(m: int, name: str):
        return (
            li.where(F.col("l_orderkey") % 3 == m)
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                F.lit(name).alias("ch"),
                "n_name",
                F.when(F.col("l_returnflag") == "R", zero)
                .otherwise(_d("l_extendedprice")).alias("sales"),
                F.when(F.col("l_returnflag") == "R", _d("l_extendedprice"))
                .otherwise(zero).alias("returns"),
            )
        )

    u = arm(0, "store").unionAll(arm(1, "catalog")).unionAll(arm(2, "web"))
    agg = u.rollup("ch", "n_name").agg(
        F.sum("sales").cast("decimal(38,2)").alias("sales"),
        F.sum("returns").cast("decimal(38,2)").alias("returns"),
        (F.sum("sales") - F.sum("returns")).cast("decimal(38,2)")
        .alias("profit"),
        (F.grouping("ch") * 2 + F.grouping("n_name")).cast("int").alias("lvl"),
    )
    return agg.select("lvl", "ch", "n_name", "sales", "returns", "profit") \
        .orderBy("lvl", F.coalesce("ch", F.lit("")),
                 F.coalesce("n_name", F.lit("")))


# ---------------------------------------------------------------------------
# q18/q27 shape: rollup of the average battery over demographics
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q18_style_rollup_avg_battery",
    """
    SELECT CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lvl,
      n_name, c_mktsegment,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_price,
      CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE year(o_orderdate) = 1998
    GROUP BY ROLLUP(n_name, c_mktsegment)
    ORDER BY lvl, COALESCE(n_name, ''), COALESCE(c_mktsegment, '')
    """,
)
def tpcds_q18_style_rollup_avg_battery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q18 shape (q27 is the store twin): averages of purchase
    measures rolled up a demographic hierarchy (country -> state ->
    county in the reference; nation -> segment here), subtotals at
    every level. Averages divide exact decimal sums by exact counts
    AFTER the rollup, so subtotal rows divide identical inputs on
    both engines. Scale: one fact shuffle feeds the grouping-set
    expansion; dims broadcast.
    Reference: testdata/workloads/tpcds/queries/tpcds-q18.test,
    tpcds-q27.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        li.join(
            orders.where(F.year("o_orderdate") == 1998),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    agg = base.rollup("n_name", "c_mktsegment").agg(
        F.sum(_d("l_quantity")).alias("sq"),
        F.sum(_d("l_extendedprice")).alias("sp"),
        F.count(F.lit(1)).alias("c"),
        (F.grouping("n_name") * 2 + F.grouping("c_mktsegment")).cast("int")
        .alias("lvl"),
    )
    return agg.select(
        "lvl", "n_name", "c_mktsegment",
        (F.col("sq").cast("double") / F.col("c")).alias("avg_qty"),
        (F.col("sp").cast("double") / F.col("c")).alias("avg_price"),
        F.col("c").cast("bigint").alias("cnt"),
    ).orderBy(
        "lvl", F.coalesce("n_name", F.lit("")),
        F.coalesce("c_mktsegment", F.lit("")),
    )


# ---------------------------------------------------------------------------
# q28 shape: six-band multi-DISTINCT single-row report
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q28_style_six_band_distinct",
    """
    SELECT
      CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 5
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b1,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 5 THEN 1 END) AS BIGINT)
        AS cnt_b1,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 5
        THEN l_extendedprice END) AS BIGINT) AS dist_b1,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 6 AND 10
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b2,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 6 AND 10 THEN 1 END) AS BIGINT)
        AS cnt_b2,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 6 AND 10
        THEN l_extendedprice END) AS BIGINT) AS dist_b2,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 15
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b3,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 15 THEN 1 END) AS BIGINT)
        AS cnt_b3,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 15
        THEN l_extendedprice END) AS BIGINT) AS dist_b3,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 16 AND 20
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b4,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 16 AND 20 THEN 1 END) AS BIGINT)
        AS cnt_b4,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 16 AND 20
        THEN l_extendedprice END) AS BIGINT) AS dist_b4,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 25
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b5,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 25 THEN 1 END) AS BIGINT)
        AS cnt_b5,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 21 AND 25
        THEN l_extendedprice END) AS BIGINT) AS dist_b5,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 26 AND 30
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DECIMAL(38,2))
        AS sum_b6,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 26 AND 30 THEN 1 END) AS BIGINT)
        AS cnt_b6,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 26 AND 30
        THEN l_extendedprice END) AS BIGINT) AS dist_b6
    FROM lineitem
    """,
)
def tpcds_q28_style_six_band_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q28 shape: six quantity bands each reporting sum, count, and
    COUNT(DISTINCT) in ONE single-row query — the reference's
    MULTI_AGGREGATION stressor (MultiAggregateInfo duplicates agg
    classes per distinct set; Spark plans the same via Expand). The
    distinct target is the band-gated price (NULL outside the band),
    so each distinct class deduplicates only its own band. Scale: one
    scan, Expand x6 before the partial agg — map-side combine still
    applies; final reduce is 1 row.
    Reference: testdata/workloads/tpcds/queries/tpcds-q28.test."""
    li = load_table(spark, sf_dir, "lineitem")
    bands = [(1, 5), (6, 10), (11, 15), (16, 20), (21, 25), (26, 30)]
    aggs = []
    for i, (lo, hi) in enumerate(bands, start=1):
        inb = F.col("l_quantity").between(lo, hi)
        gated_dec = F.when(inb, _d("l_extendedprice"))
        gated_raw = F.when(inb, F.col("l_extendedprice"))
        aggs.append(F.sum(gated_dec).cast("decimal(38,2)").alias(f"sum_b{i}"))
        aggs.append(
            F.count(F.when(inb, F.lit(1))).cast("bigint").alias(f"cnt_b{i}")
        )
        aggs.append(
            F.countDistinct(gated_raw).cast("bigint").alias(f"dist_b{i}")
        )
    return li.agg(*aggs)


# ---------------------------------------------------------------------------
# q71 shape: hour-of-day breakdown across a channel union
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q71_style_hourly_channel_union",
    """
    SELECT ch, CAST(hour(ts) AS INT) AS hr,
      CAST(COUNT(*) AS BIGINT) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS amount
    FROM (
      SELECT 'web' AS ch, ts, value FROM events
      WHERE event_type IN ('click', 'view')
      UNION ALL
      SELECT 'store' AS ch, ts, value FROM events
      WHERE event_type = 'purchase'
      UNION ALL
      SELECT 'catalog' AS ch, ts, value FROM events
      WHERE event_type = 'signup') u
    GROUP BY ch, hour(ts)
    ORDER BY ch, hr
    """,
)
def tpcds_q71_style_hourly_channel_union(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q71 shape: three channel arms UNION ALLed and broken down by
    time-of-day (the reference joins a time dim for meal-hours; hours
    here). Scale: each arm's type filter pushes to the scan; the
    union aggregates once on (channel, hour) — 72 groups.
    Reference: testdata/workloads/tpcds/queries/tpcds-q71.test."""
    ev = load_table(spark, sf_dir, "events")

    def arm(name: str, pred):
        return ev.where(pred).select(
            F.lit(name).alias("ch"), "ts", "value"
        )

    u = (
        arm("web", F.col("event_type").isin("click", "view"))
        .unionAll(arm("store", F.col("event_type") == "purchase"))
        .unionAll(arm("catalog", F.col("event_type") == "signup"))
    )
    return (
        u.groupBy("ch", F.hour("ts").cast("int").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(38,2)").alias("amount"),
        )
        .orderBy("ch", "hr")
    )


# ---------------------------------------------------------------------------
# q8 shape: sales restricted to aggregate-qualified regions
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q8_style_agg_qualified_regions",
    """
    WITH pref AS (
      SELECT c_nationkey AS pn FROM customer
      WHERE c_acctbal > 5000
      GROUP BY c_nationkey
      HAVING COUNT(*) >= 20)
    SELECT n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_nationkey IN (SELECT pn FROM pref)
      AND year(o_orderdate) = 1998
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q8_style_agg_qualified_regions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q8 shape: the qualifying region set is ITSELF an aggregate
    (zips with >=10 preferred customers in the reference; nations
    with >=20 high-balance customers here) semi-joined into the sales
    aggregate — a dim filter derived by aggregation, not a literal
    list. Scale: the qualifier agg is dim-sized and broadcasts as a
    semi join; the fact prunes on year at the scan.
    Reference: testdata/workloads/tpcds/queries/tpcds-q8.test."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    pref = (
        cust.where(F.col("c_acctbal") > 5000)
        .groupBy(F.col("c_nationkey").alias("pn"))
        .agg(F.count(F.lit(1)).alias("nc"))
        .where(F.col("nc") >= 20)
        .select("pn")
    )
    return (
        orders.where(F.year("o_orderdate") == 1998)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(pref), F.col("c_nationkey") == F.col("pn"),
              "left_semi")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(_d("o_totalprice")).cast("decimal(38,2)").alias("revenue"))
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q10 shape: EXISTS and (EXISTS or EXISTS) demographic counts
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q10_style_exists_or_exists_counts",
    """
    SELECT c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998
          AND quarter(o_orderdate) = 1)
      AND (EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998
              AND quarter(o_orderdate) = 2)
        OR EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998
              AND quarter(o_orderdate) = 3))
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def tpcds_q10_style_exists_or_exists_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q10 shape: customers active in Q1 AND (Q2 OR Q3) — the OR of
    correlated EXISTS cannot both lower to semi joins directly; the
    OR arm plans as existence-mark (left outer + mark) joins combined
    with a disjunctive filter, the AND arm as a plain LEFT SEMI.
    Here: semi join for Q1; the Q2-or-Q3 arm is a single semi join on
    the union predicate quarter IN (2,3) — equivalent algebra with
    one fewer probe (EXISTS a OR EXISTS b == EXISTS (a UNION b) on
    the same key). Scale: both order sets prune at the scan and hash
    on custkey. Reference: testdata/workloads/tpcds/queries/
    tpcds-q10.test, tpcds-q69.test."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o98 = orders.where(F.year("o_orderdate") == 1998)
    q1 = o98.where(F.quarter("o_orderdate") == 1).select(
        F.col("o_custkey").alias("q1_ck")
    )
    q23 = o98.where(F.quarter("o_orderdate").isin(2, 3)).select(
        F.col("o_custkey").alias("q23_ck")
    )
    return (
        cust.join(q1, F.col("c_custkey") == F.col("q1_ck"), "left_semi")
        .join(q23, F.col("c_custkey") == F.col("q23_ck"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q13/q85 shape: average battery under a cross-side band disjunction
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q13_style_band_disjunction_avgs",
    """
    SELECT
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS sum_price,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE (c_mktsegment = 'BUILDING'
           AND o_totalprice BETWEEN 100000 AND 200000
           AND l_quantity BETWEEN 1 AND 25)
       OR (c_mktsegment = 'MACHINERY'
           AND o_totalprice BETWEEN 150000 AND 250000
           AND l_quantity BETWEEN 26 AND 50)
       OR (c_mktsegment = 'HOUSEHOLD'
           AND o_totalprice BETWEEN 50000 AND 150000
           AND l_quantity BETWEEN 10 AND 40)
    """,
)
def tpcds_q13_style_band_disjunction_avgs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q13 shape (q85 is the returns twin): the single-row AVERAGE
    battery under a three-arm disjunction whose arms span THREE
    relations (demographic x order amount x line quantity) — no arm
    can fully push to any single scan. Averages are one double
    division of exact decimal sums each. Scale: one orderkey shuffle,
    customer broadcasts, 1-row reduce.
    Reference: testdata/workloads/tpcds/queries/tpcds-q13.test,
    tpcds-q85.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    arm = lambda seg, plo, phi, qlo, qhi: (  # noqa: E731
        (F.col("c_mktsegment") == seg)
        & F.col("o_totalprice").between(plo, phi)
        & F.col("l_quantity").between(qlo, qhi)
    )
    cnt = F.count(F.lit(1))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(
            arm("BUILDING", 100000, 200000, 1, 25)
            | arm("MACHINERY", 150000, 250000, 26, 50)
            | arm("HOUSEHOLD", 50000, 150000, 10, 40)
        )
        .agg(
            (F.sum(_d("l_quantity")).cast("double") / cnt).alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / cnt)
            .alias("avg_price"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)")
            .alias("sum_price"),
            cnt.cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q19 shape: cross-border brand revenue (buyer nation != seller nation)
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q19_style_cross_border_brands",
    """
    SELECT p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE c_nationkey <> s_nationkey AND year(o_orderdate) = 1998
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def tpcds_q19_style_cross_border_brands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q19 shape: brand revenue where the buyer's and seller's
    locations DIFFER (the reference's store-zip != customer-zip) — an
    inequality predicate across two dimensions that only evaluates
    after both joins. Scale: the inequality is a post-join filter (it
    cannot prune either scan); dims broadcast; one orderkey shuffle
    then one |brand| agg.
    Reference: testdata/workloads/tpcds/queries/tpcds-q19.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            orders.where(F.year("o_orderdate") == 1998),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q30/q81 shape: customers returning above 1.2x their nation's average
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q30_style_above_avg_returners",
    """
    WITH cr AS (
      SELECT c_custkey AS ck, c_nationkey AS nk,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS ret_amt
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_nationkey),
    na AS (
      SELECT nk AS a_nk,
        CAST(SUM(ret_amt) AS DECIMAL(38,2)) AS tot,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cr GROUP BY nk)
    SELECT n_name, cr.ck AS custkey, cr.ret_amt
    FROM cr
    JOIN na ON cr.nk = na.a_nk
    JOIN nation ON cr.nk = n_nationkey
    WHERE cr.ret_amt * 10 * na.cnt > 12 * na.tot
    ORDER BY n_name, custkey
    """,
)
def tpcds_q30_style_above_avg_returners(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q30 shape (q81 is the catalog twin): customers whose total
    returns exceed 1.2x the average return total of their state. The
    per-customer aggregate re-aggregates per nation; the 1.2x-average
    compare cross-multiplies (amt*10*cnt > 12*tot) — exact decimal
    throughout. Scale: the nation-level re-agg is dim-sized and
    broadcasts back onto the customer-grained relation.
    Reference: testdata/workloads/tpcds/queries/tpcds-q30.test,
    tpcds-q81.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cr = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_custkey").alias("ck"), F.col("c_nationkey").alias("nk")
        )
        .agg(F.sum(_d("l_extendedprice")).cast("decimal(18,2)").alias("ret_amt"))
    )
    na = cr.groupBy(F.col("nk").alias("a_nk")).agg(
        F.sum("ret_amt").cast("decimal(38,2)").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    return (
        cr.join(F.broadcast(na), F.col("nk") == F.col("a_nk"))
        .where(F.col("ret_amt") * 10 * F.col("cnt") > 12 * F.col("tot"))
        .join(F.broadcast(nation), F.col("nk") == F.col("n_nationkey"))
        .select("n_name", F.col("ck").alias("custkey"), "ret_amt")
        .orderBy("n_name", "custkey")
    )


# ---------------------------------------------------------------------------
# q43 shape: day-of-week sales pivot per supplier nation
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q43_style_dow_pivot",
    """
    SELECT n_name,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 0
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS sun_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 1
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS mon_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 2
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS tue_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 3
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS wed_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 4
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS thu_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 5
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS fri_sales,
      CAST(SUM(CASE WHEN dayofweek(l_shipdate) = 6
        THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE 0 END)
        AS DECIMAL(38,2)) AS sat_sales
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE year(l_shipdate) = 1998
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def tpcds_q43_style_dow_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q43 shape: one year's sales pivoted into seven day-of-week
    columns per store (supplier nation here) — seven conditional
    decimal sums in ONE aggregate pass, not seven scans.
    Spark dayofweek() is 1=Sunday..7=Saturday while DuckDB's is
    0=Sunday..6=Saturday — the oracle uses the 0-based values for the
    same calendar days. Scale: one
    fact pass with pushed year filter, dims broadcast, |nation| agg.
    Reference: testdata/workloads/tpcds/queries/tpcds-q43.test."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    days = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        F.sum(
            F.when(F.dayofweek("l_shipdate") == i + 1, _d("l_extendedprice"))
            .otherwise(0)
        ).cast("decimal(38,2)").alias(f"{d}_sales")
        for i, d in enumerate(days)
    ]
    return (
        li.where(F.year("l_shipdate") == 1998)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
    )


# ---------------------------------------------------------------------------
# q61 shape: promotional-sales share ratio of two aggregates
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q61_style_promo_share",
    """
    WITH promo AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        AS DECIMAL(38,2)) AS p
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND l_discount >= 0.05 AND year(l_shipdate) = 1998),
    total AS (
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
        AS DECIMAL(38,2)) AS t
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        AND year(l_shipdate) = 1998)
    SELECT p AS promo_rev, t AS total_rev,
      CAST(p AS DOUBLE) / CAST(t AS DOUBLE) AS promo_share
    FROM promo, total
    """,
)
def tpcds_q61_style_promo_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q61 shape: promotional revenue over total revenue as a ratio
    of two single-row aggregates cross-joined (1x1 — the one place a
    cross join is free). The share is ONE double division of exact
    decimal sums. Scale: two fact passes with pushed filters (the
    promo pass is a strict subset predicate), 1-row join.
    Reference: testdata/workloads/tpcds/queries/tpcds-q61.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    base = li.join(
        orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).where(F.year("l_shipdate") == 1998)
    promo = base.where(F.col("l_discount") >= 0.05).agg(
        F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("promo_rev")
    )
    total = base.agg(
        F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("total_rev")
    )
    return promo.crossJoin(total).select(
        "promo_rev", "total_rev",
        (F.col("promo_rev").cast("double") / F.col("total_rev").cast("double"))
        .alias("promo_share"),
    )


# ---------------------------------------------------------------------------
# q17/q25 shape: buy -> return -> re-buy chain with quantity stats
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q17_style_buy_return_rebuy_stats",
    """
    WITH first_buy AS (
      SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q1
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE quarter(o_orderdate) = 1 AND year(o_orderdate) = 1998),
    returned AS (
      SELECT DISTINCT o_custkey AS rck, l_partkey AS rpk
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R' AND year(o_orderdate) = 1998),
    rebuy AS (
      SELECT o_custkey AS bck, l_partkey AS bpk, l_quantity AS q2
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE quarter(o_orderdate) >= 2 AND year(o_orderdate) = 1998)
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_chains,
      CAST(SUM(CAST(q1 AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_first_qty,
      CAST(SUM(CAST(q2 AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        AS avg_rebuy_qty
    FROM first_buy f
    JOIN returned r ON f.ck = r.rck AND f.pk = r.rpk
    JOIN rebuy b ON f.ck = b.bck AND f.pk = b.bpk
    """,
)
def tpcds_q17_style_buy_return_rebuy_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q17 shape (q25 is the profit twin): three instances of the
    fact chained on (customer, item) — a first-quarter purchase, a
    return of the same item, and a later re-purchase — with quantity
    statistics over the surviving chains. The return set is
    DISTINCTed before joining so chain fan-out is purchase x rebuy
    only (deterministic). Averages are one double division each.
    Scale: all three legs shuffle on the same (custkey, partkey)
    composite key; year/quarter filters push to the orders scans.
    Reference: testdata/workloads/tpcds/queries/tpcds-q17.test,
    tpcds-q25.test."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    y98 = F.year("o_orderdate") == 1998
    first_buy = j.where(y98 & (F.quarter("o_orderdate") == 1)).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"),
        F.col("l_quantity").alias("q1"),
    )
    returned = (
        j.where(y98 & (F.col("l_returnflag") == "R"))
        .select(F.col("o_custkey").alias("rck"), F.col("l_partkey").alias("rpk"))
        .distinct()
    )
    rebuy = j.where(y98 & (F.quarter("o_orderdate") >= 2)).select(
        F.col("o_custkey").alias("bck"), F.col("l_partkey").alias("bpk"),
        F.col("l_quantity").alias("q2"),
    )
    chains = (
        first_buy.join(
            returned,
            (F.col("ck") == F.col("rck")) & (F.col("pk") == F.col("rpk")),
        )
        .join(
            rebuy,
            (F.col("ck") == F.col("bck")) & (F.col("pk") == F.col("bpk")),
        )
    )
    cnt = F.count(F.lit(1))
    return chains.agg(
        cnt.cast("bigint").alias("n_chains"),
        (F.sum(F.col("q1").cast("decimal(12,2)")).cast("double") / cnt)
        .alias("avg_first_qty"),
        (F.sum(F.col("q2").cast("decimal(12,2)")).cast("double") / cnt)
        .alias("avg_rebuy_qty"),
    )


# ---------------------------------------------------------------------------
# q24 shape: customers spending above 5% of the overall average total
# ---------------------------------------------------------------------------


@_register(
    "tpcds_q24_style_share_threshold",
    """
    WITH per_cust AS (
      SELECT o_custkey AS ck,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
          AS spend
      FROM orders GROUP BY o_custkey),
    tot AS (
      SELECT CAST(SUM(spend) AS DECIMAL(38,2)) AS t,
        CAST(COUNT(*) AS BIGINT) AS cnt
      FROM per_cust)
    SELECT ck AS custkey, spend
    FROM per_cust, tot
    WHERE spend * 20 * cnt > t
    ORDER BY custkey
    """,
)
def tpcds_q24_style_share_threshold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q24 shape: keep customers whose total exceeds 5% of the
    average customer total — a scalar aggregate-of-aggregate
    threshold (the reference's `having sum > 0.05 * (select avg ...)`).
    The 5%-of-average compare cross-multiplies (spend*20*cnt > tot);
    the 1-row total broadcasts onto the per-customer relation.
    Scale: one custkey shuffle; the re-agg is a 1-row reduce.
    Reference: testdata/workloads/tpcds/queries/tpcds-q24.test."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(_d("o_totalprice")).cast("decimal(18,2)").alias("spend")
    )
    tot = per_cust.agg(
        F.sum("spend").cast("decimal(38,2)").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    return (
        per_cust.crossJoin(F.broadcast(tot))
        .where(F.col("spend") * 20 * F.col("cnt") > F.col("t"))
        .select(F.col("ck").alias("custkey"), "spend")
        .orderBy("custkey")
    )
