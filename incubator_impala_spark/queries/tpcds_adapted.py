"""TPC-DS-shaped analytic corpus, adapted to the driver schema.

The reference's secondary workload is TPC-DS (205 query files,
`testdata/workloads/tpcds/queries/`). The full schema isn't present,
so these entries reproduce the *distinctive plan shapes* of well-known
DS queries on the TPC-H-subset tables: rollup + grouping() + rank
within grouping level (q36), compare-to-group-average with a
correlated threshold (q1), one-row multi-band scalar aggregates (q88),
and order-size distribution banding (q34).

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
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = (_d("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - _d("l_discount")))
    m = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .rollup("p_type", "p_brand")
        .agg(
            (F.sum(disc).cast("double") / F.sum(_d("l_extendedprice")).cast("double"))
            .alias("margin"),
            (F.grouping("p_type") * 2 + F.grouping("p_brand"))
            .cast("int")
            .alias("lvl"),
        )
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
