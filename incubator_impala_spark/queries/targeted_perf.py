"""Driver-gate entries for the targeted-perf corpus shapes (r10).

The reference's single-operator perf primitives
(testdata/workloads/targeted-perf/queries/) run against the dbgen
sf1 fixture in tests/test_targeted_perf.py (recorded answers
verbatim, perf-only blocks via a dual-engine fingerprint); the
entries here re-express four representative shapes on the driver's
tables so the operator classes they pin — decimal arithmetic
(primitive_decimal_arithmetic), large IN lists
(primitive_filter_in_predicate), string-keyed shuffle joins
(primitive_shuffle_join_one_to_many_string_with_groupby) and
OR-of-range conjunct ordering (primitive_conjunct_ordering) — are in
the per-round DuckDB correctness gate at every SF.

Hash-parity conventions follow tpch.py: money sums as exact decimals
(products kept at full scale so no per-row rounding), divisions
computed in DOUBLE on both sides then pinned to DECIMAL(18,6) (the
identical IEEE quotient rounds identically; quotients of 2-decimal
inputs are never exactly on a decimal-tie boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


# primitive_decimal_arithmetic: the four decimal operator families in
# one aggregation — DECIMAL_V2 arithmetic parity under sum
# (reference: be/src/exprs/decimal-operators-ir.cc). The sf1 schema
# types these DECIMAL(15,2); the driver parquet is double, so both
# sides cast to DECIMAL(12,2) first.
@_register(
    "tperf_decimal_arithmetic",
    """
    SELECT
      CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) *
               CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(18,4)))
           AS DECIMAL(38,4)) AS sum_mul,
      CAST(SUM(CAST(CAST(l_quantity AS DOUBLE) /
               CAST(l_tax AS DOUBLE) AS DECIMAL(18,6)))
           AS DECIMAL(38,6)) AS sum_div,
      CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) +
               CAST(l_tax AS DECIMAL(12,2)) AS DECIMAL(18,2)))
           AS DECIMAL(38,2)) AS sum_add,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) -
               CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(18,2)))
           AS DECIMAL(38,2)) AS sum_sub
    FROM lineitem WHERE l_tax > 0 AND l_discount > 0
    """,
)
def tperf_decimal_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    mul = (_d("l_quantity") * _d("l_tax")).cast("decimal(18,4)")
    div = (F.col("l_quantity").cast("double")
           / F.col("l_tax").cast("double")).cast("decimal(18,6)")
    add = (_d("l_quantity") + _d("l_tax")).cast("decimal(18,2)")
    sub = (_d("l_extendedprice") - _d("l_discount")).cast("decimal(18,2)")
    return (
        li.where((F.col("l_tax") > 0) & (F.col("l_discount") > 0))
        .agg(F.sum(mul).cast("decimal(38,4)").alias("sum_mul"),
             F.sum(div).cast("decimal(38,6)").alias("sum_div"),
             F.sum(add).cast("decimal(38,2)").alias("sum_add"),
             F.sum(sub).cast("decimal(38,2)").alias("sum_sub"))
    )


# primitive_filter_in_predicate: a several-hundred-literal IN list
# must stay a scan-level predicate (Impala codegens it; Spark turns
# long lists into an InSet hash probe inside WholeStageCodegen).
_IN_LIST = ",".join(str(v) for v in range(1, 2300, 5))


@_register(
    "tperf_filter_in_large_list",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem WHERE l_partkey IN ({_IN_LIST})
    """,
)
def tperf_filter_in_large_list(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (li.where(F.col("l_partkey")
                     .isin([v for v in range(1, 2300, 5)]))
            .agg(F.count("*").alias("cnt")))


# primitive_shuffle_join_one_to_many_string_with_groupby: both join
# keys are computed strings, so no scan-side partitioning survives —
# the shuffle hashes the derived key (at 100 TB: an unavoidable
# repartition on both sides; Spark plans exactly that). The corpus
# text's HAVING =999999 pins an empty set; this entry keeps rows
# (orders with the max 7-lineitem fan-out) so values verify.
@_register(
    "tperf_shuffle_join_string_groupby",
    """
    SELECT o.okey_str AS okey_str, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT UPPER(CONCAT(CAST(l_orderkey AS VARCHAR), 'bla'))
                 AS lkey_str FROM lineitem) l
    JOIN (SELECT UPPER(CONCAT(CAST(o_orderkey AS VARCHAR), 'bla'))
                 AS okey_str FROM orders) o
      ON l.lkey_str = o.okey_str
    GROUP BY o.okey_str
    HAVING COUNT(*) >= 7
    """,
)
def tperf_shuffle_join_string_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        F.upper(F.concat(F.col("l_orderkey").cast("string"),
                         F.lit("bla"))).alias("lkey_str"))
    orders = load_table(spark, sf_dir, "orders").select(
        F.upper(F.concat(F.col("o_orderkey").cast("string"),
                         F.lit("bla"))).alias("okey_str"))
    return (li.join(orders, li.lkey_str == orders.okey_str)
            .groupBy("okey_str")
            .agg(F.count("*").alias("cnt"))
            .where(F.col("cnt") >= 7))


# primitive_conjunct_ordering block 2: OR'd range predicates over two
# columns + a selective price band — the conjunct-ordering shape
# (cheap selective band first, OR chain second); values verify via
# the avg/count/ndv triple.
@_register(
    "tperf_conjunct_ordering_ranges",
    """
    SELECT
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(l_extendedprice) AS DECIMAL(18,6)) AS avg_price,
      CAST(COUNT(l_extendedprice) AS BIGINT) AS cnt,
      CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS ndv_price
    FROM lineitem
    WHERE (l_discount BETWEEN 0.02 AND 0.03
        OR l_discount BETWEEN 0.04 AND 0.05
        OR l_tax BETWEEN 0.01 AND 0.02
        OR l_tax BETWEEN 0 AND 0.009)
      AND l_extendedprice BETWEEN 1000 AND 5000
    """,
)
def tperf_conjunct_ordering_ranges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc, tax = F.col("l_discount"), F.col("l_tax")
    cond = (disc.between(0.02, 0.03) | disc.between(0.04, 0.05)
            | tax.between(0.01, 0.02) | tax.between(0, 0.009))
    return (
        li.where(cond & F.col("l_extendedprice").between(1000, 5000))
        .agg((F.sum(_d("l_extendedprice")).cast("double")
              / F.count("l_extendedprice")).cast("decimal(18,6)")
             .alias("avg_price"),
             F.count("l_extendedprice").alias("cnt"),
             F.countDistinct("l_extendedprice").alias("ndv_price"))
    )
