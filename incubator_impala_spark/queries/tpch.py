"""TPC-H query corpus, adapted to the driver's schema subset.

The reference's primary benchmark/correctness corpus is TPC-H q1-q22
(`testdata/workloads/tpch/queries/tpch-q*.test`, schema
`testdata/datasets/tpch/tpch_schema_template.sql`). The driver's
synthetic tables carry a column subset (no partsupp, no
l_shipmode/l_commitdate/l_receiptdate/comments — see FIXTURES.md §1),
so queries needing those columns are adapted (suffix `_adapted`).
q2/q11/q16/q20 originally price against partsupp; their adapted forms
keep each query's characteristic plan shape (correlated min-cost
subquery, value-share HAVING vs a global scalar, distinct-count with
NOT IN exclusion, nested IN + HAVING) using lineitem as the
part↔supplier bridge.

Implementation stance: DataFrame API, declarative; Catalyst chooses
join strategies (dims broadcast under AQE / autoBroadcastJoinThreshold,
facts shuffle-hash-join on keys — the Spark analogue of the
reference's DistributedPlanner broadcast-vs-partition costing,
fe/.../planner/DistributedPlanner.java:479-537).

Numeric parity strategy (vs the DuckDB oracle): money columns are
doubles holding exact 2-decimal values (FIXTURES.md: logically
DECIMAL(12,2)); we cast to DECIMAL *before* aggregating so every sum
is exact decimal arithmetic — order-independent, so Spark's
nondeterministic partition ordering cannot perturb results. Ratios are
computed as exact-decimal numerator/denominator cast to DOUBLE and
divided (identical IEEE operands on both engines), then pinned to
DECIMAL(18,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_impala_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLE_SQL: dict = {}

# Queries whose original form needs absent columns/tables; adapted variants below.
ADAPTED_FOR_SCHEMA = {"q2", "q4", "q9", "q11", "q12", "q16", "q17", "q19", "q20", "q21", "q22"}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _d(col: str):
    """Money/quantity column as exact DECIMAL(12,2)."""
    return F.col(col).cast("decimal(12,2)")


def _one():
    # lazy: F.lit needs an active SparkContext
    return F.lit(1).cast("decimal(12,2)")


# ---------------------------------------------------------------------------
# Q1 — pricing summary report (scan → filter → hash agg).
# Reference golden test: testdata/workloads/tpch/queries/tpch-q1.test.
# Scale: single shuffle on a 2-value×2-value grouping key; partial
# aggregation (Spark's map-side combine ≈ the reference's
# StreamingAggregationNode, be/src/exec/streaming-aggregation-node.h:46)
# collapses 600k rows to ~6 groups per task before exchange.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q1",
    """
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_base_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
      CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(18,6)) AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast(
        "decimal(18,4)"
    )
    # (18,4) × (13,2) has scale-6 exact product; keep all 6 digits so no
    # per-row rounding happens (Spark HALF_UP vs DuckDB HALF_EVEN diverge
    # on representable ties — the round-1 tpch_q1 hash failure).
    charge = (disc_price * (_one() + _d("l_tax"))).cast("decimal(18,6)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_d("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").alias("sum_disc_price"),
            F.sum(charge).cast("decimal(38,6)").alias("sum_charge"),
            (F.sum(_d("l_quantity")).cast("double") / F.count("*"))
            .cast("decimal(18,6)")
            .alias("avg_qty"),
            (F.sum(_d("l_extendedprice")).cast("double") / F.count("*"))
            .cast("decimal(18,6)")
            .alias("avg_price"),
            (F.sum(_d("l_discount")).cast("double") / F.count("*"))
            .cast("decimal(18,6)")
            .alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority (dim-filter → broadcast join → agg → top-k).
# Scale: customer (filtered) broadcasts; orders⋈lineitem shuffles on
# orderkey; final TakeOrderedAndProject replaces a global sort (the
# reference's TopNNode, be/src/exec/topn-node.h:66).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q3",
    """
    SELECT
      l_orderkey,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 (adapted) — order-priority checking via EXISTS semi join.
# Original needs l_commitdate/l_receiptdate (absent); adapted predicate:
# lineitem shipped after the order date. Exercises LEFT SEMI join
# (reference join op TJoinOp::LEFT_SEMI_JOIN, PlanNodes.thrift:361-378).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q4_adapted",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume (5-way join through region/nation).
# Scale: region/nation/supplier/customer all broadcast (dims);
# orders⋈lineitem is the only shuffle pair. The c_nationkey=s_nationkey
# residual rides the join, pruning early.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q5",
    """
    SELECT n_name,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    revenue = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    return (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan+filter+agg; the driver's
# M0 spine query). Filters push to the parquet scan (PushedFilters on
# l_shipdate/l_quantity — parity with the reference's parquet
# row-group/page pruning, be/src/exec/parquet/parquet-page-index.cc).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q6",
    """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((_d("l_extendedprice") * _d("l_discount")).cast("decimal(18,4)"))
        .cast("decimal(38,4)")
        .alias("revenue")
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (6-way join, dims broadcast).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      CAST(year(l_shipdate) AS INT) AS l_year,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l_shipdate) AS INT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(vol).cast("decimal(38,4)").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share (ratio-of-sums over an 8-way join).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q8",
    """
    SELECT o_year,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS DECIMAL(18,6)) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume,
        n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    all_nations = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        all_nations.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            )
            .cast("decimal(18,6)")
            .alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted) — profit by nation/year. Original multiplies in
# ps_supplycost (partsupp absent); adapted profit = revenue only.
# Part predicate on p_name keyword (names are "<adj> <noun>").
# ---------------------------------------------------------------------------
@_register(
    "tpch_q9_adapted",
    """
    SELECT nation, o_year,
      CAST(SUM(amount) AS DECIMAL(38,4)) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    amount = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("decimal(38,4)").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q10 — returned items (top 20 customers by lost revenue).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
      CAST(c_acctbal AS DECIMAL(12,2)) AS acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, CAST(c_acctbal AS DECIMAL(12,2)), n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    revenue = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name", _d("c_acctbal").alias("acctbal"), F.col("n_name")
        )
        .agg(F.sum(revenue).cast("decimal(38,4)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q12 (adapted) — priority counting. Original groups by l_shipmode
# (absent); adapted groups by l_returnflag with the same conditional
# aggregation shape (CASE inside SUM).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q12_adapted",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (LEFT OUTER with an ON-clause
# residual predicate, then agg-of-agg).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q13",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3 'aggregate before you shuffle'): count orders per
    # custkey FIRST (map-side partial agg collapses the fact before its
    # exchange), then left-join customers to the tiny per-custkey count
    # relation — the old plan shipped every order row through the outer
    # join and aggregated the joined fact. Row-identical: customers
    # whose orders are all '1-URGENT' (or who have none) take the NULL
    # branch of the outer join and coalesce to the same c_count = 0.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_custkey = (
        orders.where(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("o_orderkey").alias("_n"))
    )
    per_cust = (
        cust.join(per_custkey, F.col("c_custkey") == F.col("o_custkey"),
                  "left_outer")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional ratio-of-sums).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q14",
    """
    SELECT CAST(
      100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE)
      AS DECIMAL(18,6)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    zero = F.lit(0).cast("decimal(18,4)")
    return li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")).agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        )
        .cast("decimal(18,6)")
        .alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier (CTE + scalar max, decorrelated as a 1-row
# broadcast join — the scalable form of the reference's
# CardinalityCheckNode-guarded scalar subquery).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q15",
    """
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    ORDER BY s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).cast("decimal(38,4)").alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue0.join(
            F.broadcast(max_rev),
            F.col("total_revenue") == F.col("max_revenue"),
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 (adapted) — small-quantity-order revenue. Correlated scalar avg
# subquery decorrelated into a per-part aggregate join (what both
# Impala's StmtRewriter and Catalyst do internally; here explicit in
# the DataFrame plan). p_container absent -> p_brand-only predicate.
# avg(l_quantity) over integer-valued doubles is order-independent.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q17_adapted",
    """
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS DECIMAL(18,6)) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
    """,
)
def tpch_q17_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(part_avg, F.col("avg_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0))
            .cast("decimal(18,6)")
            .alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (IN-subquery with HAVING -> semi join).
# sum(l_quantity) over integer-valued doubles is exact.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q18",
    """
    SELECT c_name, c_custkey, o_orderkey,
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
      CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 140)
    GROUP BY c_name, c_custkey, o_orderkey, CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
             CAST(o_totalprice AS DECIMAL(12,2))
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3 'aggregate before you shuffle' / §2.4): the final
    # group key contains o_orderkey, which is unique in orders, so the
    # group's sum(l_quantity) IS the per-order total the IN-subquery
    # computes — one lineitem scan + one per-orderkey aggregate serves
    # as both the >140 filter and the output sum. The old plan scanned
    # and shuffled lineitem twice (once for the subquery aggregate,
    # once through the orders join) and re-aggregated the joined fact.
    # Row-identical: each surviving order joins exactly one customer,
    # and the decimal sums are exact (order-free) either way.
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    order_qty = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("tot_qty"))
        .where(F.col("tot_qty") > 140)
    )
    return (
        order_qty.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _d("o_totalprice").alias("totalprice"),
            F.col("tot_qty").cast("decimal(38,2)").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q19 (adapted) — discounted revenue over OR'd multi-column predicates
# (the reference evaluates these as other_join_conjuncts on the hash
# join, PlanNodes.thrift:380-390; Catalyst pushes the common p_partkey
# equi-key and keeps the OR as a residual filter).
# p_container absent -> brand/size/quantity disjunction.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q19_adapted",
    """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE
      (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
      OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30)
      OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def tpch_q19_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (_d("l_extendedprice") * (_one() - _d("l_discount"))).cast("decimal(18,4)")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(F.sum(rev).cast("decimal(38,4)").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q21 (adapted) — suppliers who kept orders waiting. Original's
# EXISTS / NOT-EXISTS pair over l_receiptdate/l_commitdate (absent)
# re-expressed set-based: per (order, supplier) lateness flags
# (late = shipped >60 days after order date), then order-level counts.
# Equivalent semantics, and scales as two hash aggregations instead of
# two correlated nested-loop probes.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q21_adapted",
    """
    WITH per AS (
      SELECT l_orderkey, l_suppkey,
        MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey, l_suppkey
    ), ord AS (
      SELECT l_orderkey, COUNT(*) AS nsupp, SUM(is_late) AS nlate
      FROM per GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per JOIN ord USING (l_orderkey)
             JOIN supplier ON per.l_suppkey = s_suppkey
    WHERE per.is_late = 1 AND ord.nsupp > 1 AND ord.nlate = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 note: a window-over-`per` form (one exchange, no self-join)
    # was measured and REJECTED — the orderkey sort behind the window
    # costs more than the hash re-aggregate + join it saves, at sf0.1
    # and in principle (hash agg beats sort at any scale for this
    # shape; the duplicate `per` subtree is AQE-stage-reused).
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.when(
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"), 1
    ).otherwise(0)
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("is_late"))
    )
    ord_stats = per.groupBy("l_orderkey").agg(
        F.count("*").alias("nsupp"), F.sum("is_late").alias("nlate")
    )
    return (
        per.join(ord_stats, "l_orderkey")
        .where((F.col("is_late") == 1) & (F.col("nsupp") > 1) & (F.col("nlate") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 (adapted) — global sales opportunity. c_phone absent; country
# code derived as c_nationkey % 5. Exercises NOT EXISTS (anti join) +
# uncorrelated scalar avg subquery (broadcast threshold).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q22_adapted",
    """
    WITH pool AS (
      SELECT CAST(c_nationkey % 5 AS VARCHAR) AS cntrycode, c_custkey, c_acctbal
      FROM customer WHERE c_nationkey % 5 IN (1, 2, 3)
    ), threshold AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM pool WHERE c_acctbal > 0.0
    )
    SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS totacctbal
    FROM pool, threshold
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def tpch_q22_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pool = cust.where((F.col("c_nationkey") % 5).isin(1, 2, 3)).select(
        (F.col("c_nationkey") % 5).cast("string").alias("cntrycode"),
        "c_custkey",
        "c_acctbal",
    )
    threshold = pool.where(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_d("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        pool.join(F.broadcast(threshold))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_d("c_acctbal")).cast("decimal(38,2)").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


# ---------------------------------------------------------------------------
# Q2 (adapted) — min-cost supplier. Original prices against
# partsupp.ps_supplycost (absent); adapted cost = min observed unit
# price per (part, supplier) from lineitem. Keeps the characteristic
# correlated-min subquery shape (window-min + equality instead of a
# re-scan, the same plan Impala's StmtRewriter produces).
# Scale: cost table shuffles once on (partkey, suppkey); the regional
# supplier dim broadcasts; window-min over partkey reuses the
# aggregation's partitioning.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q2_adapted",
    """
    WITH eur AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    cost AS (
      SELECT l_partkey, l_suppkey,
        MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
          AS unit_cost
      FROM lineitem GROUP BY 1, 2),
    rc AS (
      SELECT c.l_partkey, e.s_acctbal, e.s_name, e.n_name, c.unit_cost,
        MIN(c.unit_cost) OVER (PARTITION BY c.l_partkey) AS min_cost
      FROM cost c JOIN eur e ON c.l_suppkey = e.s_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM rc JOIN part ON l_partkey = p_partkey
    WHERE p_size = 15 AND unit_cost = min_cost
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 20
    """,
)
def tpch_q2_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    li = load_table(spark, sf_dir, "lineitem")

    eur = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    rc = cost.join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    rc = rc.withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    )
    return (
        rc.where(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 (adapted) — important stock. Original values partsupp holdings;
# adapted value = lineitem revenue per part for one region's
# suppliers, HAVING value above 1.5× the average part value (scale-free
# analogue of the original's sum(total)×fraction threshold). Keeps the
# group-by + uncorrelated scalar-subquery-threshold shape.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q11_adapted",
    """
    WITH pr AS (
      SELECT l_partkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY l_partkey)
    SELECT l_partkey, val FROM pr
    WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) FROM pr) * 1.5
    ORDER BY val DESC, l_partkey
    """,
)
def tpch_q11_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem")

    eur = sup.join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    pr = (
        li.join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("val"))
    )
    threshold = pr.agg(
        (F.sum("val").cast("double") / F.count("*")).alias("avg_val")
    )
    return (
        pr.join(F.broadcast(threshold))
        .where(F.col("val").cast("double") > F.col("avg_val") * 1.5)
        .select("l_partkey", "val")
        .orderBy(F.desc("val"), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 (adapted) — supplier counts by part attributes. Original walks
# partsupp and excludes complaint suppliers via NOT IN; adapted bridges
# through lineitem and excludes low-balance suppliers. Keeps
# distinct-count + NOT IN (rewritten to anti join — the reference's
# NULL_AWARE_LEFT_ANTI degenerates to plain anti on non-null keys,
# fe/.../analysis/JoinOperator.java).
# ---------------------------------------------------------------------------
@_register(
    "tpch_q16_adapted",
    """
    SELECT p_brand, p_type, p_size,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad_sup = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 1000.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(bad_sup, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 (adapted) — suppliers with significant volume of selected parts.
# Original checks partsupp availability vs half the shipped quantity;
# adapted keeps the nested IN (part-name filter) + GROUP BY/HAVING
# (quantity threshold) + outer IN shape on lineitem alone.
# ---------------------------------------------------------------------------
@_register(
    "tpch_q20_adapted",
    """
    SELECT s_name, s_acctbal FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
    ORDER BY s_name
    """,
)
def tpch_q20_adapted(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = load_table(spark, sf_dir, "supplier")
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "leftsemi")
        .groupBy("l_suppkey")
        .agg(F.sum(_d("l_quantity")).alias("qty"))
        .where(F.col("qty") > 150)
        .select("l_suppkey")
    )
    return (
        sup.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "leftsemi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
