"""Nested TPC-H — the reference's nested-collections workload
(`testdata/workloads/tpch_nested/`, schema
`testdata/datasets/tpch_nested/`: customers carry an `c_orders`
array<struct>, each order a nested `o_lineitems` array<struct>)
rebuilt from the driver's FLAT tables at query time.

The reference executes these with SubplanNode/UnnestNode row-at-a-time
re-evaluation (`be/src/exec/subplan-node.h:44-64`, `unnest-node.h`);
Spark's equivalents are (a) higher-order functions over the collected
arrays (aggregate/exists/transform — no row explosion at all) and
(b) LATERAL VIEW explode for correlated unnest. Both are exercised.

Fixture construction (`_nested_customers`): one orderkey shuffle to
nest lineitems into orders, one custkey shuffle to nest orders into
customers. Arrays are sort_array'd on the leading key so the nested
layout is deterministic regardless of shuffle merge order. At 100 TB
this build is the same two shuffles a flat join pipeline would pay,
after which every per-customer computation is shuffle-free (data is
co-located inside the row) — that is the point of the reference's
nested model.

Oracles run on the FLAT tables (DuckDB sees the same parquet): each
nested computation has a flat-relational equivalent, which is exactly
what makes these entries bit-checkable.

All money math uses decimal accumulators inside HOF folds — summing
DOUBLE array elements would be order-dependent; folding into
DECIMAL(18,2) is exact and order-free.
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


def _nested_customers(
    spark: SparkSession, sf_dir: str, with_lineitems: bool = False
) -> DataFrame:
    """customers with c_orders array<struct>; optionally each order
    carries its o_lineitems array<struct> (two-level nesting, the
    tpch_nested dataset shape). Customers without orders get an empty
    array (LEFT join + coalesce), matching the reference fixture."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    if with_lineitems:
        li = load_table(spark, sf_dir, "lineitem")
        li_nested = li.groupBy("l_orderkey").agg(
            F.sort_array(
                F.collect_list(
                    F.struct("l_linenumber", "l_quantity", "l_extendedprice",
                             "l_discount", "l_returnflag")
                )
            ).alias("o_lineitems")
        )
        orders = orders.join(
            li_nested,
            orders["o_orderkey"] == li_nested["l_orderkey"],
            "left",
        ).drop("l_orderkey")
        order_struct = F.struct(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
            F.coalesce(
                "o_lineitems", F.array().cast(
                    "array<struct<l_linenumber:int,l_quantity:double,"
                    "l_extendedprice:double,l_discount:double,"
                    "l_returnflag:string>>"
                )
            ).alias("o_lineitems"),
        )
    else:
        order_struct = F.struct(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority",
        )
    joined = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left"
    )
    return joined.groupBy(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    ).agg(
        F.sort_array(
            F.filter(
                F.collect_list(order_struct),
                lambda o: o["o_orderkey"].isNotNull(),
            )
        ).alias("c_orders")
    )


# ---------------------------------------------------------------------------
# Aggregate over the array (tpch_nested q1 family): no unnest at all
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_order_totals",
    """
    SELECT c.c_custkey, c.c_mktsegment,
      CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
      CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0)
        AS DECIMAL(38,2)) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    HAVING COUNT(o.o_orderkey) >= 8
    ORDER BY c_custkey
    """,
)
def nested_tpch_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tpch_nested q1-family: per-customer aggregate over the c_orders
    collection — the reference plans SubplanNode + UnnestNode +
    aggregate per outer row; here `size()` and an `aggregate` HOF fold
    compute it WITHOUT any row explosion (the array is local to the
    row). The fold accumulates into DECIMAL so the sum is exact and
    order-independent. Scale: after the nest build, this is a narrow
    map — no shuffle, no explode.
    Reference: testdata/workloads/tpch_nested/queries/q1.test;
    schema testdata/datasets/tpch_nested/."""
    nested = _nested_customers(spark, sf_dir)
    total = F.aggregate(
        "c_orders",
        F.lit(0).cast("decimal(18,2)"),
        # re-cast each step: decimal + grows precision, but the fold's
        # accumulator type is fixed at decimal(18,2)
        lambda acc, o: (
            acc + o["o_totalprice"].cast("decimal(12,2)")
        ).cast("decimal(18,2)"),
    )
    return (
        nested.select(
            "c_custkey", "c_mktsegment",
            F.size("c_orders").cast("bigint").alias("n_orders"),
            total.cast("decimal(38,2)").alias("total_spend"),
        )
        .where(F.col("n_orders") >= 8)
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Correlated UNNEST with outer refs (SubplanNode + SingularRowSrc)
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_unnest_urgent_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
      CAST(o.o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
      CAST(c.c_acctbal AS DECIMAL(12,2)) AS c_acctbal
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND year(o.o_orderdate) = 1998
    ORDER BY c_custkey, o_orderkey
    """,
)
def nested_tpch_unnest_urgent_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated UNNEST with outer references: explode c_orders and
    project BOTH outer customer columns and inner order fields — the
    reference's SubplanNode(SingularRowSrc ⋈ Unnest) pattern
    (subplan-node.h:44-64). Catalyst's Generate keeps outer columns
    without re-evaluation. Scale: explode is pipelined (no shuffle);
    the filter on the exploded struct prunes before projection.
    Reference: testdata/workloads/tpch_nested/ customer.c_orders."""
    nested = _nested_customers(spark, sf_dir)
    ex = nested.select(
        "c_custkey", "c_name", F.col("c_acctbal"),
        F.explode("c_orders").alias("o"),
    )
    return (
        ex.where(
            (F.col("o.o_orderpriority") == "1-URGENT")
            & (F.year("o.o_orderdate") == 1998)
        )
        .select(
            "c_custkey", "c_name",
            F.col("o.o_orderkey").alias("o_orderkey"),
            F.col("o.o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
            F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# Two-level nesting: fold over orders of folds over lineitems
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_two_level_max_order_qty",
    """
    WITH per_order AS (
      SELECT o.o_custkey, o.o_orderkey,
        CAST(COALESCE(SUM(CAST(l.l_quantity AS DECIMAL(12,2))), 0)
          AS DECIMAL(18,2)) AS order_qty
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_custkey, o.o_orderkey)
    SELECT c.c_custkey,
      CAST(COUNT(p.o_orderkey) AS BIGINT) AS n_orders,
      CAST(COALESCE(MAX(p.order_qty), 0) AS DECIMAL(38,2)) AS max_order_qty
    FROM customer c LEFT JOIN per_order p ON c.c_custkey = p.o_custkey
    GROUP BY c.c_custkey
    HAVING COALESCE(MAX(p.order_qty), 0) > 150
    ORDER BY c_custkey
    """,
)
def nested_tpch_two_level_max_order_qty(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-level nested aggregate (tpch_nested's signature shape): for
    each customer, the max over their orders of the sum over that
    order's lineitems of quantity — the reference nests one subplan
    inside another. Here: a `transform` computes each order's decimal
    lineitem fold, then `array_max` folds the outer level; both levels
    run inside the row with zero explosion and zero extra shuffles
    beyond the fixture build.
    Reference: testdata/datasets/tpch_nested/ (orders.o_lineitems)."""
    nested = _nested_customers(spark, sf_dir, with_lineitems=True)
    per_order_qty = F.transform(
        "c_orders",
        lambda o: F.aggregate(
            o["o_lineitems"],
            F.lit(0).cast("decimal(18,2)"),
            lambda acc, l: (
                acc + l["l_quantity"].cast("decimal(12,2)")
            ).cast("decimal(18,2)"),
        ),
    )
    out = nested.select(
        "c_custkey",
        F.size("c_orders").cast("bigint").alias("n_orders"),
        F.coalesce(
            F.array_max(per_order_qty), F.lit(0).cast("decimal(18,2)")
        ).cast("decimal(38,2)").alias("max_order_qty"),
    )
    return out.where(F.col("max_order_qty") > 150).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# EXISTS over the collection (IsNotEmptyPredicate + filtered unnest)
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_exists_urgent_by_segment",
    """
    SELECT c.c_mktsegment,
      CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def nested_tpch_exists_urgent_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXISTS over a nested collection: the reference guards subplans
    with IsNotEmptyPredicate (`be/src/exprs/is-not-empty-predicate.h`)
    and evaluates the correlated filter per outer row; here the
    `exists()` HOF evaluates the predicate inside the row — no join,
    no explosion, then a segment-level count. Scale: narrow map +
    one |segments|-key shuffle.
    Reference: testdata/workloads/tpch_nested/queries (EXISTS forms)."""
    nested = _nested_customers(spark, sf_dir)
    has_urgent = F.exists(
        "c_orders", lambda o: o["o_orderpriority"] == "1-URGENT"
    )
    return (
        nested.where(has_urgent)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# In-row top-k: slice the sorted collection (TopN inside the subplan)
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_top2_orders_per_customer",
    """
    SELECT c_custkey, o_orderkey,
      CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice
    FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY c.c_custkey
          ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey) t
    WHERE rn <= 2
    ORDER BY c_custkey, o_totalprice DESC, o_orderkey
    """,
)
def nested_tpch_top2_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-N inside the collection: each customer's two most expensive
    orders, computed by sorting the c_orders array IN THE ROW
    (sort_array over a reordered struct) and slicing — the reference
    plans a TopNNode inside the subplan; the flat-relational
    equivalent is a row_number window (the oracle). Zero shuffles
    after the fixture build and zero window exchanges — the per-group
    top-k never leaves the row. The sort key embeds (-price, orderkey)
    so ties break identically in both engines.
    Reference: testdata/workloads/tpch_nested/ (order ranking)."""
    nested = _nested_customers(spark, sf_dir)
    rekeyed = F.expr(
        "slice(sort_array(transform(c_orders, o -> struct("
        "  -cast(o.o_totalprice as decimal(12,2)) AS negprice,"
        "  o.o_orderkey AS o_orderkey,"
        "  cast(o.o_totalprice as decimal(12,2)) AS o_totalprice))), 1, 2)"
    )
    ex = nested.select(
        "c_custkey", F.explode(rekeyed).alias("t")
    )
    return ex.select(
        "c_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        F.col("t.o_totalprice").alias("o_totalprice"),
    ).orderBy("c_custkey", F.desc("o_totalprice"), "o_orderkey")


# ---------------------------------------------------------------------------
# Filtered fold: aggregate only matching collection elements
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_urgent_spend_share",
    """
    SELECT c.c_custkey,
      CAST(COALESCE(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
        THEN CAST(o.o_totalprice AS DECIMAL(12,2)) END), 0)
        AS DECIMAL(38,2)) AS urgent_spend,
      CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0)
        AS DECIMAL(38,2)) AS total_spend
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    HAVING SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
      THEN CAST(o.o_totalprice AS DECIMAL(12,2)) END) > 0
    ORDER BY c_custkey
    """,
)
def nested_tpch_urgent_spend_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Filtered fold over the collection: urgent-priority spend next
    to total spend per customer — the reference evaluates the
    priority conjunct inside the subplan's unnest; here `filter()`
    prunes the array before the decimal fold, all inside the row.
    Customers without orders drop via the urgent>0 guard (matching
    the oracle's inner-join HAVING). Scale: narrow map after the nest
    build; no explosion.
    Reference: testdata/workloads/tpch_nested/ (filtered collection
    aggregates)."""
    nested = _nested_customers(spark, sf_dir)

    def fold(arr):
        return F.aggregate(
            arr,
            F.lit(0).cast("decimal(18,2)"),
            lambda acc, o: (
                acc + o["o_totalprice"].cast("decimal(12,2)")
            ).cast("decimal(18,2)"),
        )

    urgent = fold(
        F.filter("c_orders", lambda o: o["o_orderpriority"] == "1-URGENT")
    )
    total = fold(F.col("c_orders"))
    return (
        nested.select(
            "c_custkey",
            urgent.cast("decimal(38,2)").alias("urgent_spend"),
            total.cast("decimal(38,2)").alias("total_spend"),
        )
        .where(F.col("urgent_spend") > 0)
        .orderBy("c_custkey")
    )
