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

from pyspark.errors.exceptions.base import (
    PySparkException as _PYSPARK_ERR,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from incubator_impala_spark.sources.tables import load_table

# The nested dataset is a STORED table in the reference (tpch_nested_
# parquet, written once at load time); building it per query would
# charge every nested query two extra shuffles the reference never
# pays. The derived table is therefore materialized to parquet on
# first use (keyed by source dir + mtime so a regenerated fixture
# invalidates) and scanned thereafter — the same lifecycle as the
# reference's loaded table, and the 100 TB story: nested data is
# written once by ETL, not rebuilt per query.
_NESTED_CACHE_ROOT = "/tmp/spark_graft_nested"


def _materialized(spark: SparkSession, sf_dir: str, tag: str,
                  build) -> DataFrame:
    import hashlib
    import os

    try:
        src = os.path.join(sf_dir, "customer.parquet")
        key = hashlib.md5(
            f"{os.path.abspath(sf_dir)}:{os.path.getmtime(src)}"
            .encode()).hexdigest()[:12]
    except OSError:
        return build()
    path = os.path.join(_NESTED_CACHE_ROOT, f"{tag}_{key}")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        try:
            return spark.read.parquet(path)
        except (_PYSPARK_ERR, OSError):  # stale/corrupt cache
            pass
    df = build()
    try:
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)
    except (_PYSPARK_ERR, OSError):  # unwritable cache dir
        return df

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
    spark: SparkSession, sf_dir: str, with_lineitems: bool = False,
    wide: bool = False,
) -> DataFrame:
    """customers with c_orders array<struct>; optionally each order
    carries its o_lineitems array<struct> (two-level nesting, the
    tpch_nested dataset shape). ``wide`` adds the partkey/suppkey/
    shipdate/linestatus fields the q3/q4/q12/q14/q19/q21 shapes walk.
    Customers without orders get an empty array (LEFT join +
    coalesce), matching the reference fixture. Materialized once per
    (sf_dir, shape) — see _materialized."""
    tag = ("customers_wide" if wide
           else "customers_li" if with_lineitems else "customers")
    return _materialized(
        spark, sf_dir, tag,
        lambda: _build_nested_customers(spark, sf_dir, with_lineitems,
                                        wide))


def _build_nested_customers(
    spark: SparkSession, sf_dir: str, with_lineitems: bool = False,
    wide: bool = False,
) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    if with_lineitems or wide:
        li_fields = ["l_linenumber", "l_quantity", "l_extendedprice",
                     "l_discount", "l_returnflag"]
        empty_t = ("array<struct<l_linenumber:int,l_quantity:double,"
                   "l_extendedprice:double,l_discount:double,"
                   "l_returnflag:string>>")
        if wide:
            li_fields += ["l_partkey", "l_suppkey", "l_shipdate",
                          "l_linestatus"]
            empty_t = empty_t[:-2] + (",l_partkey:bigint,l_suppkey:bigint,"
                                      "l_shipdate:timestamp,"
                                      "l_linestatus:string>>")
        li = load_table(spark, sf_dir, "lineitem")
        li_nested = li.groupBy("l_orderkey").agg(
            F.sort_array(
                F.collect_list(F.struct(*li_fields))
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
                "o_lineitems", F.array().cast(empty_t)
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


# ---------------------------------------------------------------------------
# Supplier-side nesting (tpch_nested q2 / q9 / q20 family)
#
# The reference's nested schema also nests partsupp under supplier
# (supplier.s_partsupps) and nation under region (region.r_nations) —
# tpch_nested-q2.test reads `from supplier s, s.s_partsupps ps, ...
# region r, r.r_nations n`. The driver's flat tables carry no partsupp,
# so ps_supplycost / ps_availqty are DERIVED deterministically from the
# (l_partkey, l_suppkey) pairs present in lineitem with the same
# integer formula in Spark and in the DuckDB oracle — both engines see
# the identical synthetic partsupp relation, keeping the entries
# bit-checkable. Costs are integer-valued decimals (no division).
# ---------------------------------------------------------------------------

_PS_COST = "CAST((({pk} * 7 + {sk} * 13) % 10000) + 100 AS DECIMAL(12,2))"
_PS_AVAIL = "CAST((({pk} * 5 + {sk} * 11) % 9999) + 1 AS INT)"

_PS_FLAT_CTE = f"""
    partsupp AS (
      SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        {_PS_COST.format(pk='l_partkey', sk='l_suppkey')} AS ps_supplycost,
        {_PS_AVAIL.format(pk='l_partkey', sk='l_suppkey')} AS ps_availqty
      FROM lineitem)
"""


def _nested_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier rows carrying an s_partsupps array<struct> — the
    tpch_nested supplier shape. One shuffle on suppkey to collect the
    derived partsupp rows; sort_array makes the layout deterministic.
    Materialized once per sf_dir — see _materialized."""
    return _materialized(spark, sf_dir, "suppliers",
                         lambda: _build_nested_suppliers(spark, sf_dir))


def _build_nested_suppliers(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.select("l_partkey", "l_suppkey").distinct()
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
            F.expr(_PS_COST.format(pk="l_partkey", sk="l_suppkey"))
            .alias("ps_supplycost"),
            F.expr(_PS_AVAIL.format(pk="l_partkey", sk="l_suppkey"))
            .alias("ps_availqty"),
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    nested = ps.groupBy(F.col("ps_suppkey").alias("k")).agg(
        F.sort_array(
            F.collect_list(
                F.struct("ps_partkey", "ps_supplycost", "ps_availqty"))
        ).alias("s_partsupps"))
    return supp.join(nested, supp["s_suppkey"] == nested["k"], "left").drop("k")


def _nested_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region rows carrying r_nations array<struct> (tpch_nested
    region shape); broadcast-size at any SF (25 nations, 5 regions)."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nested = nation.groupBy(F.col("n_regionkey").alias("k")).agg(
        F.sort_array(
            F.collect_list(F.struct("n_nationkey", "n_name"))
        ).alias("r_nations"))
    return region.join(nested, region["r_regionkey"] == nested["k"],
                       "left").drop("k")


@_register(
    "nested_tpch_q2_min_cost_supplier",
    f"""
    WITH {_PS_FLAT_CTE}
    SELECT CAST(s.s_acctbal AS DECIMAL(12,2)) AS s_acctbal, s.s_name,
      n.n_name, p.p_partkey, p.p_brand
    FROM supplier s
    JOIN partsupp ps ON s.s_suppkey = ps.ps_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND p.p_type LIKE '%BRASS'
      AND r.r_name = 'EUROPE'
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.ps_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def nested_tpch_q2_min_cost_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q2 (minimum-cost supplier): `from supplier s,
    s.s_partsupps ps, part, region r, r.r_nations n` with a correlated
    MIN over the same nested path. Spark translation: explode the
    nested supplier's s_partsupps (the UnnestNode), broadcast-join the
    nested region's exploded r_nations (dims stay tiny at any SF), and
    replace the correlated scalar subquery with a min-over-window
    partitioned by p_partkey — one pass, no re-scan of the nested
    column per outer row (the reference re-evaluates the subplan per
    row; a window is the set-based equivalent).
    Reference: testdata/workloads/tpch_nested/queries/tpch_nested-q2.test.
    """
    from pyspark.sql import Window

    supp = _nested_suppliers(spark, sf_dir)
    reg = _nested_regions(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")

    nations = reg.where(F.col("r_name") == "EUROPE").select(
        F.explode("r_nations").alias("n"))
    nations = nations.select(F.col("n.n_nationkey").alias("n_nationkey"),
                             F.col("n.n_name").alias("n_name"))
    sp = supp.select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal",
        F.explode("s_partsupps").alias("ps"))
    sp = sp.join(F.broadcast(nations),
                 sp["s_nationkey"] == nations["n_nationkey"])
    eligible = sp.select(
        "s_name", F.col("s_acctbal").cast("decimal(12,2)").alias("s_acctbal"),
        "n_name", F.col("ps.ps_partkey").alias("ps_partkey"),
        F.col("ps.ps_supplycost").alias("ps_supplycost"))
    w = Window.partitionBy("ps_partkey")
    best = eligible.withColumn("min_cost", F.min("ps_supplycost").over(w))
    part_f = part.where(
        (F.col("p_size") == 15) & F.col("p_type").like("%BRASS"))
    return (
        best.where(F.col("ps_supplycost") == F.col("min_cost"))
        .join(part_f, F.col("ps_partkey") == part_f["p_partkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def _q9_joined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q9 nested walk's joined relation (shared with the masked
    variant). TPC-H Q9's COLOR parameter is '%blue%' here: the
    validation default 'green' matches ZERO parts in the synthetic
    driver corpus, so the benched sf0.1 legs measured a
    filtered-empty pipeline (r9 verdict); 'blue' is a dbgen color
    word present in BOTH corpora, and the recorded-answer corpus
    still runs the reference's green text through the dialect. The
    part filter prunes BOTH fact sides before
    the composite-key join — the reference's runtime filter from the
    part build reaches the lineitem AND partsupp scans (HdfsScanNode
    runtime filters); without it AQE broadcast-built the full
    800k-row exploded partsupp and all of orders, a single-threaded
    hash build that dominated the sf1 probe (SCALE.md r9:
    4.76x -> ~2x). orders projects to its two used columns so the
    build side stays key+date sized at any SF."""
    supp = _nested_suppliers(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    sp = supp.select(
        "s_suppkey", "s_nationkey", F.explode("s_partsupps").alias("ps")
    ).select(
        "s_suppkey", "s_nationkey",
        F.col("ps.ps_partkey").alias("ps_partkey"),
        F.col("ps.ps_supplycost").alias("ps_supplycost"))
    # ONE broadcast green-key set feeds both joins (identical plan
    # subtree -> ReusedExchange, one part scan); SHUFFLE_HASH for
    # orders: its columnar size estimate sits under the broadcast
    # threshold, but a 1.5M-row broadcast is a single-threaded hash
    # build (~2s at sf1) — and at 100 TB orders could never
    # broadcast; per-partition parallel hash builds are the plan
    # that survives the scale-up
    green = F.broadcast(
        part.where(F.col("p_name").like("%blue%")).select("p_partkey"))
    li_f = li.join(green, li["l_partkey"] == green["p_partkey"]) \
        .drop("p_partkey")
    sp_f = sp.join(green, F.col("ps_partkey") == green["p_partkey"]) \
        .drop("p_partkey")
    # sp_f also takes SHUFFLE_HASH (not an explicit broadcast): the
    # green-filtered partsupp side is ~150x smaller than lineitem but
    # grows with SF — a forced broadcast would OOM a 100 TB run,
    # while AQE still localizes the small side at benched SFs
    return (
        li_f.join(sp_f.hint("shuffle_hash"),
                  (li_f["l_partkey"] == sp_f["ps_partkey"])
                  & (li_f["l_suppkey"] == sp_f["s_suppkey"]))
        .join(orders.select("o_orderkey", "o_orderdate")
              .hint("shuffle_hash"),
              li_f["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(nation),
              sp_f["s_nationkey"] == nation["n_nationkey"])
    )


@_register(
    "nested_tpch_q9_profit_by_nation_year",
    f"""
    WITH {_PS_FLAT_CTE}
    SELECT n.n_name AS nation, year(CAST(o.o_orderdate AS DATE)) AS o_year,
      CAST(SUM(
        CAST(l.l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
        - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(12,2))
      ) AS DECIMAL(38,4)) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%blue%'
    GROUP BY n.n_name, year(CAST(o.o_orderdate AS DATE))
    ORDER BY nation, o_year DESC
    """,
)
def nested_tpch_q9_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q9 (product-type profit): the nested walk is
    supplier -> s_partsupps -> lineitem; profit per (nation, year).
    Spark: explode the nested supplier once, join lineitem on the
    composite (partkey, suppkey) — one shuffle each side; part and
    nation broadcast. All money math is decimal (exact, order-free);
    the derived ps_supplycost is integer-valued decimal so the profit
    expression carries scale 4 in both engines.
    Reference: testdata/workloads/tpch_nested/queries/tpch_nested-q9.test
    (and the masked variant masked-tpch_nested-q9.test)."""
    d = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    joined = _q9_joined(spark, sf_dir)
    profit = (
        d("l_extendedprice") * (F.lit(1) - d("l_discount"))
        - F.col("ps_supplycost") * d("l_quantity"))
    return (
        joined.groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(F.sum(profit).cast("decimal(38,4)").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@_register(
    "nested_tpch_q20_excess_stock_suppliers",
    f"""
    WITH {_PS_FLAT_CTE},
    shipped AS (
      SELECT l_partkey, l_suppkey,
        SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_1994
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1994-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1995-01-01'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s.s_name, n.n_name
    FROM supplier s
    JOIN partsupp ps ON ps.ps_suppkey = s.s_suppkey
    JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                   AND sh.l_suppkey = ps.ps_suppkey
    JOIN part p ON p.p_partkey = ps.ps_partkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE 'forest%'
      AND CAST(ps.ps_availqty AS DECIMAL(12,2)) > sh.qty_1994 * 0.5
    ORDER BY s_name, n_name
    """,
)
def nested_tpch_q20_excess_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q20 (potential part promotion): suppliers whose
    nested s_partsupps hold more stock of 'forest%' parts than half of
    what they shipped in 1994. Spark: the shipped-quantity aggregate
    shuffles once on (partkey, suppkey) and joins the exploded nested
    supplier on the same composite key — Spark reuses the hash
    partitioning across both. The quantity compare cross-multiplies
    nothing: availqty is integer, qty decimal, `avail > qty * 0.5` is
    exact decimal math in both engines.
    Reference: testdata/workloads/tpch_nested/queries/tpch_nested-q20.test
    (and masked-tpch_nested-q20.test)."""
    supp = _nested_suppliers(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    shipped = (
        li.where((F.col("l_shipdate").cast("date") >= F.lit("1994-01-01"))
                 & (F.col("l_shipdate").cast("date") < F.lit("1995-01-01")))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)"))
             .alias("qty_1994")))
    sp = supp.select(
        "s_suppkey", "s_name", "s_nationkey",
        F.explode("s_partsupps").alias("ps")
    ).select(
        "s_suppkey", "s_name", "s_nationkey",
        F.col("ps.ps_partkey").alias("ps_partkey"),
        F.col("ps.ps_availqty").alias("ps_availqty"))
    return (
        sp.join(shipped, (sp["ps_partkey"] == shipped["l_partkey"])
                & (sp["s_suppkey"] == shipped["l_suppkey"]))
        .join(F.broadcast(part.where(F.col("p_name").like("forest%"))),
              sp["ps_partkey"] == F.col("p_partkey"))
        .join(F.broadcast(nation),
              sp["s_nationkey"] == nation["n_nationkey"])
        .where(F.col("ps_availqty").cast("decimal(12,2)")
               > F.col("qty_1994") * F.lit(0.5).cast("decimal(2,1)"))
        .select("s_name", "n_name").distinct()
        .orderBy("s_name", "n_name")
    )


@_register(
    "nested_tpch_region_nation_rollup",
    """
    SELECT r.r_name, n.n_name,
      CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
      CAST(COALESCE(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))), 0)
        AS DECIMAL(38,2)) AS total_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r_name, n_name
    """,
)
def nested_tpch_region_nation_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested region.r_nations walk (`from region r, r.r_nations
    n` in tpch_nested-q2/q5/q8): customers per (region, nation) through
    the nested dimension. The nested region relation is 5 rows at ANY
    scale factor — explode it and broadcast; the only shuffle is the
    customer-side aggregate. Reference: testdata/datasets README
    (nested region schema), tpch_nested-q5.test plan shape."""
    reg = _nested_regions(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    nations = reg.select(
        "r_name", F.explode("r_nations").alias("n")
    ).select("r_name", F.col("n.n_nationkey").alias("n_nationkey"),
             F.col("n.n_name").alias("n_name"))
    return (
        cust.join(F.broadcast(nations),
                  cust["c_nationkey"] == nations["n_nationkey"], "right")
        .groupBy("r_name", "n_name")
        .agg(F.count("c_custkey").cast("bigint").alias("n_customers"),
             F.coalesce(
                 F.sum(F.col("c_acctbal").cast("decimal(12,2)")),
                 F.lit(0).cast("decimal(12,2)"))
             .cast("decimal(38,2)").alias("total_acctbal"))
        .orderBy("r_name", "n_name")
    )


@_register(
    "nested_tpch_outer_ref_filter",
    """
    SELECT c.c_custkey, c.c_acctbal,
      CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_big_orders,
      CAST(MAX(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DECIMAL(12,2))
        AS max_big_order
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE CAST(o.o_totalprice AS DECIMAL(12,2))
          > CAST(c.c_acctbal AS DECIMAL(12,2)) * 20
    GROUP BY c.c_custkey, c.c_acctbal
    ORDER BY c_custkey
    """,
)
def nested_tpch_outer_ref_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nested-within-nested filtering with OUTER references — the q2
    signature shape the round-4 review called out: the collection
    predicate refers to the enclosing row (orders whose totalprice
    exceeds 20x the customer's own acctbal). The reference evaluates
    this as a SubplanNode re-running the filter per outer row; in
    Spark the outer column is simply in scope inside the lambda —
    `filter(c_orders, o -> o.o_totalprice > c_acctbal * 20)` — zero
    explosion, zero shuffle after the nest build, and the oracle is a
    plain correlated join. c_acctbal is cast to decimal inside the
    lambda so both engines compare exact decimals."""
    nested = _nested_customers(spark, sf_dir)
    big = F.filter(
        "c_orders",
        lambda o: o["o_totalprice"].cast("decimal(12,2)")
        > F.col("c_acctbal").cast("decimal(12,2)") * 20)
    out = nested.select(
        "c_custkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal_d"),
        big.alias("big"))
    return (
        out.where(F.size("big") > 0)
        .select(
            "c_custkey",
            F.col("c_acctbal_d").alias("c_acctbal"),
            F.size("big").cast("bigint").alias("n_big_orders"),
            F.aggregate(
                "big", F.lit(None).cast("decimal(12,2)"),
                lambda acc, o: F.greatest(
                    acc, o["o_totalprice"].cast("decimal(12,2)")))
            .alias("max_big_order"))
        .orderBy("c_custkey")
    )


@_register(
    "nested_tpch_q18_large_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
      CAST(o.o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
      CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2))
        AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(12,2))) > 250
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def nested_tpch_q18_large_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q18 (large-volume customer): orders whose nested
    o_lineitems quantities sum past a threshold. Two-level walk: the
    inner aggregate is a decimal HOF fold per order (no explode, no
    per-order shuffle — the reference runs a SubplanNode aggregate per
    outer row), then the surviving orders unnest. Only orders passing
    the threshold are exploded, so the Generate output is the RESULT
    cardinality, not |lineitem|.
    Reference: testdata/workloads/tpch_nested/queries/
    tpch_nested-q18.test (and masked-tpch_nested-q18.test)."""
    nested = _nested_customers(spark, sf_dir, with_lineitems=True)
    qty = lambda o: F.aggregate(  # noqa: E731
        o["o_lineitems"], F.lit(0).cast("decimal(18,2)"),
        lambda acc, l: (acc + l["l_quantity"].cast("decimal(12,2)"))
        .cast("decimal(18,2)"))
    big = nested.select(
        "c_custkey", "c_name",
        F.explode(
            F.filter("c_orders", lambda o: qty(o) > 250)).alias("o"))
    return (
        big.select(
            "c_custkey", "c_name",
            F.col("o.o_orderkey").alias("o_orderkey"),
            F.col("o.o_totalprice").cast("decimal(12,2)")
            .alias("o_totalprice"),
            qty(F.col("o")).cast("decimal(38,2)").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@_register(
    "nested_tpch_q13_order_count_distribution",
    """
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        AND o.o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c.c_custkey) t
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def nested_tpch_q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q13 (customer distribution): histogram of
    per-customer order counts, counting only orders passing a filter.
    On the nested layout the per-customer count is `size(filter(...))`
    — a pure projection (the flat oracle needs a join + two
    aggregates; the nested plan needs ONE aggregate over 150k rows/SF,
    which is the reference's argument for nesting the fact).
    Reference: testdata/workloads/tpch_nested/queries/
    tpch_nested-q13.test."""
    nested = _nested_customers(spark, sf_dir)
    per_cust = nested.select(
        F.size(F.filter(
            "c_orders",
            lambda o: o["o_orderpriority"] != "4-NOT SPECIFIED"))
        .cast("bigint").alias("n_orders"))
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


@_register(
    "nested_tpch_q9_masked",
    f"""
    WITH {_PS_FLAT_CTE}
    SELECT
      CASE WHEN n.n_name IN ('FRANCE', 'GERMANY') THEN n.n_name
           ELSE regexp_replace(n.n_name, '[A-Z]', 'X', 'g') END AS nation,
      year(CAST(o.o_orderdate AS DATE)) AS o_year,
      CAST(SUM(
        CAST(l.l_extendedprice AS DECIMAL(12,2))
          * (1 - CAST(l.l_discount AS DECIMAL(12,2)))
        - ps.ps_supplycost * CAST(l.l_quantity AS DECIMAL(12,2))
      ) AS DECIMAL(38,4)) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%blue%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def nested_tpch_q9_masked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's masked-tpch_nested-q9.test variant: identical
    nested q9 walk but with a column-masking policy applied to the
    grouping column (nations outside an allowlist render masked — the
    reference tests Ranger column masks over nested queries this way;
    mask semantics per the masking family in functions/registry.py).
    The mask is applied BEFORE the aggregate, so masked nations
    collapse into shared groups — same contract as a real column-mask
    policy, and the plan is the q9 plan with one extra projection.
    Reference: testdata/workloads/tpch_nested/queries/
    masked-tpch_nested-q9.test."""
    # the mask is applied inside the aggregate (not post-hoc): a mask
    # policy must collapse masked nations into shared groups
    d = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    joined = _q9_joined(spark, sf_dir)
    masked = F.when(
        F.col("n_name").isin("FRANCE", "GERMANY"), F.col("n_name")
    ).otherwise(F.regexp_replace("n_name", "[A-Z]", "X"))
    profit = (
        d("l_extendedprice") * (F.lit(1) - d("l_discount"))
        - F.col("ps_supplycost") * d("l_quantity"))
    return (
        joined.groupBy(
            masked.alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"))
        .agg(F.sum(profit).cast("decimal(38,4)").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Round-5 breadth: the remaining tpch_nested query families (q3/q4/q6/
# q12/q14/q19/q21/q22 shapes), adapted to the driver tables' columns
# (no commitdate/receiptdate/shipmode/phone in this dataset — late
# shipping and nation-key groupings stand in, as with *_adapted).
# ---------------------------------------------------------------------------


@_register(
    "nested_tpch_q3_shipping_priority",
    """
    SELECT o.o_orderkey, o.o_orderdate,
      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2))))
           AS DECIMAL(38,4)) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def nested_tpch_q3_shipping_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q3 (shipping priority): outer filter on the
    customer, unnest to orders, and a FILTERED decimal fold over each
    order's o_lineitems (ship date after the cutoff) — the lineitem
    'join' never leaves the row. Orders with no qualifying lineitem
    drop via the size() guard, mirroring the flat inner join. Scale:
    one explode (pipelined), no lineitem shuffle after the nest build.
    Reference: tpch_nested-q3.test."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    cutoff = F.lit("1995-03-15").cast("date")
    ex = (
        nested.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.explode("c_orders").alias("o"))
        .where(F.col("o.o_orderdate").cast("date") < cutoff)
    )
    shipped = F.filter(
        F.col("o.o_lineitems"),
        lambda l: l["l_shipdate"].cast("date") > cutoff)
    revenue = F.aggregate(
        shipped,
        F.lit(0).cast("decimal(18,4)"),
        lambda acc, l: (
            acc + l["l_extendedprice"].cast("decimal(12,2)")
            * (F.lit(1) - l["l_discount"].cast("decimal(12,2)"))
        ).cast("decimal(18,4)"),
    )
    return (
        ex.select(
            F.col("o.o_orderkey").alias("o_orderkey"),
            F.col("o.o_orderdate").alias("o_orderdate"),
            F.size(shipped).alias("nq"),
            revenue.cast("decimal(38,4)").alias("revenue"),
        )
        .where(F.col("nq") > 0)
        .drop("nq")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@_register(
    "nested_tpch_q4_exists_late_ship",
    """
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE)
              > CAST(o.o_orderdate AS DATE) + INTERVAL 80 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def nested_tpch_q4_exists_late_ship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q4 (order priority checking): the correlated EXISTS
    over lineitems becomes an exists() HOF over the order's own
    o_lineitems array with an OUTER reference (o_orderdate) inside the
    lambda — the reference's SubplanNode re-evaluation, with zero join
    and zero explosion of the lineitem side. Scale: explode orders
    only; the per-order existence test is row-local.
    Reference: tpch_nested-q4.test (commitdate<receiptdate adapted to
    late shipping: shipdate > orderdate + 80 days)."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    ex = (
        nested.select(F.explode("c_orders").alias("o"))
        .where(
            (F.col("o.o_orderdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("o.o_orderdate").cast("date") < F.lit("1996-07-01")))
    )
    late = F.exists(
        F.col("o.o_lineitems"),
        lambda l: l["l_shipdate"].cast("date")
        > F.date_add(F.col("o.o_orderdate").cast("date"), 80),
    )
    return (
        ex.where(late)
        .groupBy(F.col("o.o_orderpriority").alias("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "nested_tpch_q6_revenue_fold",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * CAST(l.l_discount AS DECIMAL(12,2)))
           AS DECIMAL(38,4)) AS revenue
    FROM lineitem l
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1995-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-01-01'
      AND CAST(l.l_discount AS DECIMAL(12,2))
          BETWEEN CAST(0.05 AS DECIMAL(12,2)) AND CAST(0.07 AS DECIMAL(12,2))
      AND l.l_quantity < 24
    """,
)
def nested_tpch_q6_revenue_fold(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q6 (forecasting revenue change) as a TWO-LEVEL fold:
    sum over customers of sum over orders of the filtered lineitem
    fold — no explode at any level; one final global aggregate. The
    flat plan would scan lineitem directly; the nested walk shows the
    collection layout loses nothing for full-scan aggregates. All
    accumulation is decimal (exact, order-free).
    Reference: tpch_nested-q6.test."""
    nested = _nested_customers(spark, sf_dir, wide=True)

    def li_ok(l):
        d = l["l_discount"].cast("decimal(12,2)")
        return (
            (l["l_shipdate"].cast("date") >= F.lit("1995-01-01"))
            & (l["l_shipdate"].cast("date") < F.lit("1996-01-01"))
            & (d >= F.lit(0.05).cast("decimal(12,2)"))
            & (d <= F.lit(0.07).cast("decimal(12,2)"))
            & (l["l_quantity"] < 24)
        )

    per_customer = F.aggregate(
        "c_orders",
        F.lit(0).cast("decimal(18,4)"),
        lambda acc, o: (
            acc + F.aggregate(
                F.filter(o["o_lineitems"], li_ok),
                F.lit(0).cast("decimal(18,4)"),
                lambda a2, l: (
                    a2 + l["l_extendedprice"].cast("decimal(12,2)")
                    * l["l_discount"].cast("decimal(12,2)")
                ).cast("decimal(18,4)"),
            )
        ).cast("decimal(18,4)"),
    )
    return nested.select(per_customer.alias("cust_rev")).agg(
        F.sum("cust_rev").cast("decimal(38,4)").alias("revenue"))


@_register(
    "nested_tpch_q12_priority_by_linestatus",
    """
    SELECT l.l_linestatus,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l_linestatus
    """,
)
def nested_tpch_q12_priority_by_linestatus(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q12 (shipping modes -> linestatus adapted): the
    orders⋈lineitem join is already materialized inside the row, so
    the only work is a double explode and a grouped CASE count — the
    priority column comes from the OUTER struct while the group key
    comes from the inner one, the cross-level projection SubplanNode
    exists for. Scale: explodes are pipelined; one final shuffle on
    the 2-value group key.
    Reference: tpch_nested-q12.test."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    ex = (
        nested.select(F.explode("c_orders").alias("o"))
        .select("o.o_orderpriority", F.explode("o.o_lineitems").alias("l"))
        .where(
            (F.col("l.l_shipdate").cast("date") >= F.lit("1996-01-01"))
            & (F.col("l.l_shipdate").cast("date") < F.lit("1997-01-01")))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        ex.groupBy(F.col("l.l_linestatus").alias("l_linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint").alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@_register(
    "nested_tpch_q14_promo_revenue_share",
    """
    SELECT CAST(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
        THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l.l_discount AS DECIMAL(12,2))) ELSE 0 END)
        AS DOUBLE)
      / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
      AS promo_revenue_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1995-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1995-10-01'
    """,
)
def nested_tpch_q14_promo_revenue_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q14 (promotion effect): the nested walk explodes
    down to lineitems (l_partkey now lives in the inner struct), then
    broadcast-joins part — the one join the collection layout cannot
    absorb, exactly as the reference's plan does it. The percentage is
    a single double division of exact decimal sums (the repo-wide
    bit-determinism convention). Scale: part is the broadcast side;
    lineitems stream through one pipelined explode chain.
    Reference: tpch_nested-q14.test."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    part = load_table(spark, sf_dir, "part")
    ex = (
        nested.select(F.explode("c_orders").alias("o"))
        .select(F.explode("o.o_lineitems").alias("l"))
        .where(
            (F.col("l.l_shipdate").cast("date") >= F.lit("1995-09-01"))
            & (F.col("l.l_shipdate").cast("date") < F.lit("1995-10-01")))
        .join(F.broadcast(part),
              F.col("l.l_partkey") == F.col("p_partkey"))
    )
    rev = (
        F.col("l.l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l.l_discount").cast("decimal(12,2)")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(16,4)"))
    return ex.agg(
        (F.lit(100.0) * F.sum(promo).cast("double")
         / F.sum(rev).cast("double")).alias("promo_revenue_pct"))


@_register(
    "nested_tpch_q19_disjunctive_bands",
    """
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(12,2))))
           AS DECIMAL(38,4)) AS revenue,
      CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def nested_tpch_q19_disjunctive_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q19 (discounted revenue, disjunctive predicate):
    three OR-arms pairing part attributes with lineitem quantity
    bands. The quantity half of each arm is pushed INTO the array
    filter (row-local, before the explode emits anything); the part
    half lands on the broadcast join — the split the reference's
    planner performs when it pushes conjuncts into the unnest.
    Reference: tpch_nested-q19.test (container literals adapted to
    p_size bands present in this dataset)."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    part = load_table(spark, sf_dir, "part")
    qty_any = F.filter(
        F.col("o.o_lineitems"),
        lambda l: (l["l_quantity"] >= 1) & (l["l_quantity"] <= 30))
    ex = (
        nested.select(F.explode("c_orders").alias("o"))
        .select(F.explode(qty_any).alias("l"))
        .join(F.broadcast(part),
              F.col("l.l_partkey") == F.col("p_partkey"))
    )
    q = F.col("l.l_quantity")
    arm = (
        ((F.col("p_brand") == "Brand#12") & q.between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & q.between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & q.between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    rev = (
        F.col("l.l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l.l_discount").cast("decimal(12,2)")))
    return ex.where(arm).agg(
        F.sum(rev).cast("decimal(38,4)").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


@_register(
    "nested_tpch_q21_multi_supplier_late",
    """
    WITH order_supp AS (
      SELECT o.o_orderkey, o.o_orderdate, l.l_suppkey,
        MAX(CASE WHEN CAST(l.l_shipdate AS DATE)
                 > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY
            THEN 1 ELSE 0 END) AS is_late
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate, l.l_suppkey)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM order_supp me
    JOIN supplier s ON s.s_suppkey = me.l_suppkey
    WHERE me.is_late = 1
      AND EXISTS (SELECT 1 FROM order_supp o2
                  WHERE o2.o_orderkey = me.o_orderkey
                    AND o2.l_suppkey <> me.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM order_supp o3
                      WHERE o3.o_orderkey = me.o_orderkey
                        AND o3.l_suppkey <> me.l_suppkey
                        AND o3.is_late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def nested_tpch_q21_multi_supplier_late(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q21 (suppliers who kept orders waiting): the
    EXISTS / NOT EXISTS pair over the order's OTHER lineitems becomes
    two HOFs over the same o_lineitems array the candidate line came
    from — the whole per-order correlation is row-local, no
    self-join of lineitem at all (the flat plan's dominant cost).
    Spark: distinct (order, supplier, late?) pairs from one explode
    chain, then the exists/forall arms via array predicates computed
    BEFORE the explode. One shuffle groups by supplier name.
    Reference: tpch_nested-q21.test (receipt>commit adapted to
    shipdate > orderdate + 60 days)."""
    nested = _nested_customers(spark, sf_dir, wide=True)
    odate = F.col("o.o_orderdate").cast("date")

    def late(l):
        return l["l_shipdate"].cast("date") > F.date_add(odate, 60)

    # per order: the distinct supplier set and the late-supplier set
    supps = F.array_distinct(F.transform(
        "o.o_lineitems", lambda l: l["l_suppkey"]))
    late_supps = F.array_distinct(F.transform(
        F.filter("o.o_lineitems", late), lambda l: l["l_suppkey"]))
    ex = (
        nested.select(F.explode("c_orders").alias("o"))
        .select(
            supps.alias("supps"),
            late_supps.alias("late_supps"),
        )
        # exactly one late supplier in a multi-supplier order
        .where((F.size("late_supps") == 1) & (F.size("supps") >= 2))
        .select(F.element_at("late_supps", 1).alias("l_suppkey"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        ex.join(F.broadcast(supp),
                ex["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@_register(
    "nested_tpch_q22_inactive_customers",
    """
    WITH eligible AS (
      SELECT c_custkey, c_nationkey,
             CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      FROM customer
      WHERE c_nationkey BETWEEN 5 AND 22),
    threshold AS (
      SELECT AVG(CAST(bal AS DOUBLE)) AS avg_bal
      FROM eligible WHERE bal > 0)
    SELECT e.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
      CAST(SUM(e.bal) AS DECIMAL(38,2)) AS totacctbal
    FROM eligible e, threshold t
    WHERE CAST(e.bal AS DOUBLE) > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND CAST(o.o_orderdate AS DATE)
                            >= DATE '1998-01-01')
    GROUP BY e.c_nationkey
    ORDER BY e.c_nationkey
    """,
)
def nested_tpch_q22_inactive_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """tpch_nested q22 (global sales opportunity): 'customers with no
    recent orders' is a size(filter(c_orders, ...))=0 test on the
    nested row — the NOT EXISTS anti-join the flat plan pays a
    shuffle for is a row-local array predicate in the collection
    layout. The positive-balance average is a broadcast scalar (cross
    join of a 1-row aggregate). Averaging follows the repo's
    double-division convention for bit determinism.
    Reference: tpch_nested-q22.test (phone country codes adapted to a
    nationkey band; every customer in this dataset has SOME order, so
    inactivity means none since 1998)."""
    nested = _nested_customers(spark, sf_dir)
    recent = F.filter(
        "c_orders",
        lambda o: o["o_orderdate"].cast("date") >= F.lit("1998-01-01"))
    eligible = nested.where(
        F.col("c_nationkey").between(5, 22)
    ).select(
        "c_custkey", "c_nationkey",
        F.col("c_acctbal").cast("decimal(12,2)").alias("bal"),
        F.size(recent).alias("n_orders"),
    )
    thr = eligible.where(F.col("bal") > 0).agg(
        (F.sum(F.col("bal").cast("double"))
         / F.count("bal")).alias("avg_bal"))
    return (
        eligible.crossJoin(F.broadcast(thr))
        .where(
            (F.col("bal").cast("double") > F.col("avg_bal"))
            & (F.col("n_orders") == 0))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("decimal(38,2)").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
