"""Nested-types corpus (SURVEY.md §2.9 / build plan M3): arrays of
structs, subplan-style correlated evaluation, map columns, and the
IsNotEmpty guard — Impala's signature nested-collections machinery
(SubplanNode `be/src/exec/subplan-node.h:44-64`, UnnestNode,
IsNotEmptyPredicate `be/src/exprs/is-not-empty-predicate.h`)
re-expressed as Catalyst-native array/struct/map expressions and
`explode`/`posexplode` Generates.

The driver tables are flat, so each query *builds* the nested shape
from base tables first (collect_list of structs — the tpch_nested
pattern, `testdata/workloads/tpch_nested/`), then operates on it.
Determinism: arrays are either consumed order-insensitively (size /
filter-count / min / max) or explicitly sorted (`sort_array` — struct
comparison is field-by-field in declaration order, identical in
DuckDB's list_sort) before positional operations.
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


# ---------------------------------------------------------------------------
# Array-of-structs aggregation — collection columns consumed with
# order-insensitive lambdas (filter/transform/min/max over x.field
# paths ≈ Impala's arr.item.field path resolution, fe/.../analysis/
# Path.java).
# ---------------------------------------------------------------------------


@_register(
    "nested_orders_array_stats",
    """
    WITH arr AS (
      SELECT o_custkey,
        list(struct_pack(o_orderkey := o_orderkey,
                         o_totalprice := o_totalprice)) AS orders_arr
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey,
      CAST(len(orders_arr) AS INT) AS n_orders,
      CAST(len(list_filter(orders_arr, x -> x.o_totalprice > 100000))
        AS INT) AS n_big,
      list_max(list_transform(orders_arr, x -> x.o_totalprice)) AS max_price,
      CAST(list_min(list_transform(orders_arr, x -> x.o_orderkey))
        AS BIGINT) AS first_key
    FROM arr WHERE o_custkey % 10 = 0
    """,
)
def nested_orders_array_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    arr = orders.groupBy("o_custkey").agg(
        F.collect_list(F.struct("o_orderkey", "o_totalprice")).alias("orders_arr")
    )
    return arr.where(F.col("o_custkey") % 10 == 0).select(
        "o_custkey",
        F.size("orders_arr").alias("n_orders"),
        F.size(
            F.filter("orders_arr", lambda x: x["o_totalprice"] > 100000)
        ).alias("n_big"),
        F.array_max(
            F.transform("orders_arr", lambda x: x["o_totalprice"])
        ).alias("max_price"),
        F.array_min(
            F.transform("orders_arr", lambda x: x["o_orderkey"])
        ).alias("first_key"),
    )


# ---------------------------------------------------------------------------
# Subplan-style correlated explode: build the collection, re-expand it
# per parent row with position, and apply a per-element conjunct that
# references the parent (SubplanNode + UnnestNode + SingularRowSrc).
# ---------------------------------------------------------------------------


@_register(
    "nested_lateral_top3_orders",
    """
    WITH arr AS (
      SELECT o_custkey,
        list_sort(list(struct_pack(o_orderkey := o_orderkey,
                                   o_totalprice := o_totalprice))) AS oa
      FROM orders GROUP BY o_custkey),
    ex AS (
      SELECT o_custkey,
        CAST(generate_subscripts(oa, 1) - 1 AS INT) AS pos,
        unnest(oa) AS o
      FROM arr WHERE o_custkey % 50 = 0)
    SELECT o_custkey, pos, o.o_orderkey AS okey, o.o_totalprice AS price
    FROM ex WHERE pos < 3
    ORDER BY o_custkey, pos
    """,
)
def nested_lateral_top3_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of a sorted struct array, element conjunct pos < 3 —
    the LATERAL VIEW mapping of the reference's subplan loop."""
    orders = load_table(spark, sf_dir, "orders")
    arr = (
        orders.groupBy("o_custkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("o_orderkey", "o_totalprice"))
            ).alias("oa")
        )
        .where(F.col("o_custkey") % 50 == 0)
    )
    return (
        arr.select("o_custkey", F.posexplode("oa").alias("pos", "o"))
        .where(F.col("pos") < 3)
        .select(
            "o_custkey",
            F.col("pos").cast("int").alias("pos"),
            F.col("o.o_orderkey").alias("okey"),
            F.col("o.o_totalprice").alias("price"),
        )
        .orderBy("o_custkey", "pos")
    )


# ---------------------------------------------------------------------------
# Map columns: build per-user event-type count maps, access by key
# (map → key/value path resolution, CollectionTableRef semantics).
# ---------------------------------------------------------------------------


@_register(
    "nested_event_type_map",
    """
    SELECT user_id,
      CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
      CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
      CAST(count(DISTINCT event_type) AS INT) AS n_types
    FROM events GROUP BY user_id
    """,
)
def nested_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark side goes through an actual MapType column
    (map_from_entries + element_at); the oracle states the equivalent
    flat semantics — the map is plan-internal, outputs are scalars."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "cnt")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchase"),
        F.coalesce(F.element_at("m", "click"), F.lit(0)).alias("n_click"),
        F.size(F.map_keys("m")).alias("n_types"),
    )


# ---------------------------------------------------------------------------
# IsNotEmpty guard over a possibly-NULL collection (left join miss).
# ---------------------------------------------------------------------------


@_register(
    "nested_isnotempty_guard",
    """
    WITH arr AS (
      SELECT o_custkey, list(o_orderkey) AS ok FROM orders GROUP BY o_custkey)
    SELECT c_custkey,
      coalesce(len(ok), 0) > 0 AS has_orders,
      CAST(coalesce(len(ok), 0) AS INT) AS n_orders
    FROM customer LEFT JOIN arr ON c_custkey = o_custkey
    WHERE c_custkey % 7 = 0
    """,
)
def nested_isnotempty_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """!empty(collection) (IsNotEmptyPredicate) as size(col) > 0 with
    NULL-array handling for parents with no children."""
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 7 == 0)
    orders = load_table(spark, sf_dir, "orders")
    arr = orders.groupBy("o_custkey").agg(F.collect_list("o_orderkey").alias("ok"))
    j = cust.join(arr, F.col("c_custkey") == F.col("o_custkey"), "left")
    n = F.coalesce(F.size("ok"), F.lit(0))
    return j.select(
        "c_custkey",
        (n > 0).alias("has_orders"),
        n.cast("int").alias("n_orders"),
    )


@_register(
    "nested_array_set_ops",
    """
    WITH halves AS (
      SELECT n_regionkey,
        list(n_name) FILTER (n_nationkey % 2 = 0) AS evens,
        list(n_name) FILTER (n_nationkey % 3 = 0) AS threes
      FROM nation GROUP BY n_regionkey)
    SELECT n_regionkey,
      array_to_string(list_sort(list_distinct(list_intersect(evens, threes))), ',')
        AS both_sets,
      array_to_string(list_sort(list_distinct(list_concat(evens, threes))), ',')
        AS either_set,
      array_to_string(list_sort(list_distinct(
        list_filter(evens, x -> NOT list_contains(threes, x)))), ',')
        AS only_evens
    FROM halves
    """,
)
def nested_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/union/except over constructed collections —
    set semantics on arrays (outputs sorted+joined since element order
    differs by engine)."""
    nat = load_table(spark, sf_dir, "nation")
    halves = nat.groupBy("n_regionkey").agg(
        F.collect_list(
            F.when(F.col("n_nationkey") % 2 == 0, F.col("n_name"))
        ).alias("evens"),
        F.collect_list(
            F.when(F.col("n_nationkey") % 3 == 0, F.col("n_name"))
        ).alias("threes"),
    )

    def joined(col):
        return F.concat_ws(",", F.sort_array(col))

    return halves.select(
        "n_regionkey",
        joined(F.array_intersect("evens", "threes")).alias("both_sets"),
        joined(F.array_union("evens", "threes")).alias("either_set"),
        joined(F.array_except("evens", "threes")).alias("only_evens"),
    )
