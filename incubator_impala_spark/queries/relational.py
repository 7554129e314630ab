"""Operator-focused corpus: window/analytic, grouping sets, set ops,
join variants, nested types, scalar-function sweeps.

Mirrors the reference's QueryTest corpus (`testdata/workloads/
functional-query/queries/QueryTest/` — aggregation.test,
analytic-fns.test, joins.test, subquery.test, nested-types-*.test) on
the driver's tables. Every entry pairs a DataFrame/SQL plan with a
DuckDB oracle; determinism rules:

- window ORDER BY always includes a unique tie-breaker column;
- sums over money are exact decimals (see tpch.py header);
- transcendental outputs are pinned to DECIMAL(18,9) on tiny inputs
  so 1-ulp libm differences between JVM and DuckDB can't flip a
  rounding boundary.
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
# Analytic / window functions — AnalyticEvalNode parity
# (be/src/exec/analytic-eval-node.h:87; ranking fns BuiltinsDb.java:1304).
# Scale: one shuffle on the PARTITION BY key; Spark sorts within
# partitions exactly like the reference's sort-group planner
# (fe/.../planner/AnalyticPlanner.java).
# ---------------------------------------------------------------------------
@_register(
    "analytic_rank_fns",
    """
    SELECT o_orderkey,
      CAST(RANK() OVER w AS BIGINT) AS rnk,
      CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
      CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
      CAST(PERCENT_RANK() OVER w AS DECIMAL(18,9)) AS prnk,
      CAST(CUME_DIST() OVER w AS DECIMAL(18,9)) AS cdist,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def analytic_rank_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.percent_rank().over(w).cast("decimal(18,9)").alias("prnk"),
        F.cume_dist().over(w).cast("decimal(18,9)").alias("cdist"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@_register(
    "analytic_value_fns",
    """
    SELECT o_orderkey,
      LAG(o_orderkey, 1) OVER w AS prev_key,
      LAG(o_orderkey, 2, CAST(-1 AS BIGINT)) OVER w AS prev2_key,
      LEAD(o_orderkey, 1) OVER w AS next_key,
      FIRST_VALUE(o_orderkey) OVER w AS first_key,
      LAST_VALUE(o_orderkey) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_key
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def analytic_value_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lag("o_orderkey", 2, -1).over(w).alias("prev2_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w_full).alias("last_key"),
    )


@_register(
    "analytic_window_frames",
    """
    SELECT o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        (PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DECIMAL(38,2)) AS sum_4row,
      CAST(MIN(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        (PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(12,2)) AS run_min,
      CAST(COUNT(*) OVER
        (PARTITION BY o_orderpriority ORDER BY o_orderkey
         ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS BIGINT) AS cnt_next3
    FROM orders
    WHERE o_custkey % 50 = 0
    """,
)
def analytic_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 0)
    base = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return orders.select(
        "o_orderkey",
        F.sum(_d("o_totalprice"))
        .over(base.rowsBetween(-3, 0))
        .cast("decimal(38,2)")
        .alias("sum_4row"),
        F.min(_d("o_totalprice"))
        .over(base.rowsBetween(Window.unboundedPreceding, 0))
        .cast("decimal(12,2)")
        .alias("run_min"),
        F.count("*").over(base.rowsBetween(0, 2)).alias("cnt_next3"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube — MultiAggregateInfo parity
# (fe/.../analysis/MultiAggregateInfo.java:346; grammar
# sql-parser.cup:3134-3151). Spark's Expand operator covers the
# reference's agg-class duplication + transposition.
# ---------------------------------------------------------------------------
@_register(
    "agg_rollup",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
      coalesce(l_linestatus, '<all>') AS linestatus,
      CAST(GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS glevel,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty,
      CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r11 (guide §2.3): ROLLUP's Expand would push THREE copies of
    # every fact row through the aggregate; sum/count are algebraic,
    # so the two super-levels re-aggregate from the tiny leaf result
    # instead — the fact is scanned and aggregated exactly once, and
    # the exact decimal sums make the re-aggregation bit-identical to
    # the direct rollup. glevel is the grouping()-arith the rollup
    # produced, now a per-level literal.
    li = load_table(spark, sf_dir, "lineitem")
    leaf = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_d("l_quantity")).alias("_sq"), F.count("*").alias("_cnt")
    )
    null_s = F.lit(None).cast("string")

    def lvl(df, flag_col, status_col, glevel):
        return df.select(
            flag_col.alias("l_returnflag"), status_col.alias("l_linestatus"),
            F.lit(glevel).cast("bigint").alias("glevel"),
            F.col("_sq").cast("decimal(38,2)").alias("sum_qty"),
            F.col("_cnt").cast("bigint").alias("cnt"),
        )

    lvl0 = lvl(leaf, F.col("l_returnflag"), F.col("l_linestatus"), 0)
    lvl1 = lvl(
        leaf.groupBy("l_returnflag")
        .agg(F.sum("_sq").alias("_sq"), F.sum("_cnt").alias("_cnt")),
        F.col("l_returnflag"), null_s, 1,
    )
    lvl2 = lvl(
        leaf.agg(F.sum("_sq").alias("_sq"), F.sum("_cnt").alias("_cnt")),
        null_s, null_s, 2,
    )
    return (
        lvl0.unionByName(lvl1).unionByName(lvl2)
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "glevel",
            "sum_qty",
            "cnt",
        )
        .orderBy("returnflag", "linestatus")
    )


@_register(
    "agg_cube",
    """
    SELECT coalesce(l_returnflag, '<all>') AS returnflag,
      coalesce(l_linestatus, '<all>') AS linestatus,
      CAST(COUNT(*) AS BIGINT) AS cnt,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_price
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_d("l_extendedprice")).cast("decimal(38,2)").alias("sum_price"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "cnt",
            "sum_price",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Multiple DISTINCT aggregates in one SELECT (MULTI_AGGREGATION node,
# PlanNodes.thrift:52; MultiAggregateInfo.java:113) — Spark plans this
# as Expand + two-phase agg automatically.
# ---------------------------------------------------------------------------
@_register(
    "agg_multi_distinct",
    """
    SELECT l_returnflag,
      CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS nparts,
      CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nsupps,
      CAST(COUNT(*) AS BIGINT) AS cnt,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nparts"),
            F.countDistinct("l_suppkey").alias("nsupps"),
            F.count("*").alias("cnt"),
            F.sum(_d("l_quantity")).cast("decimal(38,2)").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Statistical aggregates (BuiltinsDb.java:1129-1185). Inputs are
# integer-valued doubles, so sums/sum-of-squares are exact; results are
# pinned to DECIMAL(18,6) to absorb merge-order last-bit drift.
# ---------------------------------------------------------------------------
@_register(
    "agg_stats_fns",
    """
    SELECT l_returnflag,
      CAST(STDDEV_SAMP(l_quantity) AS DECIMAL(18,6)) AS sd_samp,
      CAST(STDDEV_POP(l_quantity) AS DECIMAL(18,6)) AS sd_pop,
      CAST(VAR_SAMP(l_quantity) AS DECIMAL(18,6)) AS var_samp,
      CAST(VAR_POP(l_quantity) AS DECIMAL(18,6)) AS var_pop,
      CAST(MIN(l_quantity) AS DECIMAL(12,2)) AS min_qty,
      CAST(MAX(l_quantity) AS DECIMAL(12,2)) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.stddev_samp("l_quantity").cast("decimal(18,6)").alias("sd_samp"),
            F.stddev_pop("l_quantity").cast("decimal(18,6)").alias("sd_pop"),
            F.var_samp("l_quantity").cast("decimal(18,6)").alias("var_samp"),
            F.var_pop("l_quantity").cast("decimal(18,6)").alias("var_pop"),
            F.min("l_quantity").cast("decimal(12,2)").alias("min_qty"),
            F.max("l_quantity").cast("decimal(12,2)").alias("max_qty"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Deterministic group_concat (reference group_concat is unordered,
# BuiltinsDb.java:1277; we impose sortedness so the oracle can match —
# same trick the reference's own golden tests use).
# ---------------------------------------------------------------------------
@_register(
    "agg_group_concat_sorted",
    """
    SELECT n_regionkey,
      string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
)
def agg_group_concat_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    return (
        nat.groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
        )
        .orderBy("n_regionkey")
    )


# ---------------------------------------------------------------------------
# Set operations — UnionNode parity (be/src/exec/union-node.h:89).
# The reference rewrites INTERSECT/EXCEPT into semi/anti joins
# (SetOperationStmt.java:35-45); Spark executes them natively —
# a strict superset (INTERSECT ALL / EXCEPT ALL also work).
# ---------------------------------------------------------------------------
@_register(
    "setop_union",
    """
    SELECT c_custkey AS key, 'cust' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS key, 'cust' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"), F.lit("cust").alias("src"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"), F.lit("cust").alias("src"))
    )
    return cust.union(orders).distinct()


@_register(
    "setop_union_all_counts",
    """
    SELECT src, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT 'bldg' AS src FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT 'auto' AS src FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      UNION ALL
      SELECT 'urgent' AS src FROM orders WHERE o_orderpriority = '1-URGENT'
    ) u GROUP BY src ORDER BY src
    """,
)
def setop_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    u = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .select(F.lit("bldg").alias("src"))
        .unionAll(
            cust.where(F.col("c_mktsegment") == "AUTOMOBILE").select(
                F.lit("auto").alias("src")
            )
        )
        .unionAll(
            orders.where(F.col("o_orderpriority") == "1-URGENT").select(
                F.lit("urgent").alias("src")
            )
        )
    )
    return u.groupBy("src").agg(F.count("*").alias("cnt")).orderBy("src")


@_register(
    "setop_intersect_except",
    """
    SELECT key, mode FROM (
      SELECT c_custkey AS key, 'both' AS mode FROM customer WHERE c_acctbal > 0
      INTERSECT
      SELECT o_custkey AS key, 'both' AS mode FROM orders
    ) a
    UNION ALL
    SELECT key, mode FROM (
      SELECT c_custkey AS key, 'only_cust' AS mode FROM customer WHERE c_acctbal > 0
      EXCEPT
      SELECT o_custkey AS key, 'only_cust' AS mode FROM orders
    ) b
    """,
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 0)
        .select(F.col("c_custkey").alias("key"))
    )
    ords = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key"))
    both = cust.intersect(ords).withColumn("mode", F.lit("both"))
    only = cust.exceptAll(ords.distinct()).distinct().withColumn(
        "mode", F.lit("only_cust")
    )
    return both.unionAll(only)


# ---------------------------------------------------------------------------
# Join variants — the reference's 10-op join algebra
# (TJoinOp, PlanNodes.thrift:361-378).
# ---------------------------------------------------------------------------
@_register(
    "join_full_outer",
    """
    SELECT
      CAST(COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT) AS cust_no_orders,
      CAST(COUNT(CASE WHEN c_custkey IS NULL THEN 1 END) AS BIGINT) AS orders_no_cust,
      CAST(COUNT(CASE WHEN c_custkey IS NOT NULL AND o_orderkey IS NOT NULL THEN 1 END) AS BIGINT) AS matched
    FROM customer FULL OUTER JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 100
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = cust.join(
        orders,
        (F.col("c_custkey") == F.col("o_custkey")) & (F.col("o_totalprice") > 100),
        "full_outer",
    )
    return j.agg(
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias("cust_no_orders"),
        F.count(F.when(F.col("c_custkey").isNull(), 1)).alias("orders_no_cust"),
        F.count(
            F.when(F.col("c_custkey").isNotNull() & F.col("o_orderkey").isNotNull(), 1)
        ).alias("matched"),
    )


@_register(
    "join_cross",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    WHERE n_nationkey < 5
    ORDER BY r_name, n_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    reg = load_table(spark, sf_dir, "region").select("r_name")
    nat = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_nationkey") < 5)
        .select("n_name")
    )
    return reg.crossJoin(nat).orderBy("r_name", "n_name")


@_register(
    "join_anti_customers_without_orders",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
        .orderBy("n_name")
    )


# NULL_AWARE_LEFT_ANTI (PlanNodes.thrift:367-371) — the `NOT IN` +
# nullable-key trap. Two cases: subquery WITHOUT nulls (plain anti
# semantics) and WITH a null (NOT IN must return zero rows). Expressed
# through the SQL surface so Catalyst's null-aware anti join runs.
@_register(
    "join_not_in_no_nulls",
    """
    SELECT c_custkey FROM customer
    WHERE c_nationkey NOT IN (
      SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
    ORDER BY c_custkey
    """,
)
def join_not_in_no_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from incubator_impala_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer
        WHERE c_nationkey NOT IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey IN (0, 1))
        ORDER BY c_custkey
        """
    )


@_register(
    "join_not_in_with_nulls",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM customer
    WHERE c_nationkey NOT IN (
      SELECT CASE WHEN n_nationkey > 20 THEN NULL ELSE n_nationkey END
      FROM nation)
    """,
)
def join_not_in_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    from incubator_impala_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS cnt FROM customer
        WHERE c_nationkey NOT IN (
          SELECT CASE WHEN n_nationkey > 20 THEN NULL ELSE n_nationkey END
          FROM nation)
        """
    )


# ---------------------------------------------------------------------------
# UNNEST / lateral (SubplanNode + UnnestNode, be/src/exec/
# subplan-node.h:44-64, unnest-node.h) — Catalyst Generate covers the
# whole correlated-subplan machinery.
# ---------------------------------------------------------------------------
@_register(
    "unnest_words",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE lang = 'en') w
    WHERE word <> ''
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def unnest_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("lang") == "en")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(20)
    )


@_register(
    "unnest_posexplode",
    """
    SELECT doc_id, pos, word
    FROM (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS word,
                 CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos
          FROM documents WHERE doc_id < 5) t
    WHERE pos < 3
    ORDER BY doc_id, pos
    """,
)
def unnest_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 5)
    return (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
        )
        .where(F.col("pos") < 3)
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# Array/struct path operations over the embeddings table (§2.9 nested
# dataflow; array element access ≈ Impala's arr.item path resolution).
# ---------------------------------------------------------------------------
@_register(
    "nested_array_ops",
    """
    SELECT vec_id,
      CAST(len(embedding) AS INT) AS dim,
      embedding[1] AS first_elem,
      embedding[64] AS last_elem,
      CAST(label AS INT) AS label
    FROM embeddings WHERE vec_id % 25 = 0
    ORDER BY vec_id
    """,
)
def nested_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.element_at("embedding", 64).alias("last_elem"),
        F.col("label").cast("int").alias("label"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# Top-k variants — TopNNode incl. offset (be/src/exec/topn-node.h:44-46)
# and per-group top-k (limit pushdown into analytic,
# AnalyticEvalNode.java:384-520 / Spark InferWindowGroupLimit).
# ---------------------------------------------------------------------------
@_register(
    "topn_offset",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10 OFFSET 5
    """,
)
def topn_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", _d("o_totalprice").alias("totalprice"))
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .offset(5)
        .limit(10)
    )


@_register(
    "topn_per_group",
    """
    SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    ORDER BY o_orderpriority, totalprice DESC, o_orderkey
    """,
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderpriority", "o_orderkey", _d("o_totalprice").alias("totalprice")
        )
        .orderBy("o_orderpriority", F.desc("totalprice"), "o_orderkey")
    )


# ---------------------------------------------------------------------------
# VALUES inline table (sql-parser.cup:346; UnionNode const-expr rows).
# ---------------------------------------------------------------------------
@_register(
    "values_inline",
    """
    SELECT t.id, t.tag, r_name
    FROM (VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma')) AS t(id, tag)
    JOIN region ON r_regionkey = t.id
    ORDER BY t.id
    """,
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from incubator_impala_spark.sources.tables import register_tables

    register_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.id, t.tag, r_name
        FROM VALUES (0, 'alpha'), (1, 'beta'), (2, 'gamma') AS t(id, tag)
        JOIN region ON r_regionkey = t.id
        ORDER BY t.id
        """
    )


# ---------------------------------------------------------------------------
# count(*)-only scan — NormalizeCountStarRule + parquet aggregate
# pushdown (spark.sql.parquet.aggregatePushdown): row-group metadata
# answers the query without reading data pages.
# ---------------------------------------------------------------------------
@_register(
    "count_star_pushdown",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitem,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders
    FROM lineitem
    """,
)
def count_star_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return li.agg(F.count("*").alias("n_lineitem")).crossJoin(
        orders.agg(F.count("*").alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# TABLESAMPLE SYSTEM (sql-parser.cup:3080) — inherently
# nondeterministic across engines; rows-only check (no oracle).
# ---------------------------------------------------------------------------
@_register("tablesample_system", None)
def tablesample_system(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).agg(
        F.count("*").alias("sampled_rows"),
        F.min("l_orderkey").alias("min_key"),
    )


# ---------------------------------------------------------------------------
# COMPUTE STATS output shape (ComputeStatsStmt.java): per-column
# count/nulls/ndv/min/max — the table the reference materializes into
# its catalog, produced here as a long-format query (exact ndv so the
# oracle hash-matches; the approx path is tests/test_approx_aggs.py).
# ---------------------------------------------------------------------------
@_register(
    "stats_column_summary",
    """
    SELECT 'l_quantity' AS col_name,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(*) - count(l_quantity) AS BIGINT) AS n_nulls,
      CAST(count(DISTINCT l_quantity) AS BIGINT) AS ndv,
      CAST(min(l_quantity) AS DOUBLE) AS min_v,
      CAST(max(l_quantity) AS DOUBLE) AS max_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
      CAST(count(*) AS BIGINT),
      CAST(count(*) - count(l_extendedprice) AS BIGINT),
      CAST(count(DISTINCT l_extendedprice) AS BIGINT),
      CAST(min(l_extendedprice) AS DOUBLE),
      CAST(max(l_extendedprice) AS DOUBLE)
    FROM lineitem
    UNION ALL
    SELECT 'l_suppkey',
      CAST(count(*) AS BIGINT),
      CAST(count(*) - count(l_suppkey) AS BIGINT),
      CAST(count(DISTINCT l_suppkey) AS BIGINT),
      CAST(min(l_suppkey) AS DOUBLE),
      CAST(max(l_suppkey) AS DOUBLE)
    FROM lineitem
    """,
)
def stats_column_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def one(col: str) -> DataFrame:
        return li.agg(
            F.lit(col).alias("col_name"),
            F.count("*").alias("n_rows"),
            (F.count("*") - F.count(col)).alias("n_nulls"),
            F.countDistinct(col).alias("ndv"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
        ).select("col_name", "n_rows", "n_nulls", "ndv", "min_v", "max_v")

    return one("l_quantity").unionAll(one("l_extendedprice")).unionAll(
        one("l_suppkey")
    )


# ---------------------------------------------------------------------------
# RANGE frames with value offsets (AnalyticWindow.java:41-67 — RANGE
# n PRECEDING/FOLLOWING) + IGNORE NULLS value functions over
# constructed NULLs.
# ---------------------------------------------------------------------------
@_register(
    "analytic_range_value_frames",
    """
    SELECT o_orderkey,
      CAST(COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS BIGINT)
        AS n_within_10k,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        (PARTITION BY o_orderpriority ORDER BY o_totalprice
         RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS DECIMAL(38,2))
        AS sum_near,
      first_value(nullif(o_orderkey, 0) IGNORE NULLS) OVER
        (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        AS first_nonzero_key
    FROM orders WHERE o_custkey % 200 = 0
    """,
)
def analytic_range_value_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-offset RANGE frames: peers chosen by |price delta|, not
    row position — plus IGNORE NULLS first_value. Note: ties in
    o_totalprice are true RANGE peers so frame sums are well-defined
    without a tiebreak; the first_value order carries one anyway."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 200 == 0)
    w_count = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 0)
    )
    w_sum = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-5000, 5000)
    )
    w_first = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        F.count("*").over(w_count).cast("bigint").alias("n_within_10k"),
        F.sum(_d("o_totalprice")).over(w_sum).cast("decimal(38,2)").alias("sum_near"),
        F.first(F.nullif(F.col("o_orderkey"), F.lit(0)), ignorenulls=True)
        .over(w_first)
        .alias("first_nonzero_key"),
    )


# ---------------------------------------------------------------------------
# Correlation / covariance (BuiltinsDb stats family). skewness/kurtosis
# are deliberately excluded from the oracle pair: Spark and DuckDB use
# different bias corrections (~1e-3 relative divergence), so they are
# not comparable exactly — corr/covar agree to float precision.
# ---------------------------------------------------------------------------
@_register(
    "agg_corr_covar",
    """
    SELECT l_returnflag,
      CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(18,6)) AS c,
      CAST(covar_pop(l_quantity, l_extendedprice) AS DECIMAL(18,4)) AS cvp,
      CAST(covar_samp(l_quantity, l_extendedprice) AS DECIMAL(18,4)) AS cvs
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").cast("decimal(18,6)").alias("c"),
            F.covar_pop("l_quantity", "l_extendedprice")
            .cast("decimal(18,4)")
            .alias("cvp"),
            F.covar_samp("l_quantity", "l_extendedprice")
            .cast("decimal(18,4)")
            .alias("cvs"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Pivot (df.groupBy().pivot() — Spark API surface; the reference and
# TPC-DS express this as manual conditional aggregation, which is
# exactly what the oracle does).
# ---------------------------------------------------------------------------
@_register(
    "agg_pivot_priority_counts",
    """
    SELECT o_orderstatus,
      CAST(count(*) FILTER (o_orderpriority = '1-URGENT') AS BIGINT)
        AS "1-URGENT",
      CAST(count(*) FILTER (o_orderpriority = '2-HIGH') AS BIGINT)
        AS "2-HIGH",
      CAST(count(*) FILTER (o_orderpriority = '3-MEDIUM') AS BIGINT)
        AS "3-MEDIUM"
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_pivot_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH", "3-MEDIUM"])
        .count()
        .na.fill(0)
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (reference: percentile via histogram /
# appx_median, BuiltinsDb.java:991 — Spark `percentile` and DuckDB
# `quantile_cont` both compute exact linear interpolation).
# ---------------------------------------------------------------------------
@_register(
    "agg_percentiles_exact",
    """
    SELECT l_returnflag,
      CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25,
      CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS p50,
      CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE) AS p90
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_quantity", F.lit(0.25)).alias("p25"),
            F.percentile("l_quantity", F.lit(0.5)).alias("p50"),
            F.percentile("l_quantity", F.lit(0.9)).alias("p90"),
        )
        .orderBy("l_returnflag")
    )
