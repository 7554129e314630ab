"""SQL-analyzer surface corpus: statements exercised as *SQL text*
through `spark.sql` (with views registered) rather than the DataFrame
API — the path a reference user actually takes (SURVEY.md §3 entry
point A: SQL string → parse → analyze → rewrite).

Covers the analyzer/rewriter features the reference implements in
StmtRewriter.java:47 (subquery decorrelation: correlated EXISTS /
NOT EXISTS / IN / scalar), WITH-clause CTEs (sql-parser.cup:420),
LATERAL joins (Spark 3.4+, superset of the reference's subplan), and
INTERSECT ALL / EXCEPT ALL (strict superset of the reference's
rewrite-to-join forms, SetOperationStmt.java:35-45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


def _sql(spark: SparkSession, sf_dir: str, tables: list[str], sql: str) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


_CORRELATED_EXISTS = """
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (
        SELECT 1 FROM orders o2
        WHERE o2.o_custkey = c.c_custkey AND o2.o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
"""


@_register("sql_correlated_exists", _CORRELATED_EXISTS)
def sql_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one statement — decorrelated
    by Catalyst into a semi join stacked on an anti join (the
    reference's StmtRewriter produces the same plan)."""
    return _sql(spark, sf_dir, ["customer", "orders"], _CORRELATED_EXISTS)


_CTE_CHAIN = """
    WITH seg_totals AS (
      SELECT c_mktsegment, o_custkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS cust_total
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment, o_custkey),
    seg_stats AS (
      SELECT c_mktsegment,
        CAST(COUNT(*) AS BIGINT) AS n_cust,
        CAST(MAX(cust_total) AS DECIMAL(38,2)) AS max_total
      FROM seg_totals GROUP BY c_mktsegment)
    SELECT s.c_mktsegment, s.n_cust, s.max_total, t.o_custkey AS top_cust
    FROM seg_stats s JOIN seg_totals t
      ON s.c_mktsegment = t.c_mktsegment AND t.cust_total = s.max_total
    ORDER BY s.c_mktsegment, top_cust
"""


@_register("sql_cte_chain", _CTE_CHAIN)
def sql_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs where the second references the first, and the
    final select joins both — WITH-clause handling end to end."""
    return _sql(spark, sf_dir, ["customer", "orders"], _CTE_CHAIN)


_SCALAR_SUBQUERY = """
    SELECT o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@_register("sql_scalar_subquery", _SCALAR_SUBQUERY)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate. avg over the same
    doubles on both engines: sum order differs, but the filter is a
    strict inequality against a 6-digit-spread mean — group counts are
    stable (no order value sits within float-error of the mean)."""
    return _sql(spark, sf_dir, ["orders"], _SCALAR_SUBQUERY)


_LATERAL = """
    SELECT r.r_name, n.n_name
    FROM region r,
    LATERAL (
      SELECT n_name FROM nation
      WHERE n_regionkey = r.r_regionkey
      ORDER BY n_name LIMIT 2) n
    ORDER BY r.r_name, n.n_name
"""


@_register("sql_lateral_topn_per_group", _LATERAL)
def sql_lateral_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table with per-row LIMIT — the
    direct SQL spelling of the reference's SubplanNode loop."""
    return _sql(spark, sf_dir, ["region", "nation"], _LATERAL)


_SETOP_ALL = """
    SELECT x FROM (
      SELECT o_orderpriority AS x FROM orders WHERE o_custkey % 10 = 0
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000) t
    GROUP BY x ORDER BY x
"""


@_register(
    "sql_intersect_all_counts",
    """
    SELECT x FROM (
      SELECT o_orderpriority AS x FROM orders WHERE o_custkey % 10 = 0
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000) t
    GROUP BY x ORDER BY x
    """,
)
def sql_intersect_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics) — beyond the reference, which
    only supports the DISTINCT forms via join rewrite."""
    return _sql(spark, sf_dir, ["orders"], _SETOP_ALL)


_EXCEPT_ALL = """
    SELECT x, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_orderpriority AS x FROM orders WHERE o_custkey % 10 = 0
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_custkey % 50 = 0) t
    GROUP BY x ORDER BY x
"""


@_register("sql_except_all_counts", _EXCEPT_ALL)
def sql_except_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL bag semantics (with INTERSECT ALL, the strict
    superset of the reference's DISTINCT-only set operations)."""
    return _sql(spark, sf_dir, ["orders"], _EXCEPT_ALL)


# ---------------------------------------------------------------------------
# Recursive CTEs (Spark 4 WITH RECURSIVE; reference: out of the
# reference's grammar, a beyond-reference surface both engines share)
# ---------------------------------------------------------------------------

_RECURSIVE_SERIES = """
WITH RECURSIVE seq(n) AS (
  SELECT 1
  UNION ALL
  SELECT n + 1 FROM seq WHERE n < 100)
SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS cnt,
  CAST(SUM(CASE WHEN n % 7 = 0 THEN n ELSE 0 END) AS BIGINT) AS sum_mult7
FROM seq
"""


@_register("sql_recursive_series", _RECURSIVE_SERIES)
def sql_recursive_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE series generation + aggregate — the minimal
    fixpoint-iteration surface, identical SQL on both engines."""
    return _sql(spark, sf_dir, [], _RECURSIVE_SERIES)


def _recursive_sessionize(epoch_fn: str) -> str:
    # Spark spells seconds-since-epoch unix_timestamp(), DuckDB epoch()
    return f"""
WITH RECURSIVE linked AS (
  SELECT user_id, event_id, ts,
    lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      AS prev_id,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL
           OR {epoch_fn}(ts)
              - {epoch_fn}(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) > 21600
         THEN 1 ELSE 0 END AS is_head
  FROM events),
walk(user_id, head_id, event_id) AS (
  SELECT user_id, event_id, event_id FROM linked WHERE is_head = 1
  UNION ALL
  SELECT l.user_id, w.head_id, l.event_id
  FROM walk w JOIN linked l
    ON l.user_id = w.user_id AND l.prev_id = w.event_id AND l.is_head = 0)
SELECT user_id, head_id, CAST(COUNT(*) AS BIGINT) AS n_events
FROM walk GROUP BY user_id, head_id
"""


@_register(
    "sql_recursive_sessionize",
    _recursive_sessionize("epoch"),
)
def sql_recursive_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization as a recursive chain walk: session heads seed
    the recursion (gap > 6h or first event), each step follows the
    predecessor link (lag of event_id) — cross-validating the
    streaming sessionizer's gap semantics through a totally different
    plan (fixpoint joins instead of stateful windows). Chain depth at
    this gap is ~10, far under the recursion limit."""
    return _sql(spark, sf_dir, ["events"],
                _recursive_sessionize("unix_timestamp"))
