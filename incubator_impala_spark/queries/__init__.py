"""Query registry: every implemented operator/query from SURVEY.md §2.

Aggregates per-domain modules into the two dicts the driver contract
needs (`__spark_entry__.queries()` / `oracle_sql()`):

- QUERIES: name -> Callable[(SparkSession, sf_dir)] -> DataFrame
- ORACLE_SQL: name -> equivalent ANSI SQL for the DuckDB oracle
  (absent => non-SQL-expressible; driver does a rows-only check)

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (driver hashes after sorting columns
by name).
"""

from __future__ import annotations

from incubator_impala_spark.queries import (
    functional_query,
    functions_sweep,
    nested,
    nested_tpch,
    pipeline,
    relational,
    sql_surface,
    streaming_batch,
    tpcds_adapted,
    tpcds_real,
    tpcds_round3,
    tpcds_round4,
    tpch,
    tpch_real,
)

_MODULES = [
    tpch, relational, pipeline, streaming_batch, functions_sweep, nested,
    nested_tpch, sql_surface, tpcds_adapted, tpcds_round3, tpcds_round4,
    tpcds_real, tpch_real, functional_query,
]

QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLE_SQL.update(_m.ORACLE_SQL)

__all__ = ["QUERIES", "ORACLE_SQL"]
