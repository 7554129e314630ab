"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (TPC-H Q1) on sf0.001.
queries()    — every implemented operator/query from SURVEY.md §2,
               name -> (spark, sf_dir) -> DataFrame.
oracle_sql() — matching ANSI SQL for the DuckDB oracle (same column
               names/aliases; absent => rows-only check).

Implementations live in `incubator_impala_spark.queries.*`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from incubator_impala_spark.queries import QUERIES

    return QUERIES["tpch_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from incubator_impala_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from incubator_impala_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
