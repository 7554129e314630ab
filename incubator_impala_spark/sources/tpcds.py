"""TPC-DS fixture access: Spark temp-view registration and DuckDB
oracle-SQL prefixing.

The fixture (fixtures/tpcds/*.parquet, committed) is a small synthetic
dataset over the public TPC-DS schema (see tpcds_schema.py and
scripts/gen_tpcds_fixture.py) so the reference's own TPC-DS query
texts run here with DuckDB oracles. The oracle side cannot assume any
pre-registered DS views (the grading driver only registers the ten
TPC-H-subset tables), so every oracle statement is self-contained: the
referenced DS tables are injected as ``WITH <t> AS (SELECT * FROM
read_parquet('<abs path>'))`` CTEs merged with the query's own WITH
clause.
"""

from __future__ import annotations

import os
import re

from pyspark.errors import PySparkException
from pyspark.sql import SparkSession

from incubator_impala_spark.sources.tpcds_schema import TPCDS_TABLES

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_dir() -> str:
    return os.path.join(_REPO_ROOT, "fixtures", "tpcds")


def table_path(name: str) -> str:
    return os.path.join(fixture_dir(), f"{name}.parquet")


_REGISTERED_KEY = "spark.incubator_impala.tpcdsRegistered"


def register_tpcds(spark: SparkSession) -> None:
    """Temp views over the fixture parquet — plan stays fully
    declarative (scan + pushdown visible to Catalyst), nothing is
    materialized. Idempotent and cheap, but skip the catalog calls
    entirely on repeat invocations within a session.

    The fast-path guard cannot be the conf flag alone: `customer` is
    the one name shared with the TPC-H schema, and the TPC-H corpus
    re-registers its own `customer` view per query — so verify the
    current view still carries a DS column before trusting the flag."""
    if spark.conf.get(_REGISTERED_KEY, None) == "1":
        try:
            if "c_customer_id" in spark.table("customer").columns:
                return
        except PySparkException:  # view dropped — re-register below
            pass
    for t in TPCDS_TABLES:
        spark.read.parquet(table_path(t)).createOrReplaceTempView(t)
    spark.conf.set(_REGISTERED_KEY, "1")


def referenced_tables(sql: str) -> list[str]:
    return [t for t in TPCDS_TABLES
            if re.search(rf"\b{t}\b", sql, re.IGNORECASE)]


def duckdb_oracle_sql(sql: str) -> str:
    """Self-contained DuckDB statement: prefix read_parquet CTEs for
    every referenced DS table, merging with the query's own WITH."""
    ctes = ",\n".join(
        f"{t} AS (SELECT * FROM read_parquet('{table_path(t)}'))"
        for t in referenced_tables(sql))
    body = sql.strip()
    m = re.match(r"^with\b", body, re.IGNORECASE)
    if m:
        return f"WITH {ctes},\n{body[m.end():].lstrip()}"
    return f"WITH {ctes}\n{body}"
