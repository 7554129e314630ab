"""Full-schema TPC-H fixture access: Spark temp-view registration and
DuckDB oracle-SQL prefixing.

The fixture (fixtures/tpch/*.parquet, committed — see
scripts/gen_tpch_fixture.py) carries the COMPLETE public TPC-H schema
(all 8 tables, partsupp, lineitem commit/receipt dates, ship modes,
phones) so the reference's own TPC-H query texts
(testdata/workloads/tpch/queries/tpch-q*.test) run here verbatim with
DuckDB oracles. The driver's own testdata is a TPC-H *subset* (no
partsupp, fewer columns) — its tables keep serving the DataFrame
corpus; these views exist only for the text entries.

Every table name here collides with the driver's TPC-H-subset views
(and `customer` also with the TPC-DS fixture), and all three corpora
share one SparkSession — so the fast-path guard verifies a
full-schema-only column still resolves before trusting the
session-conf flag, exactly like sources/tpcds.py.
"""

from __future__ import annotations

import os
import re

from pyspark.errors import PySparkException
from pyspark.sql import SparkSession

TPCH_TABLES = ["region", "nation", "supplier", "customer", "part",
               "partsupp", "orders", "lineitem"]

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fixture_dir() -> str:
    return os.path.join(_REPO_ROOT, "fixtures", "tpch")


def table_path(name: str) -> str:
    return os.path.join(fixture_dir(), f"{name}.parquet")


_REGISTERED_KEY = "spark.incubator_impala.tpchFullRegistered"


def register_tpch_full(spark: SparkSession) -> None:
    if spark.conf.get(_REGISTERED_KEY, None) == "1":
        try:
            if ("l_commitdate" in spark.table("lineitem").columns
                    and "c_phone" in spark.table("customer").columns):
                return
        except PySparkException:  # view dropped — re-register below
            pass
    for t in TPCH_TABLES:
        spark.read.parquet(table_path(t)).createOrReplaceTempView(t)
    spark.conf.set(_REGISTERED_KEY, "1")


def referenced_tables(sql: str) -> list[str]:
    return [t for t in TPCH_TABLES
            if re.search(rf"\b{t}\b", sql, re.IGNORECASE)]


def duckdb_oracle_sql(sql: str) -> str:
    """Self-contained DuckDB statement: read_parquet CTEs for every
    referenced table, merged with the query's own WITH clause (the
    grading driver's DuckDB session has the SUBSET tables as views —
    these CTEs shadow them with the full-schema fixture)."""
    ctes = ",\n".join(
        f"{t} AS (SELECT * FROM read_parquet('{table_path(t)}'))"
        for t in referenced_tables(sql))
    body = sql.strip()
    m = re.match(r"^with\b", body, re.IGNORECASE)
    if m:
        return f"WITH {ctes},\n{body[m.end():].lstrip()}"
    return f"WITH {ctes}\n{body}"
