"""Real TPC-DS sf1 fixture via DuckDB's dsdgen — spec-deterministic,
so the reference's recorded expected results over its dsdgen-loaded
TPC-DS database reproduce exactly (verified: analytic-fns-tpcds.test's
running totals match row-for-row, and the tpcds workload corpus —
tests/test_tpcds_workload.py — verifies the reference's recorded sf1
answers directly).

All 24 tables export (~1 GB parquet, cached beside the TPC-H sf1
fixture under fixtures/_cache, gitignored). Date columns register as
STRING — the reference's own TPC-DS schema typing
(tpcds_schema_template.sql: d_date string).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from incubator_impala_spark.sources.tpch_ref import CACHE as _TPCH_CACHE

CACHE = os.path.join(os.path.dirname(_TPCH_CACHE), "tpcds_sf1")

TABLES = [
    "call_center", "catalog_page", "catalog_returns", "catalog_sales",
    "customer", "customer_address", "customer_demographics",
    "date_dim", "household_demographics", "income_band", "inventory",
    "item", "promotion", "reason", "ship_mode", "store",
    "store_returns", "store_sales", "time_dim", "warehouse",
    "web_page", "web_returns", "web_sales", "web_site",
]


def ensure_flat() -> str:
    out = CACHE
    missing = [t for t in TABLES
               if not os.path.exists(f"{out}/{t}.parquet")]
    if not missing:
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpcds")
    con.execute("CALL dsdgen(sf=1)")
    for t in missing:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)")
    con.close()
    return out


def register_tpcds_ref(spark: SparkSession) -> None:
    """Idempotent temp views ``tpcds_ref_<t>``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DateType

    flat = ensure_flat()
    for t in TABLES:
        df = spark.read.parquet(f"{flat}/{t}.parquet")
        df = df.select(*[
            F.col(f.name).cast("string").alias(f.name)
            if isinstance(f.dataType, DateType) else F.col(f.name)
            for f in df.schema.fields])
        if t == "customer":
            # the reference's v2 schema names it c_last_review_date
            # (string); DuckDB's dsdgen ships the v3 _sk spelling
            df = df.withColumnRenamed("c_last_review_date_sk",
                                      "c_last_review_date")
        df.createOrReplaceTempView(f"tpcds_ref_{t}")
