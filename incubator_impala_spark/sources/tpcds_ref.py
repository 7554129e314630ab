"""Real TPC-DS sf1 fixture via DuckDB's dsdgen — spec-deterministic,
so the reference's recorded expected results over its dsdgen-loaded
TPC-DS database reproduce exactly (verified: analytic-fns-tpcds.test's
running totals match row-for-row).

Only the tables the wired functional files touch are exported (item,
18k rows); extend TABLES as more files come online. Cached beside the
TPC-H sf1 fixture under fixtures/_cache (gitignored).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from incubator_impala_spark.sources.tpch_ref import CACHE as _TPCH_CACHE

CACHE = os.path.join(os.path.dirname(_TPCH_CACHE), "tpcds_sf1")

TABLES = ["item", "customer"]


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
    flat = ensure_flat()
    for t in TABLES:
        spark.read.parquet(f"{flat}/{t}.parquet") \
            .createOrReplaceTempView(f"tpcds_ref_{t}")
