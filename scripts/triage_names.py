"""Run the bit-exact comparator over an explicit entry-name list.

Usage: python3 scripts/triage_names.py name1 name2 ...
Same comparator as bitexact_sweep.py, but exact names (no prefix match)
so a triage run over a subset doesn't drag in prefix-sharing entries.
"""

from __future__ import annotations

import importlib.util
import json
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo/scripts")
from bitexact_sweep import compare  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.01"

    from incubator_impala_spark.sources.tables import TABLES
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, osql = mod.queries(), mod.oracle_sql()
    n_pass = n_fail = 0
    failures = {}
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"SPARK ERR: {type(e).__name__}: {e}"[:500]
            print(f"ERR  {name}: {failures[name][:200]}", flush=True)
            continue
        try:
            oracle_pdf = con.execute(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            n_fail += 1
            failures[name] = f"ORACLE ERR: {type(e).__name__}: {e}"[:500]
            print(f"ERR  {name}: {failures[name][:200]}", flush=True)
            continue
        problems = compare(spark_pdf, oracle_pdf)
        if problems:
            n_fail += 1
            failures[name] = problems[0][:500]
            print(f"FAIL {name}: {problems[0][:200]}", flush=True)
        else:
            n_pass += 1
            print(f"ok   {name} ({time.time()-t0:.1f}s, {len(spark_pdf)} rows)",
                  flush=True)
    print(json.dumps({"pass": n_pass, "fail": n_fail, "failures": failures}))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
