#!/usr/bin/env python3
"""Real-sf1 scaling point for the relational headline queries.

Runs every BENCH_QUERIES entry that resolves against the official
dbgen sf1 tables (fixtures/_cache/tpch_sf1/flat — 6M-row lineitem)
and the same entry at testdata sf0.1, and prints a JSON dict of
per-query medians + the sf1/sf0.1 ratio. Entries over the synthetic
documents/embeddings/events tables have no sf1 fixture and are
skipped (listed in the output as such — no silent caps).

Entries over the synthetic documents/embeddings/events tables run
against the bootstrap 10x fixtures instead
(fixtures/_cache/scale10x, generated on demand by
scripts/gen_scale10x_fixtures.py) — every headline entry gets a
measured 10x ratio; the JSON records which fixture supplied each
ratio under "source".

Usage: python scripts/bench_sf1_probe.py  (writes BENCH_SF1.json)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "_cache",
    "tpch_sf1", "flat")
SF01_DIR = "/root/testdata/sf0.1"


def median(xs):
    xs = sorted(xs)
    return xs[len(xs) // 2]


def main():
    from bench import BENCH_QUERIES
    from incubator_impala_spark.queries import QUERIES
    from incubator_impala_spark.session import get_spark

    from scripts.gen_scale10x_fixtures import main as gen_10x

    scale10x_dir = gen_10x()  # no-op when already generated
    spark = get_spark("sf1-probe")
    out = {"sf1": {}, "sf01": {}, "ratio": {}, "source": {},
           "skipped": []}
    QUERIES["tpch_q6"](spark, SF1_DIR).collect()  # warm-up
    for name in BENCH_QUERIES:
        if name not in QUERIES:
            continue
        big_dir, source = SF1_DIR, "dbgen_sf1"
        try:
            QUERIES[name](spark, big_dir).limit(1).collect()
        except Exception:  # noqa: BLE001 — no sf1 fixture: try the
            # bootstrap 10x documents/embeddings/events fixtures
            big_dir, source = scale10x_dir, "synthetic_10x"
            try:
                QUERIES[name](spark, big_dir).limit(1).collect()
            except Exception as exc:  # noqa: BLE001
                out["skipped"].append(
                    {"query": name,
                     "reason": str(exc).split("\n")[0][:120]})
                continue
        for label, d in (("sf1", big_dir), ("sf01", SF01_DIR)):
            runs = []
            for _ in range(3):
                t0 = time.time()
                QUERIES[name](spark, d).collect()
                runs.append(time.time() - t0)
            out[label][name] = round(median(runs), 3)
        out["ratio"][name] = round(
            out["sf1"][name] / max(out["sf01"][name], 1e-9), 2)
        out["source"][name] = source
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"queries": len(out["ratio"]),
                      "skipped": len(out["skipped"]),
                      "ratios": out["ratio"]}))


if __name__ == "__main__":
    main()
