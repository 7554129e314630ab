#!/usr/bin/env python3
"""Time the dedup/text operators on the LINEAR-OUTPUT corpus
(scripts/gen_linear_scale_corpus.py) at 1x and 10x and print a
markdown table: time ratio + output-row ratio per entry.

On this corpus a correct operator's output grows ~linearly, so a
time ratio well above ~10 is a genuine superlinear engine path, not
output growth — the inference step the r9 verdict asked to close
(SCALE.md r10 table).

Usage: python3 scripts/linear_scale_probe.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ENTRIES = [
    "pipeline_dedup_minhash_lsh",
    "pipeline_dedup_simhash",
    "pipeline_dedup_embedding_ivf",
    "pipeline_dedup_clusters",
    "pipeline_text_features",
]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from incubator_impala_spark.queries import QUERIES
    from incubator_impala_spark.session import get_spark

    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "_cache")
    d1, d10 = os.path.join(base, "lin1x"), os.path.join(base, "lin10x")
    spark = get_spark("linear-scale-probe")
    rows = []
    for name in ENTRIES:
        fn = QUERIES[name]
        rec = {}
        for tag, d in (("1x", d1), ("10x", d10)):
            times, n = [], None
            for _ in range(iters):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
            rec[tag] = (sorted(times)[len(times) // 2], n)
        t_ratio = rec["10x"][0] / rec["1x"][0]
        o_ratio = (rec["10x"][1] / rec["1x"][1]
                   if rec["1x"][1] else float("inf"))
        rows.append((name, rec["1x"][0], rec["10x"][0], t_ratio,
                     rec["1x"][1], rec["10x"][1], o_ratio))
        print(f"| {name} | {rec['1x'][0]:.2f}s | {rec['10x'][0]:.2f}s "
              f"| {t_ratio:.1f}x | {rec['1x'][1]} | {rec['10x'][1]} "
              f"| {o_ratio:.1f}x |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
