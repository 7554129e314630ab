"""Triage the reference functional-query corpus: run every block of
the named .test files through the QueryTest harness and report per-file
status counts plus the first few failures/errors — the worklist driver
for closing dialect gaps.

    python3 scripts/triage_functional.py exprs aggregation ...
    python3 scripts/triage_functional.py exprs --show-fails 10
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QT_DIR = ("/root/reference/testdata/workloads/functional-query/queries/"
          "QueryTest")


def main() -> None:
    argv = sys.argv[1:]
    show = 6
    if "--show-fails" in argv:
        k = argv.index("--show-fails")
        show = int(argv[k + 1])
        del argv[k:k + 2]
    names = [a for a in argv if not a.startswith("--")]

    import json
    out_json = None
    if "--json" in argv:
        k = argv.index("--json")
        out_json = argv[k + 1]
        names = [n for n in names if n != out_json]

    from incubator_impala_spark.engine import Engine
    from incubator_impala_spark.session import get_spark
    from incubator_impala_spark.sources.functional import register_functional
    from incubator_impala_spark.testing import querytest as qt

    spark = get_spark("functional-triage", cpus=8)
    spark.sparkContext.setLogLevel("FATAL")
    engine = Engine(spark)
    register_functional(spark)
    try:  # sf1 nested fixture for the nested-types-tpch family
        from incubator_impala_spark.sources.tpch_ref import register_tpch_ref

        register_tpch_ref(spark)
    except Exception as exc:  # noqa: BLE001
        print(f"(tpch_ref unavailable: {exc})")

    # reuse the pytest runner's per-file rewrites/presets
    try:
        from tests.test_functional_query import FILES, SETUP_HOOKS
    except Exception:  # noqa: BLE001
        FILES, SETUP_HOOKS = {}, {}

    import re as _re

    report: dict = {}
    for name in names:
        path = os.path.join(QT_DIR, f"{name}.test")
        blocks = qt.parse_test_file(path)
        entry = FILES.get(name, ())
        rewrites = entry[2] if len(entry) > 2 else None
        presets = entry[3] if len(entry) > 3 else None
        # mirror the pytest runner's per-file scratch database
        db = "qtest_" + _re.sub(r"[^a-z0-9]", "", name.lower())
        if name in SETUP_HOOKS:
            SETUP_HOOKS[name](engine, db)
        results = qt.run_blocks(engine, blocks, database=db,
                                table_rewrites=rewrites, presets=presets)
        report[name] = {
            r.index: {"status": r.status, "reason": r.reason,
                      "q": " ".join(blocks[r.index].query.split())[:120],
                      "diffs": r.diffs[:2]}
            for r in results}
        counts = Counter(r.status for r in results)
        badtypes = sum(1 for r in results if not r.type_ok)
        print(f"\n### {name}: {dict(counts)}  type-mismatch={badtypes}")
        shown = 0
        for r in results:
            if r.status in ("fail", "error") and shown < show:
                shown += 1
                q = " ".join(blocks[r.index].query.split())[:160]
                print(f"  [{r.index}] {r.status}: {r.reason}")
                print(f"      Q: {q}")
                for d in r.diffs[:3]:
                    print(f"      {d}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
