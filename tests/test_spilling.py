"""Correct-results-under-memory-pressure (reference basic-spilling /
spilling-aggs / spilling-large-rows; be/src/runtime/sorter.cc,
be/src/exec/grouping-aggregator.h:47-80).

spark.memory.fraction and driver heap are JVM-start settings, so the
constrained run happens in a subprocess (scripts/run_spilling_probe
.py): ~120 MB execution+storage budget against dbgen-sf1 working sets,
five query shapes from the reference files (wide DISTINCT, grouped
aggs incl. string keys, global sort). Asserts every result matches
DuckDB over the same parquet AND that the event log records actual
spill bytes — spilled, not OOMed, not wrong.

The reference's BUFFER_POOL_LIMIT / DEFAULT_SPILLABLE_BUFFER_SIZE
knobs and SpilledPartitions profile counters are daemon-level
accounting with no Spark analogue (COVERAGE.md adjudication); the
result-correctness contract is what transfers.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "fixtures", "_cache", "tpch_sf1", "flat")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(SF1, "lineitem.parquet")),
    reason="dbgen sf1 fixture not generated")
def test_spilling_correct_results_under_pressure():
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "run_spilling_probe.py")],
        capture_output=True, text=True, timeout=900)
    last = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(last)
    assert res["matched"] == res["queries"] == 5, (res, out.stderr[-2000:])
    assert res["spilled_bytes"] > 0, res
