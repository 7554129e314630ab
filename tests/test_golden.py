"""Golden .test-file suite — the reference's QueryTest methodology
(tests/common/impala_test_suite.py; file format per
testdata/workloads/tpch/queries/tpch-q6.test) running Impala-dialect
SQL through the Engine against expectations stable at every scale
factor (region/nation are fixed-size)."""

from __future__ import annotations

import glob
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize(
    "path", sorted(glob.glob(f"{GOLDEN_DIR}/*.test")), ids=os.path.basename
)
def test_golden_file(engine, path):
    from incubator_impala_spark.testing.golden import run_golden_file

    failures = run_golden_file(engine, path)
    assert not failures, "\n".join(failures)
