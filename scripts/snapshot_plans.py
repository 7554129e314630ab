"""Regenerate the golden explain-plan corpus (tests/golden_plans/).

Usage:
    python3 scripts/snapshot_plans.py [sf_dir] [name ...]

Run this ONLY when a plan change is intentional; the diff in git is
the review artifact (the reference workflow for PlannerTest .test
files is the same: regenerate, review the diff, commit).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incubator_impala_spark.session import get_spark  # noqa: E402
from incubator_impala_spark.testing import plansnap  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or None
    spark = get_spark("plan-snapshot", cpus=8)
    written = plansnap.snapshot(spark, sf_dir, names)
    for name in written:
        print(f"wrote {plansnap.golden_path(name)}")
    spark.stop()


if __name__ == "__main__":
    main()
