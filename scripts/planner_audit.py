"""Planner-decision parity spot-audit (VERDICT r5 "Missing #5").

For a set of representative TPC-DS queries, compare the join
DISTRIBUTION strategy Spark picks on this repo's fixture against the
reference planner's recorded expectation
(testdata/workloads/functional-planner/queries/PlannerTest/tpcds/
tpcds-qNN.test, DISTRIBUTEDPLAN section): the reference marks each
HASH JOIN as BROADCAST or PARTITIONED; Spark's analogues are
BroadcastHashJoin vs SortMergeJoin/ShuffledHashJoin.

Stats differ (the reference plans against its 1 GB tpcds_parquet load,
we plan against the committed synthetic fixture), so the comparison is
a qualitative audit — the output table goes to SCALE.md with notes.

    python3 scripts/planner_audit.py q03 q07 q16 ...
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PT = ("/root/reference/testdata/workloads/functional-planner/queries/"
      "PlannerTest/tpcds")

DEFAULT = ["q03", "q07", "q16", "q19", "q25", "q34", "q42", "q52",
           "q64", "q98"]


def reference_joins(q: str) -> list[str]:
    """Join distribution markers from the DISTRIBUTEDPLAN section."""
    path = os.path.join(PT, f"tpcds-{q}.test")
    text = open(path).read()
    m = re.search(r"---- DISTRIBUTEDPLAN(.*?)(?:\n====|\n----|$)",
                  text, re.DOTALL)
    section = m.group(1) if m else ""
    out = []
    for jm in re.finditer(
            r"HASH JOIN \[(\w+(?:\s+\w+)*) JOIN(?:, (\w+))?\]", section):
        out.append(jm.group(2) or "?")
    nlj = len(re.findall(r"NESTED LOOP JOIN", section))
    return out + ["NLJ"] * nlj


def spark_joins(spark, name: str) -> list[str]:
    from incubator_impala_spark.queries import QUERIES

    df = QUERIES[name](spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for line in plan.split("\n"):
        if "BroadcastHashJoin" in line:
            out.append("BROADCAST")
        elif "SortMergeJoin" in line or "ShuffledHashJoin" in line:
            out.append("PARTITIONED")
        elif "BroadcastNestedLoopJoin" in line:
            out.append("NLJ-B")
        elif "CartesianProduct" in line:
            out.append("NLJ")
    return out


def main() -> None:
    qs = sys.argv[1:] or DEFAULT
    from incubator_impala_spark.session import get_spark

    spark = get_spark("planner-audit")
    print("| query | reference joins (distributed plan) | spark joins |")
    print("|---|---|---|")
    from collections import Counter

    for q in qs:
        ref = reference_joins(q)
        name = "tpcds_real_q" + q.lstrip("q").lstrip("0")
        try:
            sp = spark_joins(spark, name)
        except Exception as e:  # noqa: BLE001
            sp = [f"ERR {type(e).__name__}"]

        def fmt(lst):
            c = Counter(lst)
            return ", ".join(f"{k}x{v}" for k, v in sorted(c.items()))

        print(f"| {q} | {fmt(ref)} | {fmt(sp)} |", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
