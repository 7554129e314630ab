"""Extract the public TPC-H query texts carried by the reference.

Pulls the SQL body of the first ``---- QUERY: TPCH-...`` section from
``/root/reference/testdata/workloads/tpch/queries/tpch-q<n>.test``
(the SQL itself is the public TPC-H benchmark text) and writes it to
``incubator_impala_spark/queries/tpch_real_sql/q<n>.sql`` with the
provenance header the TPC-DS corpus uses.

Usage: python3 scripts/extract_tpch_sql.py 1 2 3 ...
Existing files are never overwritten.
"""

from __future__ import annotations

import os
import re
import sys

REF_DIR = "/root/reference/testdata/workloads/tpch/queries"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "incubator_impala_spark", "queries", "tpch_real_sql")


def extract(label: str) -> str:
    path = os.path.join(REF_DIR, f"tpch-q{label}.test")
    with open(path) as f:
        text = f.read()
    m = re.search(r"^---- QUERY: TPCH-[A-Z0-9_-]+\n(.*?)^----", text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        raise ValueError(f"no QUERY section in {path}")
    body = m.group(1)
    lines = [ln for ln in body.splitlines()
             if not ln.lstrip().startswith("#")]
    sql = "\n".join(lines).strip().rstrip(";").strip()
    header = (
        f"-- TPC-H q{label} (public benchmark query text, as carried by the\n"
        f"-- reference at testdata/workloads/tpch/queries/"
        f"tpch-q{label}.test)\n")
    return header + sql + "\n"


def main() -> int:
    os.makedirs(OUT_DIR, exist_ok=True)
    for label in sys.argv[1:]:
        out = os.path.join(OUT_DIR, f"q{label}.sql")
        if os.path.exists(out):
            print(f"skip {out} (exists)")
            continue
        with open(out, "w") as f:
            f.write(extract(label))
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
