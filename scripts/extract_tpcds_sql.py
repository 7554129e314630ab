"""Extract the public TPC-DS query texts carried by the reference.

Pulls the SQL body of the first ``---- QUERY: TPCDS-...`` section from
``/root/reference/testdata/workloads/tpcds/queries/tpcds-decimal_v2-q<label>.test``
(the SQL itself is the public TPC-DS benchmark text) and writes it to
``incubator_impala_spark/queries/tpcds_real_sql/q<label>.sql`` with the
provenance header the rest of the corpus uses.

Usage: python3 scripts/extract_tpcds_sql.py 2 5 14-1 10a ...
Existing files are never overwritten.
"""

from __future__ import annotations

import os
import re
import sys

REF_DIR = "/root/reference/testdata/workloads/tpcds/queries"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "incubator_impala_spark", "queries", "tpcds_real_sql")


def extract(label: str) -> str:
    path = os.path.join(REF_DIR, f"tpcds-decimal_v2-q{label}.test")
    with open(path) as f:
        text = f.read()
    m = re.search(r"^---- QUERY: TPCDS-[A-Z0-9_-]+\n(.*?)^----", text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        raise ValueError(f"no QUERY section in {path}")
    sql = m.group(1).strip().rstrip(";").strip()
    header = (
        f"-- TPC-DS q{label} (public benchmark query text, as carried by the\n"
        f"-- reference at testdata/workloads/tpcds/queries/"
        f"tpcds-decimal_v2-q{label}.test)\n")
    return header + sql + "\n"


def main() -> int:
    for label in sys.argv[1:]:
        out = os.path.join(OUT_DIR, f"q{label.replace('-', '_')}.sql")
        if os.path.exists(out):
            print(f"skip {out} (exists)")
            continue
        with open(out, "w") as f:
            f.write(extract(label))
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
