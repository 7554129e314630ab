"""The reference's own TPC-DS query texts, run end-to-end.

Each entry loads a near-verbatim public TPC-DS benchmark query text
(tpcds_real_sql/q*.sql, extracted from the reference's
testdata/workloads/tpcds/queries/ — the SQL is the public TPC-DS spec)
and runs it through the dialect shim against the committed DS-schema
fixture (fixtures/tpcds/), with the SAME text as a self-contained
DuckDB oracle. This closes the round-4 gap where TPC-DS coverage was
plan *shapes* adapted onto TPC-H tables: here the actual SQL executes.

Cross-engine determinism normalization (applied identically to BOTH
engines' texts, so they stay texts of the same query):

- ``avg(x)`` -> ``(cast(sum(x) as double) / count(x))``: Spark returns
  avg(decimal) as an exact decimal rounded to scale+4 while DuckDB
  returns a double; sum(decimal) is exact in both, so one double
  division is the bit-deterministic common form (repo-wide convention,
  see queries/tpch.py q1). Windowed ``avg(x) over (w)`` becomes the
  same quotient of windowed sum/count over the copied window spec.

Spark additionally gets the dialect translation (Impala null ordering,
registry macros) plus double-quoted identifier aliases rewritten to
backticks (``as "30 days"`` in q62/q99 — ANSI quoting that Spark's
default parser treats as a string literal).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from incubator_impala_spark.dialect import translate
from incubator_impala_spark.sources.tpcds import (
    duckdb_oracle_sql,
    register_tpcds,
)

_SQL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tpcds_real_sql")

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _balanced(text: str, start: int) -> int:
    """Index just past the ')' matching the '(' at ``start``."""
    depth, i = 0, start
    while i < len(text):
        c = text[i]
        if c == "'":
            i += 1
            while i < len(text) and text[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError(f"unbalanced parens at {start}")


def rewrite_avg(sql: str) -> str:
    """avg(x) -> (cast(sum(x) as double) / count(x)); windowed avg
    duplicates the window spec onto both the sum and the count."""
    out, i = [], 0
    pat = re.compile(r"\bavg\s*\(", re.IGNORECASE)
    while True:
        m = pat.search(sql, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i:m.start()])
        open_paren = sql.index("(", m.start())
        close = _balanced(sql, open_paren)
        arg = rewrite_avg(sql[open_paren + 1:close - 1]).strip()
        over_m = re.match(r"\s*over\s*\(", sql[close:], re.IGNORECASE)
        if over_m:
            w_open = close + over_m.end() - 1
            w_close = _balanced(sql, w_open)
            win = sql[w_open:w_close]
            out.append(
                f"(cast(sum({arg}) over {win} as double)"
                f" / count({arg}) over {win})")
            i = w_close
        else:
            out.append(f"(cast(sum({arg}) as double) / count({arg}))")
            i = close


def _quoted_idents_to_backticks(sql: str) -> str:
    # the benchmark texts use single quotes for all string literals;
    # double quotes only ever quote column aliases
    return re.sub(r'"([^"]*)"', r"`\1`", sql)


def load_text(qnum: int) -> str:
    with open(os.path.join(_SQL_DIR, f"q{qnum}.sql")) as f:
        lines = [ln for ln in f if not ln.lstrip().startswith("--")]
    return rewrite_avg("".join(lines).strip())


def _register(qnum: int) -> None:
    text = load_text(qnum)
    name = f"tpcds_real_q{qnum}"

    def fn(spark: SparkSession, sf_dir: str, _t=text) -> DataFrame:
        # sf_dir is intentionally unused: the DS fixture is its own
        # (fixed-size) dataset registered alongside the TPC-H tables
        register_tpcds(spark)
        return spark.sql(_quoted_idents_to_backticks(translate(_t)))

    fn.__name__ = name
    fn.__doc__ = (
        f"TPC-DS q{qnum}, near-verbatim reference query text "
        f"(testdata/workloads/tpcds/queries/) on the synthetic "
        f"DS-schema fixture, via the dialect shim.")
    QUERIES[name] = fn
    ORACLE_SQL[name] = duckdb_oracle_sql(text)


def available_qnums() -> list[int]:
    return sorted(int(f[1:-4]) for f in os.listdir(_SQL_DIR)
                  if re.fullmatch(r"q\d+\.sql", f))


for _q in available_qnums():
    _register(_q)
