"""The reference's TPC-H workload corpus — queries AND recorded sf1
answers — against this engine on the dbgen sf1 fixture.

Direct reference parity with no oracle in between: the .test files
under testdata/workloads/tpch/queries/ carry the reference engine's
recorded results over its dbgen-loaded TPC-H sf1 database, which
sources/tpch_ref.py regenerates (DuckDB's dbgen — keys, dates and
prices bit-identical; RNG text columns differ, see xfails). Date
columns register as STRING, the reference's own TPC-H schema typing
(tpch_schema_template.sql).

xfail reason codes:
  dbgen-text-variant  the pinned rows/counts depend on dbgen's RNG
                      text streams in a way that changes WHICH rows
                      qualify (o_comment filters in q13/outer-joins,
                      count(distinct p_comment/o_comment) checksums);
                      DIALECT.md dbgen-comment-variant

r10: q2/q10/q15/q20 (flat, nested, masked twins) moved OFF floor 0 —
their divergence is confined to DISPLAY columns (s_address/c_address/
s_comment/c_comment; probed column-by-column: every key, name, phone,
revenue and the q20 p_name 'forest%%' filter match the recorded rows
exactly), so they verify through run_blocks mask_cols with only those
columns masked. q13 stays xfailed: its o_comment FILTER changes the
distribution itself. The exact dbgen delta: DuckDB's dbgen is
spec-deterministic for every keyed/numeric/date stream but seeds its
V-string (address) and text-grammar (comment) generators differently
from the official TPC-H dbgen build the reference loaded; no dbgen
binary or dists.dss ships in this environment to regenerate them.
"""

from __future__ import annotations

import collections
import os

import pytest

TPCH_DIR = "/root/reference/testdata/workloads/tpch/queries"

# file -> (floor, xfail[, mask_cols])
FILES: dict[str, tuple] = {
    **{f"tpch-q{i}": (1, {}) for i in (1, 3, 4, 5, 6, 7, 8, 9, 11,
                                       12, 14, 16, 17, 18, 19, 21,
                                       22)},
    # masked display columns (see module doc): {block: [positions]}
    "tpch-q2": (1, {}, {0: [5, 7]}),     # s_address, s_comment
    "tpch-q10": (1, {}, {0: [5, 7]}),    # c_address, c_comment
    "tpch-q13": (0, {0: "dbgen-text-variant"}),
    "tpch-q15": (1, {}, {0: [2]}),       # s_address
    "tpch-q20": (1, {}, {0: [1]}),       # s_address
    "tpch-aggregations": (1, {}),
    # lineitem self-join multi-distinct, wide-tuple count distinct,
    # low-cardinality two-phase distinct — all value-deterministic
    "tpch-stress-aggregations": (3, {}),
    # count/sum verbatim; the l_comment murmur checksum pins the
    # official dbgen's comment bytes
    "tpch-scan-range-lengths": (2, {2: "dbgen-text-variant"}),
    # 1.5M-row INSERT OVERWRITE + value verification, IMPALA-1705
    # >64KB string values round-trip, IMPALA-8257 multi-page empty
    # strings; the o_comment distinct-count pins comment text
    "insert_parquet": (8, {6: "dbgen-text-variant"}),
    "tpch-passthrough-aggregations": (1, {2: "dbgen-text-variant"}),
    "tpch-outer-joins": (2, {3: "dbgen-text-variant"}),
    "min-multiple-distinct-aggs": (1, {}),
    # block 3 groups the functional fixture's alltypes
    "limit-pushdown-analytic": (4, {}),
}


@pytest.fixture(scope="module")
def tpch_engine(engine):
    from incubator_impala_spark.sources.functional import (
        register_functional,
    )

    register_functional(engine.spark)
    try:
        from incubator_impala_spark.sources.tpch_ref import (
            register_tpch_ref,
        )

        register_tpch_ref(engine.spark)
    except Exception as exc:  # noqa: BLE001 — extension absent
        pytest.skip(f"tpch_ref sf1 fixture unavailable: {exc}")
    return engine


NESTED_DIR = "/root/reference/testdata/workloads/tpch_nested/queries"

# the same 22 queries over the reference's NESTED TPC-H schema
# (tpch_nested_parquet: customer.c_orders.o_lineitems,
# supplier.s_partsupps, region.r_nations — load_nested.py), with
# recorded sf1 answers. q21 exercises the correlated-EXISTS-over-
# sibling-collection HOF translation end-to-end; q13 the row-local
# collection-ON filter. The 7 masked-* variants run against the
# tpch_masked_* views (the reference's Ranger column-masking policies
# re-expressed — sources/tpch_ref._register_masked_views).
NESTED_FILES: dict[str, tuple] = {
    **{f"tpch_nested-q{i}": (1, {}) for i in (1, 3, 4, 5, 6, 7, 8, 9,
                                              11, 12, 14, 16, 17, 18,
                                              19, 21, 22)},
    "tpch_nested-q2": (1, {}, {0: [5, 7]}),
    "tpch_nested-q10": (1, {}, {0: [5, 7]}),
    # o_comment filter: one order's comment text differs (custdist
    # off by one at c_count=0)
    "tpch_nested-q13": (0, {0: "dbgen-text-variant"}),
    "tpch_nested-q15": (1, {}, {0: [2]}),
    "tpch_nested-q20": (1, {}, {0: [1]}),
    # the Ranger-masked variants (PII columns masked via
    # tpch_masked_* views — sources/tpch_ref._register_masked_views):
    # q9 returns no rows (p_name masked kills the %green% filter),
    # q18/q20/q21 collapse to the masked-name groups — deterministic;
    # q2/q10/q15 print masked ADDRESSES, whose per-character
    # class pattern still tracks dbgen's RNG address bytes
    "masked-tpch_nested-q9": (1, {}),
    "masked-tpch_nested-q18": (1, {}),
    "masked-tpch_nested-q21": (1, {}),
    "masked-tpch_nested-q20": (1, {}),
    "masked-tpch_nested-q2": (1, {}, {0: [5, 7]}),
    "masked-tpch_nested-q10": (1, {}, {0: [5, 7]}),
    "masked-tpch_nested-q15": (1, {}, {0: [2]}),
}

_MASKED_REWRITES = {
    "customer": "tpch_masked_customer",
    "region": "tpch_nested_region",
    "supplier": "tpch_masked_supplier",
    "part": "tpch_masked_part",
}

_NESTED_REWRITES = {
    "customer": "tpch_nested_customer",
    "region": "tpch_nested_region",
    "supplier": "tpch_nested_supplier",
    "part": "tpch_nested_part",
}


@pytest.mark.skipif(not os.path.isdir(TPCH_DIR),
                    reason="reference workload texts not present")
@pytest.mark.parametrize(
    "name", sorted(FILES) + sorted(NESTED_FILES), ids=str)
def test_tpch_workload_file(tpch_engine, name):
    from incubator_impala_spark.sources.tpch_ref import FLAT_TABLES
    from incubator_impala_spark.testing import querytest as qt

    nested = name in NESTED_FILES
    entry = (NESTED_FILES if nested else FILES)[name]
    min_pass, xfail = entry[0], entry[1]
    mask_cols = entry[2] if len(entry) > 2 else None
    # qualifier spellings first (tpch./tpch_parquet. are format
    # variants of the same sf1 dataset), then plain names
    if name.startswith("masked-"):
        rewrites = _MASKED_REWRITES
    elif nested:
        rewrites = _NESTED_REWRITES
    else:
        rewrites = {r"tpch(_parquet)?\.": "tpch_ref_",
                    **{t: f"tpch_ref_{t}" for t in FLAT_TABLES}}
    blocks = qt.parse_test_file(os.path.join(
        NESTED_DIR if nested else TPCH_DIR, f"{name}.test"))
    results = qt.run_blocks(tpch_engine, blocks, xfail=xfail,
                            table_rewrites=rewrites,
                            database="qtest_tpch_workload",
                            mask_cols=mask_cols)
    counts = collections.Counter(r.status for r in results)
    problems = []
    for r in results:
        if r.status in ("fail", "error"):
            q = " ".join(blocks[r.index].query.split())[:140]
            problems.append(
                f"[{r.index}] {r.status}: {r.reason}\n    Q: {q}\n    "
                + "\n    ".join(str(d) for d in r.diffs[:3]))
        elif r.status == "xpass":
            problems.append(f"[{r.index}] xpass — remove stale xfail "
                            f"({r.reason})")
    assert not problems, (
        f"{name}.test: {dict(counts)}\n" + "\n".join(problems))
    assert counts.get("pass", 0) >= min_pass, (
        f"{name}.test pass floor regressed: "
        f"{counts.get('pass', 0)} < {min_pass} ({dict(counts)})")
