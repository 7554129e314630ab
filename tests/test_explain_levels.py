"""EXPLAIN levels 2/3 structure contract (impala_explain.py).

The reference's explain-level{2,3}.test pin absolute numbers from its
3-node minicluster cost model (xfailed, DIALECT.md); these tests pin
what this renderer guarantees instead: the EXTENDED/VERBOSE grammar —
fragment decomposition, DATASTREAM SINK headers, tuple-id/row-size/
cardinality ledger, pipeline annotations, per-node memory lines — over
honest estimates from the actual files.
"""
from __future__ import annotations

import re

import pytest


@pytest.fixture(scope="module")
def lines(engine):
    def run(level, sql):
        engine.sql(f"SET EXPLAIN_LEVEL={level}")
        try:
            return [r[0] for r in engine.sql("explain " + sql)
                    .collect()]
        finally:
            engine.sql("SET EXPLAIN_LEVEL=1")
    return run


JOIN_Q = ("select * from lineitem join orders "
          "on l_orderkey = o_orderkey")


def test_level2_fragments_interleaved(lines):
    out = lines(2, JOIN_Q)
    txt = "\n".join(out)
    # three fragments: coordinator + probe + broadcast build
    frags = re.findall(r"F(\d\d):PLAN FRAGMENT \[(\w+[^\]]*)\] "
                       r"hosts=(\d+) instances=(\d+)", txt)
    assert len(frags) == 3, txt
    assert frags[0][1] == "UNPARTITIONED" and frags[0][2] == "1"
    assert {f[1] for f in frags[1:]} == {"RANDOM"}
    assert "PLAN-ROOT SINK" in txt
    assert "Per-Host Resources: mem-estimate=" in txt
    # every plan node carries the ledger triple
    for nid in ("00:SCAN", "01:SCAN", "02:HASH JOIN", "03:EXCHANGE",
                "04:EXCHANGE"):
        assert nid in txt, txt
    assert len(re.findall(r"tuple-ids=[\d,]+ row-size=\d+B "
                          r"cardinality=", txt)) >= 5
    assert len(re.findall(r"in pipelines:", txt)) >= 5
    assert re.search(r"tuple-ids=0,1 row-size=\d+B", txt)  # join output
    # join pipelines: probe GETNEXT, build OPEN
    assert "in pipelines: 00(GETNEXT), 01(OPEN)" in txt
    assert re.search(r"mem-estimate=[\d.]+[KMG]?B "
                     r"mem-reservation=[\d.]+[KMG]?B "
                     r"spill-buffer=[\d.]+MB", txt)


def test_level3_fragment_sections(lines):
    out = lines(3, JOIN_Q)
    txt = "\n".join(out)
    # VERBOSE: disjoint sections, producers carry DATASTREAM SINK
    sinks = re.findall(r"DATASTREAM SINK \[FRAGMENT=F(\d\d), "
                       r"EXCHANGE=(\d\d), (\w+[^\]]*)\]", txt)
    assert len(sinks) == 2, txt
    modes = {s[2] for s in sinks}
    assert "BROADCAST" in modes and "UNPARTITIONED" in modes
    assert "  PLAN-ROOT SINK" in out
    assert any(re.match(r"\s+file formats: \[\w+", ln) for ln in out)
    # sections separated by blank lines, one per fragment
    assert txt.count("PLAN FRAGMENT") == 3
    assert "output exprs:" in txt


def test_level3_blocking_ops_new_pipeline(lines):
    out = lines(3, "select l_returnflag, sum(l_quantity) q "
                   "from lineitem group by l_returnflag "
                   "order by q desc")
    txt = "\n".join(out)
    # the agg and sort start their own pipelines: NN(GETNEXT), MM(OPEN)
    pips = re.findall(r"in pipelines: (\d\d)\(GETNEXT\), "
                      r"(\d\d)\(OPEN\)", txt)
    assert pips, txt
    # a hash-shuffle fragment is labeled with its feeding partition
    assert re.search(r"PLAN FRAGMENT \[HASH\(", txt), txt


def test_level2_scan_stored_statistics(lines):
    out = lines(2, "select l_orderkey from lineitem "
                   "where l_quantity < 5")
    txt = "\n".join(out)
    assert "stored statistics:" in txt
    assert re.search(r"table: rows=[\d.]+[KM]? size=", txt)
    assert "extrapolated-rows=disabled" in txt


def test_level2_ledger_deterministic_values(lines, engine):
    """The deterministic subset of the reference's level-2 ledger
    (VERDICT r8 #3 / explain-level2 adjudication): row-size derives
    from the schema's slot widths and scan cardinality from the
    parquet footers — exact values, not just grammar."""
    from incubator_impala_spark.sources.tables import parquet_num_rows

    from tests.conftest import SF_SMALL

    out = lines(2, "select o_orderkey, o_totalprice from orders")
    txt = "\n".join(out)
    n = parquet_num_rows(SF_SMALL, "orders")
    # bigint (8) + double/decimal slot (8) = 16B
    m = re.search(r"tuple-ids=\d+ row-size=(\d+)B cardinality=(\S+)",
                  txt)
    assert m, txt
    assert m.group(1) == "16", txt
    from incubator_impala_spark.impala_explain import _fmt_card

    assert m.group(2) == _fmt_card(n), (m.group(2), n)
