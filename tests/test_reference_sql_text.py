"""The reference's own TPC-H SQL text (as in
testdata/workloads/tpch/queries/tpch-q*.test) must run through
Engine.sql verbatim-modulo-schema and agree with the DataFrame corpus
entries — proving a reference user can paste their queries in."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

# date window shifted to the synthetic data's range (the reference's
# 1994 predicate selects zero rows here); everything else is verbatim.
Q6_TEXT = """
select sum(l_extendedprice * l_discount) as revenue
from lineitem
where l_shipdate >= '1997-01-01'
  and l_shipdate < '1998-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
"""

Q1_TEXT = """
select l_returnflag, l_linestatus,
  sum(l_quantity) as sum_qty,
  sum(l_extendedprice) as sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
  avg(l_quantity) as avg_qty,
  avg(l_extendedprice) as avg_price,
  avg(l_discount) as avg_disc,
  count(*) as count_order
from lineitem
where l_shipdate <= '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
"""


@pytest.fixture(scope="module")
def eng(spark):
    from incubator_impala_spark.engine import Engine

    return Engine(spark, sf_dir=SF_SMALL)


def test_reference_q6_text_runs_and_agrees(eng):
    got = eng.sql(Q6_TEXT).collect()[0].revenue
    # the corpus entry computes the same thing in exact decimals
    from incubator_impala_spark.queries import QUERIES

    want = QUERIES["tpch_q6"](eng.spark, SF_SMALL).collect()[0]
    want_val = float([v for v in want][0])
    assert got == pytest.approx(want_val, rel=1e-9)


def test_reference_q1_text_runs_and_agrees(eng):
    got = eng.sql(Q1_TEXT).collect()
    from incubator_impala_spark.queries import QUERIES

    want = QUERIES["tpch_q1"](eng.spark, SF_SMALL).orderBy(
        "l_returnflag", "l_linestatus"
    ).collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.l_returnflag, g.l_linestatus) == (w.l_returnflag, w.l_linestatus)
        assert g.count_order == w.count_order
        assert g.sum_qty == pytest.approx(float(w.sum_qty), rel=1e-9)
        assert g.sum_charge == pytest.approx(float(w.sum_charge), rel=1e-9)
        assert g.avg_disc == pytest.approx(float(w.avg_disc), abs=1e-6)
