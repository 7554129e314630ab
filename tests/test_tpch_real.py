"""The reference's own TPC-H query texts against the committed
full-schema fixture, spot-checked vs DuckDB (the full 22-entry sweep
runs in scripts/bitexact_sweep.py; this suite keeps a representative
subset in the default pytest gate).

Reference parity: testdata/workloads/tpch/queries/tpch-q*.test carry
the same texts; RESULTS sections there apply to dbgen data, so
correctness here is established against DuckDB on the same parquet.
"""

from __future__ import annotations

import duckdb
import pytest

from incubator_impala_spark.queries.tpch_real import ORACLE_SQL
# registry-wrapped callables (decimal->double repr normalization)
from incubator_impala_spark.queries import QUERIES
from tests.conftest import SF_SMALL

# one per family: pricing-summary agg, min-cost correlated subquery,
# exists, group-ratio share, CTE + scalar max, NOT-IN + complaints
# filter, large-order IN-subquery, orderless-customer anti-join
SPOT = ["tpch_real_q1", "tpch_real_q2", "tpch_real_q4",
        "tpch_real_q8", "tpch_real_q15", "tpch_real_q16",
        "tpch_real_q18", "tpch_real_q22"]


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_registry_covers_all_22_queries():
    import re

    from incubator_impala_spark.queries import tpch_real as _mod
    assert set(ORACLE_SQL) == set(_mod.QUERIES)
    nums = {int(re.search(r"q(\d+)", n).group(1)) for n in ORACLE_SQL}
    assert nums == set(range(1, 23))


def test_every_oracle_returns_rows(con):
    empty = [n for n, sql in ORACLE_SQL.items()
             if len(con.execute(sql).df()) == 0]
    assert not empty, f"zero-row oracles: {empty}"


def _sweep_compare():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "bitexact_sweep.py")
    spec = importlib.util.spec_from_file_location("bitexact_sweep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.compare


@pytest.mark.parametrize("name", SPOT)
def test_tpch_real_vs_oracle(spark, con, name):
    spark_pdf = QUERIES[name](spark, SF_SMALL).toPandas()
    oracle_pdf = con.execute(ORACLE_SQL[name]).df()
    assert len(spark_pdf) > 0, f"{name}: empty result is a weak test"
    problems = _sweep_compare()(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: {problems}"
