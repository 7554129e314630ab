"""The local mirror of the driver's correctness gate.

Every entry in the registry is executed on Spark and (when an oracle
exists) on DuckDB at sf0.001, comparing row count + columns +
order-insensitive values — the same contract CORRECTNESS_r{N}.json
grades at sf0.01. Mirrors the reference's differential-testing layer
(tests/comparison/discrepancy_searcher.py).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def _all_query_names():
    from incubator_impala_spark.queries import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _all_query_names())
def test_query_parity(spark, name):
    from incubator_impala_spark.queries import ORACLE_SQL
    from incubator_impala_spark.testing.oracle import check_query

    problems = check_query(spark, name, SF_SMALL)
    assert not problems, f"{name}: {problems}"
    if name not in ORACLE_SQL:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
