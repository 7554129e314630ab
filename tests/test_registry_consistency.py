"""Registry hygiene: the driver contract's internal consistency."""

from __future__ import annotations


def test_every_oracle_has_a_query():
    from incubator_impala_spark.queries import ORACLE_SQL, QUERIES

    missing = set(ORACLE_SQL) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_rows_only_entries_are_documented_exceptions():
    """Only genuinely non-SQL-expressible ops may omit an oracle."""
    from incubator_impala_spark.queries import ORACLE_SQL, QUERIES

    rows_only = set(QUERIES) - set(ORACLE_SQL)
    assert rows_only <= {"tablesample_system"}, rows_only


def test_bench_queries_exist():
    import bench

    from incubator_impala_spark.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing


def test_query_names_are_stable_identifiers():
    import re

    from incubator_impala_spark.queries import QUERIES

    for name in QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name
