"""Gap-UDF unit tests with fixed vectors — the reference's
expr-test.cc style (be/src/exprs/expr-test.cc) for the functions we
carry as pandas UDFs."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def fns(spark):
    from incubator_impala_spark.functions.udfs import register

    register(spark)
    return spark


def _one(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0].v


def test_fnv_hash_spec(fns):
    # FNV-1 64: h = seed; per byte: h = (h * prime) ^ byte
    seed, prime, mask = 0xCBF29CE484222325, 0x100000001B3, (1 << 64) - 1
    h = ((seed * prime) & mask) ^ ord("a")
    expected = h - (1 << 64) if h >= (1 << 63) else h
    assert _one(fns, "fnv_hash('a')") == expected


def test_murmur_hash_stable(fns):
    # value-stability: same input, same output, every call
    assert _one(fns, "murmur_hash('hello')") == _one(fns, "murmur_hash('hello')")
    assert _one(fns, "murmur_hash('hello')") != _one(fns, "murmur_hash('world')")


def test_damerau_levenshtein_osa(fns):
    # optimal-string-alignment: CA->ABC is 3 (true DL would be 2)
    assert _one(fns, "damerau_levenshtein('ca', 'abc')") == 3
    assert _one(fns, "damerau_levenshtein('kitten', 'sitting')") == 3
    # adjacent transposition costs 1
    assert _one(fns, "damerau_levenshtein('abcd', 'abdc')") == 1


def test_jaro_classic_vector(fns):
    assert _one(fns, "jaro_similarity('MARTHA', 'MARHTA')") == pytest.approx(
        0.9444444444444445
    )
    assert _one(fns, "jaro_distance('MARTHA', 'MARHTA')") == pytest.approx(
        1 - 0.9444444444444445
    )


def test_jaro_winkler_classic_vector(fns):
    assert _one(fns, "jaro_winkler_similarity('MARTHA', 'MARHTA')") == pytest.approx(
        0.9611111111111111
    )


def test_nulls_propagate(fns):
    assert _one(fns, "fnv_hash(NULL)") is None
    assert _one(fns, "jaro_similarity(NULL, 'x')") is None
    assert _one(fns, "damerau_levenshtein(NULL, 'x')") is None
