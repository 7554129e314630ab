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


def test_parse_url_native(spark):
    """parse_url is native in Spark (reference: string registry,
    SURVEY.md §2.11) — no DuckDB twin, so unit-tested here."""
    r = spark.sql(
        "SELECT parse_url('https://h.example.com:8080/a/b?q=1&x=2#f', 'HOST') AS h,"
        " parse_url('https://h.example.com:8080/a/b?q=1&x=2#f', 'PATH') AS p,"
        " parse_url('https://h.example.com:8080/a/b?q=1&x=2#f', 'QUERY', 'x') AS x"
    ).collect()[0]
    assert (r.h, r.p, r.x) == ("h.example.com", "/a/b", "2")


def test_conv_base_conversion(spark):
    r = spark.sql(
        "SELECT conv('ff', 16, 10) AS a, conv('255', 10, 16) AS b, "
        "conv('1010', 2, 10) AS c"
    ).collect()[0]
    assert (r.a, r.b, r.c) == ("255", "FF", "10")


def test_base64_roundtrip(spark):
    r = spark.sql(
        "SELECT base64('hello') AS e, CAST(unbase64(base64('hello')) AS STRING) AS d"
    ).collect()[0]
    assert r.e == "aGVsbG8=" and r.d == "hello"


def test_get_json_object_nested(spark):
    r = spark.sql(
        """SELECT get_json_object('{"a": {"b": [1, 2, {"c": "x"}]}}', '$.a.b[2].c') AS v,
           get_json_object('{"a": {"b": [1, 2]}}', '$.a.b[1]') AS n"""
    ).collect()[0]
    assert r.v == "x" and r.n == "2"
