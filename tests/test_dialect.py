"""Dialect-shim unit tests — mirror of the reference's ParserTest /
ExprRewriteRulesTest layer (fe/src/test/java/org/apache/impala/...):
macro expansion with balanced-paren parsing, Impala NULL-ordering
defaults, and end-to-end Engine.sql execution."""

from __future__ import annotations

from incubator_impala_spark import dialect
from incubator_impala_spark.functions.registry import MACROS


def tr(sql: str) -> str:
    return dialect.translate(sql, MACROS)


def test_macro_simple():
    assert tr("SELECT zeroifnull(x) FROM t") == "SELECT coalesce(x, 0) FROM t"


def test_macro_nested_call():
    out = tr("SELECT zeroifnull(nullifzero(a + b)) FROM t")
    assert out == "SELECT coalesce(nullif(a + b, 0), 0) FROM t"


def test_macro_args_with_commas_in_parens():
    out = tr("SELECT isnull(f(a, b), g(c, d)) FROM t")
    assert out == "SELECT coalesce(f(a, b), g(c, d)) FROM t"


def test_macro_string_arg_with_paren():
    out = tr("SELECT strleft(concat(a, ')('), 3) FROM t")
    assert out == "SELECT left(concat(a, ')('), 3) FROM t"


def test_macro_case_insensitive():
    assert "coalesce" in tr("SELECT ZEROIFNULL(x) FROM t")


def test_macro_not_applied_to_substring_names():
    # 'myzeroifnull' must not be rewritten
    out = tr("SELECT myzeroifnull(x) FROM t")
    assert out == "SELECT myzeroifnull(x) FROM t"


def test_null_ordering_asc_gets_nulls_last():
    out = tr("SELECT a FROM t ORDER BY a ASC")
    assert "NULLS LAST" in out


def test_null_ordering_desc_gets_nulls_first():
    out = tr("SELECT a FROM t ORDER BY a DESC")
    assert "NULLS FIRST" in out


def test_null_ordering_explicit_untouched():
    sql = "SELECT a FROM t ORDER BY a ASC NULLS FIRST"
    assert "NULLS FIRST" in tr(sql) and "NULLS LAST" not in tr(sql)


def test_engine_sql_end_to_end(engine):
    df = engine.sql(
        "SELECT strleft(c_name, 8) AS pfx, zeroifnull(NULL) AS z "
        "FROM customer LIMIT 1"
    )
    row = df.collect()[0]
    assert row.pfx == "Customer" and row.z == 0


def test_engine_null_ordering_semantics(engine):
    """Impala ASC => NULLS LAST (OrderByElement.java:74-85), opposite
    of Spark's default — verify rows actually come back that way."""
    engine.spark.sql(
        "SELECT * FROM VALUES (1), (NULL), (2) AS t(v)"
    ).createOrReplaceTempView("null_t")
    vals = [r.v for r in engine.sql("SELECT v FROM null_t ORDER BY v ASC").collect()]
    assert vals == [1, 2, None]
    vals = [r.v for r in engine.sql("SELECT v FROM null_t ORDER BY v DESC").collect()]
    assert vals == [None, 2, 1]


def test_cast_format_clause_translation():
    out = tr("SELECT CAST(ts AS STRING FORMAT 'YYYY-MM-DD') FROM t")
    assert out == "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    out = tr("SELECT CAST(ts AS STRING FORMAT 'DD Month YYYY HH24:MI:SS') FROM t")
    assert out == "SELECT date_format(ts, 'dd MMMM yyyy HH:mm:ss') FROM t"


def test_cast_format_end_to_end(engine):
    row = engine.sql(
        "SELECT CAST(TIMESTAMP '2024-02-29 13:05:07' AS STRING "
        "FORMAT 'YYYY-MM-DD HH24:MI:SS') AS s, "
        "CAST(DATE '2024-01-01' AS STRING FORMAT 'DY DD Mon YYYY') AS d"
    ).collect()[0]
    assert row.s == "2024-02-29 13:05:07"
    assert row.d == "Mon 01 Jan 2024"


def test_cast_without_format_untouched():
    sql = "SELECT CAST(x AS STRING) FROM t"
    assert tr(sql) == sql
