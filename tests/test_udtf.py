"""Python UDTF surface (SURVEY.md §2.12: the reference has no UDTFs —
Spark's Python UDTF is a bonus capability). One table function:
ngram expansion with positions, registered SQL-callable and used via
LATERAL join."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def ngrams_udtf(spark):
    try:
        from pyspark.sql.functions import udtf
    except ImportError:
        pytest.skip("UDTF API not available in this Spark build")

    @udtf(returnType="pos: int, ngram: string")
    class Ngrams:
        def eval(self, text: str, n: int):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(max(0, len(toks) - n + 1)):
                yield i, " ".join(toks[i : i + n])

    spark.udtf.register("ngrams", Ngrams)
    return "ngrams"


def test_udtf_direct_call(spark, ngrams_udtf):
    rows = spark.sql(
        "SELECT * FROM ngrams('a b c d', 2) ORDER BY pos"
    ).collect()
    assert [(r.pos, r.ngram) for r in rows] == [
        (0, "a b"), (1, "b c"), (2, "c d"),
    ]


def test_udtf_lateral_join(spark, ngrams_udtf):
    from tests.conftest import SF_SMALL

    from incubator_impala_spark.sources.tables import load_table

    load_table(spark, SF_SMALL, "documents").where(
        "doc_id < 3"
    ).createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM docs_udtf d, LATERAL ngrams(d.text, 3) g
        WHERE g.pos < 2
        ORDER BY d.doc_id, g.pos
        """
    ).collect()
    assert len(rows) == 6  # 3 docs × first 2 trigram positions
    assert all(len(r.ngram.split(" ")) == 3 for r in rows)


def test_udtf_null_input(spark, ngrams_udtf):
    assert spark.sql("SELECT * FROM ngrams(NULL, 2)").count() == 0
