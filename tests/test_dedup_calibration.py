"""Calibration of the approximate dedup operators against the exact
baseline — parity with an oracle proves determinism, not quality
(the LSH recall bug taught that); these tests pin the recall the
approximations actually deliver on the planted near-duplicates."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    from incubator_impala_spark.sources.tables import load_table

    return load_table(spark, SF_SMALL, "documents")


def test_minhash_lsh_finds_high_jaccard_pairs(spark, docs):
    """Banding theory: with 4 bands of 4 hashes, a pair at jaccard
    >= 0.8 is caught with prob ~0.99 — on the planted corpus the LSH
    path must recover every exact pair at 0.8, and every LSH-verified
    pair must also be in the exact result (verification is exact, so
    precision is 1 by construction)."""
    from incubator_impala_spark.operators import dedup

    exact = {
        (r.d1, r.d2): r.jac
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    approx = {
        (r.d1, r.d2): r.jac
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    high = {k for k, j in exact.items() if j >= 0.8}
    assert high, "corpus should contain planted near-duplicates"
    missed = high - set(approx)
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"
    assert set(approx) <= set(exact)
    # and identical jaccard values where both found the pair
    for k in set(approx) & set(exact):
        assert approx[k] == exact[k]


def test_simhash_find_rate_on_planted_pairs(spark, docs):
    """SimHash at hamming <= 6 is a different similarity geometry
    (token multiset vs shingle set); measure its hit rate on the
    exact jaccard >= 0.8 pairs and pin a floor."""
    from incubator_impala_spark.operators import dedup

    exact = {
        (r.d1, r.d2)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    assert exact
    docs.createOrReplaceTempView("documents")
    sim = {
        (r.d1, r.d2)
        for r in spark.sql(dedup.simhash_pair_sql("spark", max_hamming=6)).collect()
    }
    hit_rate = len(exact & sim) / len(exact)
    assert hit_rate >= 0.5, f"simhash hit rate on planted pairs: {hit_rate:.2f}"
