"""Unit tests for the generic as-of join API and incremental dedup."""

from __future__ import annotations


def test_asof_join_inclusive_and_carry(spark):
    from incubator_impala_spark.operators.asof import asof_join

    # tiebreak must be a unique column present on BOTH sides (contract)
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 101), (2, 15, 102), (3, 5, 103)],
        "k int, ts int, uid int",
    )
    right = spark.createDataFrame(
        [(1, 10, 200, "a"), (1, 15, 201, "b"), (2, 20, 202, "c")],
        "k int, ts int, uid int, payload string",
    )
    out = {
        (r.k, r.ts, r.asof_payload)
        for r in asof_join(
            left, right, key="k", ts="ts", payload=["payload"], tiebreak="uid"
        ).collect()
    }
    # k=1 ts=10: right@10 inclusive -> 'a'; ts=20: latest right@15 -> 'b'
    # k=2 ts=15: right only at 20 (future) -> NULL; k=3: no right -> NULL
    assert out == {(1, 10, "a"), (1, 20, "b"), (2, 15, None), (3, 5, None)}


def test_asof_join_preserves_left_rows(spark):
    from incubator_impala_spark.operators.asof import asof_join

    left = spark.range(100).selectExpr(
        "CAST(id % 5 AS INT) AS k", "CAST(id AS INT) AS ts", "id AS uid"
    )
    right = spark.range(10).selectExpr(
        "CAST(id % 5 AS INT) AS k", "CAST(id * 7 AS INT) AS ts",
        "id + 1000 AS uid", "CAST(id AS STRING) AS payload",
    )
    joined = asof_join(left, right, key="k", ts="ts",
                       payload=["payload"], tiebreak="uid")
    assert joined.count() == 100


def test_incremental_dedup_excludes_seen(spark):
    from pyspark.sql import functions as F

    from incubator_impala_spark.operators.dedup import incremental_dedup

    seen_docs = spark.createDataFrame(
        [("hello world",), ("doc two",)], "text string"
    )
    seen = seen_docs.select(F.md5("text").alias("h"))
    batch = spark.createDataFrame(
        [(1, "hello world"), (2, "fresh doc"), (3, "doc two"), (4, "another")],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in incremental_dedup(batch, seen).collect()}
    assert kept == {2, 4}


def test_lsh_topk_recall_calibration(spark):
    """The hyperplane-LSH approximation must be *calibrated*: measure
    recall@5 against brute force on the test corpus (multi-table LSH:
    4 bands x 4 planes). The floor documents the measured trade —
    raise recall with more bands, cut compute with more planes per
    band; candidates are always scored exactly."""
    from incubator_impala_spark.operators.similarity import cosine_topk, lsh_topk
    from incubator_impala_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.where("vec_id % 25 = 0")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(emb, queries, dim=64, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    # measured ~0.56 with 4 bands x 4 planes on this corpus
    assert recall >= 0.4, f"recall@5 collapsed: {recall:.3f}"
    # and every approx neighbor must be a genuine bucket-mate scored
    # exactly, so precision of returned sims is 1 by construction
    assert len(approx) > 0
