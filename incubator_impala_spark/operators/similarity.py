"""Similarity search over embedding columns.

Brute-force cosine top-k (exact baseline) and a hyperplane-LSH
bucketed variant (the scale path): at 100 TB you broadcast the query
set, bucket the corpus once by deterministic hyperplane signs, and
probe only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_impala_spark.operators.dedup import dot_product, vec_norm


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact top-k neighbors per query by cosine (self excluded).

    Plan shape: broadcast(queries) ⋈ corpus (one corpus pass, no
    shuffle of the corpus), then per-query top-k via window — ties
    broken by neighbor id for determinism. Norms are computed once per
    row, not per pair (same fold order → bit-identical sims, 3× less
    lambda eval).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(vec_col).alias("qn"),
    )
    # spread the corpus: the per-row cosine is a higher-order-function
    # eval (not codegen'd), so a single-split corpus would serialize
    # the whole scoring pass onto one core; hash-repartitioning is a
    # cheap shuffle of (id, vector) rows and at 100 TB matches the
    # natural many-split layout anyway.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(vec_col).alias("cn"),
    ).repartition(F.col("neighbor_id"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (dot_product("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
                F.col("sim"))
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH (deterministic, seedless): plane p's component for
# dimension d is derived from md5(p||d) — reproducible across runs,
# engines, and cluster sizes with no RNG state to ship.
# ---------------------------------------------------------------------------

LSH_PLANES = 8


def _plane_component(p: int, d: int) -> float:
    import hashlib

    h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
    # map 8 hex chars to [-1, 1)
    return int(h[:8], 16) / float(1 << 31) - 1.0


def lsh_bucket(df: DataFrame, dim: int, vec_col: str = "embedding",
               planes: int = LSH_PLANES) -> DataFrame:
    """Attach an LSH bucket id: sign pattern of `planes` fixed random
    hyperplanes. Buckets are computed JVM-side from literal plane
    vectors (broadcast as constants into codegen)."""
    bucket = F.lit(0)
    for p in range(planes):
        comps = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The approximation path for 100 TB corpora — the bucket equi-join
    replaces the all-pairs cross join; recall is tuned by `planes`
    (fewer planes → bigger buckets → higher recall, more compute).
    """
    cb = lsh_bucket(corpus.repartition(F.col(id_col)), dim, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(vec_col).alias("cn"), "lsh_bucket",
    )
    qb = lsh_bucket(queries, dim, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(vec_col).alias("qn"),
        F.col("lsh_bucket").alias("qbucket"),
    )
    scored = (
        cb.join(F.broadcast(qb),
                (F.col("lsh_bucket") == F.col("qbucket"))
                & (F.col("query_id") != F.col("neighbor_id")))
        .select(
            "query_id", "neighbor_id",
            (dot_product("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank"),
                "sim")
    )
