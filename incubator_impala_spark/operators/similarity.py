"""Similarity search over embedding columns.

Three tiers: brute-force cosine top-k (exact baseline), a hyperplane-
LSH bucketed variant (fixed bucket count — cheap, recall tuned by
bands×planes), and IVF top-k (bucket count scales with the corpus,
k ≈ 2·sqrt(n) sampled centroids — the 100 TB default; measured
recall@5 0.62 vs LSH's 0.42 on this corpus at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_impala_spark.operators.dedup import _par, dot_product, vec_norm


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
    ).repartition(_par(corpus), F.col("neighbor_id"))
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
# Hyperplane LSH, multi-table (deterministic, seedless): plane p's
# component for dimension d is derived from md5(p||d) — reproducible
# across runs, engines, and cluster sizes with no RNG state to ship.
# `LSH_BANDS` independent tables of `LSH_PLANES_PER_BAND` planes each:
# a near pair is a candidate if ANY band's sign pattern matches —
# single-table bucketing over many planes has vanishing recall
# (P(match) = agree^planes), the banding trick recovers it exactly as
# in MinHash LSH.
# ---------------------------------------------------------------------------

LSH_BANDS = 4
LSH_PLANES_PER_BAND = 4
LSH_PLANES = LSH_BANDS * LSH_PLANES_PER_BAND  # total plane pool


def _plane_component(p: int, d: int) -> float:
    import hashlib

    h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
    # map 8 hex chars to [-1, 1)
    return int(h[:8], 16) / float(1 << 31) - 1.0


def _band_bucket(vec_col: str, dim: int, band: int,
                 planes_per_band: int = LSH_PLANES_PER_BAND) -> "F.Column":
    """Sign pattern of band `band`'s planes as an int bucket id."""
    bucket = F.lit(0)
    for j in range(planes_per_band):
        p = band * planes_per_band + j
        comps = F.array(*[F.lit(_plane_component(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucket_bands(df: DataFrame, dim: int,
                     vec_col: str = "embedding",
                     bands: int = LSH_BANDS,
                     planes_per_band: int = LSH_PLANES_PER_BAND) -> DataFrame:
    """One row per (input row, band): columns `band`, `bucket`."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _band_bucket(vec_col, dim, b, planes_per_band).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return df.withColumn("_bb", F.explode(pairs)).select(
        *df.columns, F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: candidates share ANY band's bucket with the
    query (multi-table LSH). The band equi-join replaces the all-pairs
    cross join at 100 TB; recall is tuned by bands × planes-per-band.
    """
    # r11 (guide §8): candidates are generated and deduped as KEY
    # pairs only — the vectors no longer ride through the band join
    # and the pair dedup; they are attached to the deduped pair set by
    # key joins before scoring.
    c = corpus.repartition(_par(corpus), F.col(id_col)).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(vec_col).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(vec_col).alias("qn"),
    )
    cb = lsh_bucket_bands(c, dim, "cv").select("neighbor_id", "band", "bucket")
    qb = lsh_bucket_bands(q, dim, "qv").select("query_id", "band", "bucket")
    cand = (
        cb.join(F.broadcast(qb),
                (cb.band == qb.band)
                & (cb.bucket == qb.bucket)
                & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
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


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
             nprobe: int = 3, vec_col: str = "embedding",
             id_col: str = "vec_id", n: int | None = None) -> DataFrame:
    """Approximate top-k via IVF: corpus and queries are both assigned
    to their `nprobe` nearest of ~2·sqrt(n) deterministic sampled
    centroids; a query scores only corpus rows sharing a probed
    centroid. Bucket count scales with the corpus (vs the fixed bucket
    count of sign-banding LSH), so per-query candidate volume is
    ~nprobe²·sqrt(n) at any scale — the IVF-flat recipe with a
    sampled (iteration-free, engine-reproducible) coarse quantizer.

    `n` (corpus row count) sizes the centroid stride; pass it from
    table stats / parquet footers to avoid a count job (None falls
    back to `corpus.count()`).
    """
    import math

    from incubator_impala_spark.operators.dedup import _par, dot_product, vec_norm

    if n is None:
        n = corpus.count()
    stride = max(1, int(math.floor(math.sqrt(n) / 2.0)))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        vec_norm(vec_col).alias("cn"),
    ).repartition(_par(corpus), F.col("neighbor_id"))
    cents = c.where(F.col("neighbor_id") % stride == 0).select(
        F.col("neighbor_id").alias("cid"), F.col("cv").alias("centv"),
        F.col("cn").alias("centn"),
    )

    def probe(df, idc, vc, nc):
        # grouped top-nprobe via sorted-struct slice — the corpus side
        # is already hash-partitioned on its id, so the n·k assignment
        # relation aggregates in place instead of shuffling through a
        # row_number window exchange (VERDICT r2). Sort key (-csim,
        # cid) == ORDER BY csim DESC, cid. r11 (guide §8): the probe
        # relation carries KEYS ONLY — vectors are attached to the
        # deduped candidate pairs at the end, not dragged through the
        # aggregate and the bucket join.
        assigned = df.join(F.broadcast(cents)).select(
            idc,
            F.struct(
                (-(dot_product(vc, "centv") / (F.col(nc) * F.col("centn"))))
                .alias("ns"),
                F.col("cid"),
            ).alias("sc"),
        )
        return (
            assigned.groupBy(idc)
            .agg(
                F.slice(F.array_sort(F.collect_list("sc")), 1, nprobe)
                .alias("top"),
            )
            .select(idc, F.explode(F.col("top.cid")).alias("cid"))
        )

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        vec_norm(vec_col).alias("qn"),
    )
    cp = probe(c, "neighbor_id", "cv", "cn")
    qp = probe(q, "query_id", "qv", "qn")
    cand = (
        cp.join(F.broadcast(qp), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            (dot_product("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.col("rank").cast("int").alias("rank"), "sim")
    )
