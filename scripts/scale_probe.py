"""One-command 10x scaling probe (VERDICT r5 "Missing #4").

DuckDB's dbgen extension needs network access this container doesn't
have, so the sf1-equivalent dataset is built by KEY-SHIFTED 10x
REPLICATION of the driver's sf0.1 parquet: each copy i shifts every
join key by i * 10^9 (consistently across fact and dimension tables,
so joins keep exactly 10x the matches), region/nation stay unreplicated
(constant dims, like the real benchmark). Value distributions,
selectivities, and per-key group sizes are preserved; total rows and
key cardinalities grow 10x — the properties a scaling measurement
needs. For the text/embedding tables the copies are MUTATED
(every-7th-word replacement / deterministic vector perturbation keyed
by the copy index) so the dedup operators don't see 10 exact clones of
every document — cross-copy near-duplicate structure would be an
adversarial input no real corpus has, and would measure candidate-pair
blowup instead of scaling.

Usage:
    python3 scripts/scale_probe.py [--gen-only] [query ...]

Writes the 10x dataset to /tmp/spark_graft_sf1 (once; delete to
regenerate), times each query at sf0.1 and at 10x (median of 3, cache
cleared per run, same protocol as bench.py), and prints a markdown
table with the ratio. Ratios near 10 are linear; >~12 flags a
superlinear path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_sf1"
SHIFT = 10 ** 9
COPIES = 10

# key columns to shift per table (join-consistent)
KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
    "documents": ["doc_id"],
}
UNREPLICATED = ["region", "nation"]

DEFAULT_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q4_adapted", "tpch_q5", "tpch_q6",
    "tpch_q9_adapted", "tpch_q13", "tpch_q18", "tpch_q21_adapted",
    "agg_rollup", "analytic_window_frames",
    "events_session_windows", "events_asof_last_click",
    "nested_tpch_two_level_max_order_qty",
    "nested_tpch_q9_profit_by_nation_year",
    "nested_tpch_q21_multi_supplier_late",
    "pipeline_dedup_minhash_lsh", "pipeline_dedup_simhash",
    "pipeline_dedup_embedding_ivf", "pipeline_dedup_clusters",
    "pipeline_text_features", "pipeline_similarity_topk",
    "pipeline_corpus_curation", "pipeline_stratified_sample",
    "fn_sketch_kll",
    "tpcds_q36_style_rollup_rank",
    "tpcds_q51_style_cumulative_crossover",
    "tpcds_q78_style_no_return_channel_ratio",
    "tpcds_q95_style_double_semijoin",
]


def generate(spark) -> None:
    from pyspark.sql import functions as F

    from incubator_impala_spark.sources.tables import TABLES, load_table

    os.makedirs(OUT, exist_ok=True)
    for t in TABLES:
        dst = os.path.join(OUT, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        df = load_table(spark, BASE, t)
        if t in UNREPLICATED:
            df.write.mode("overwrite").parquet(dst)
            print(f"  {t}: copied (constant dim)")
            continue
        copies = []
        for i in range(COPIES):
            c = df
            for k in KEYED.get(t, []):
                c = c.withColumn(k, F.col(k) + F.lit(i * SHIFT))
            if t == "documents" and i > 0:
                # mutate: replace every 7th word with a copy-unique
                # token so copies are NOT near-duplicates of copy 0
                c = c.withColumn(
                    "text",
                    F.array_join(
                        F.expr(
                            f"transform(split(text, ' '), (w, j) -> "
                            f"case when j % 7 = {i % 7} "
                            f"then concat('w{i}x', j) else w end)"),
                        " "))
            if t == "embeddings" and i > 0:
                # deterministic per-copy perturbation breaks cross-copy
                # cosine near-duplication while keeping magnitudes
                c = c.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (v, j) -> "
                        f"cast(v + 0.07 * sin(j * {i + 1}) as float))"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(dst)
        print(f"  {t}: x{COPIES} -> {dst}")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    from incubator_impala_spark.queries import QUERIES
    from incubator_impala_spark.session import get_spark

    spark = get_spark("scale-probe")
    print(f"generating 10x dataset under {OUT} (if absent)")
    generate(spark)
    if "--gen-only" in sys.argv:
        return

    run = names or [n for n in DEFAULT_QUERIES if n in QUERIES]
    QUERIES["tpch_q6"](spark, BASE).collect()  # warm-up

    def timed(name: str, sf_dir: str) -> float:
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        return sorted(runs)[1]

    print("\n| query | sf0.1 s | 10x s | ratio |")
    print("|---|---|---|---|")
    for name in run:
        a = timed(name, BASE)
        b = timed(name, OUT)
        flag = "  <-- superlinear?" if b / a > 12 else ""
        print(f"| {name} | {a:.2f} | {b:.2f} | {b / a:.1f} |{flag}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
