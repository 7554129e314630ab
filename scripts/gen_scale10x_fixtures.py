#!/usr/bin/env python3
"""Generate 10x-scale documents/embeddings/events fixtures.

The dbgen sf1 scale point (BENCH_SF1.json) covers the relational
tables; the LLM-pipeline operators read the synthetic
documents/embeddings/events tables, which have no sf1 fixture. This
script bootstraps 10x-row versions from `/root/testdata/sf0.1` so
those operators get a measured 10x scaling point on realistic data:

- documents (5,000 -> 50,000): each new row resamples a source doc;
  2% keep its text verbatim (exact-dup mass), 8% perturb a few words
  (near-dup mass for MinHash/SimHash/Jaccard to find), 90% redraw the
  same number of words from the source corpus' word distribution —
  length distribution, vocabulary, and lang/source marginals all
  carry over from the source.
- embeddings (2,000 -> 20,000): new vec = a same-label source vec +
  N(0, 0.05) noise — preserves the label cluster structure the IVF
  index keys on.
- events (100,000 -> 1,000,000): event_type/value/props
  bootstrap-resampled, fresh uniform timestamps over the source's
  30-day window, 10x the user population (15,000) so per-user session
  cardinality stays flat like a real horizontally-grown event log.

Deterministic (fixed seed). Output:
fixtures/_cache/scale10x/{documents,embeddings,events}.parquet
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "_cache", "scale10x")
SEED = 20260815
SCALE = 10


def gen_documents(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(os.path.join(SRC, "documents.parquet"))
    n = len(src) * SCALE
    words = np.concatenate([t.split() for t in src["text"]])
    word_pool = np.asarray(words)
    base_idx = rng.integers(0, len(src), size=n)
    kind = rng.choice(["exact", "near", "fresh"], size=n,
                      p=[0.02, 0.08, 0.90])
    texts = []
    src_texts = src["text"].to_numpy()
    for i in range(n):
        t = src_texts[base_idx[i]]
        if kind[i] == "exact":
            texts.append(t)
            continue
        toks = t.split()
        if kind[i] == "near":
            # perturb ~5% of tokens (>=1): the near-dup band the
            # shingle/minhash/simhash operators must still catch
            k = max(1, len(toks) // 20)
            for pos in rng.integers(0, len(toks), size=k):
                toks[pos] = word_pool[rng.integers(0, len(word_pool))]
        else:
            toks = word_pool[rng.integers(0, len(word_pool),
                                          size=len(toks))].tolist()
        texts.append(" ".join(toks))
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": src["lang"].to_numpy()[base_idx],
        "source": src["source"].to_numpy()[base_idx],
    })
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return df


def gen_embeddings(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(os.path.join(SRC, "embeddings.parquet"))
    n = len(src) * SCALE
    base_idx = rng.integers(0, len(src), size=n)
    base = np.stack(src["embedding"].to_numpy()[base_idx])
    vecs = base + rng.normal(0, 0.05, size=base.shape)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in vecs],
        "label": src["label"].to_numpy()[base_idx].astype(np.int32),
    })


def gen_events(rng: np.random.Generator) -> pd.DataFrame:
    src = pd.read_parquet(os.path.join(SRC, "events.parquet"))
    n = len(src) * SCALE
    base_idx = rng.integers(0, len(src), size=n)
    t0 = src["ts"].min().value
    t1 = src["ts"].max().value
    ts = np.sort(rng.integers(t0, t1, size=n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts).floor("us"),
        "user_id": rng.integers(
            0, src["user_id"].max() * SCALE, size=n).astype(np.int64),
        "event_type": src["event_type"].to_numpy()[base_idx],
        "value": src["value"].to_numpy()[base_idx],
        "props": src["props"].to_numpy()[base_idx],
    })
    return df


def main(force: bool = False) -> str:
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for name, gen in [("documents", gen_documents),
                      ("embeddings", gen_embeddings),
                      ("events", gen_events)]:
        path = os.path.join(OUT, f"{name}.parquet")
        if os.path.exists(path) and not force:
            continue
        df = gen(rng)
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")
    return OUT


if __name__ == "__main__":
    main(force="--force" in os.sys.argv)
