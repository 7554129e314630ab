#!/usr/bin/env python3
"""Linear-output scale corpus for the dedup/text operators.

The driver's synthetic documents draw from a FIXED 31-word vocabulary
at every SF, so TRUE near-dup pairs grow ~quadratically with corpus
size and any correct dedup's OUTPUT explodes with it — the r9 10x
ratios measured output growth, not engine scaling (SCALE.md r9
caveat). This corpus removes that confound: vocabulary/topic
diversity GROWS with corpus size and the dup rate per document is
held constant, so the true pair count — and therefore a correct
operator's output — grows ~LINEARLY in n:

- documents: 90% "fresh" docs drawn from a Zipf word distribution
  over a vocabulary of size 40*n/1000 (linear vocab growth keeps
  accidental cross-doc shingle collisions ~flat per doc); 2% exact
  copies of an earlier doc, 8% near-perturbations of an earlier doc
  (~5% of tokens replaced) — the SAME per-doc dup mass at every
  scale. Doc lengths uniform 30-120 tokens.
- embeddings: clusters of a FIXED size (20 members) around random
  unit centers, cluster count = n/20 — per-vector neighbor count is
  constant, so true near-dup pairs are linear in n.

Two sizes from the same family (1x = 5,000 docs / 2,000 vecs; 10x =
50,000 / 20,000), deterministic seed. Output:
fixtures/_cache/lin{1,10}x/{documents,embeddings}.parquet
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

OUT_BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "_cache")
SEED = 20260816

LANGS = ["en", "de", "fr", "es", "pt", "it"]
SOURCES = ["web", "books", "news", "wiki"]


def gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    vocab_n = max(200, 40 * n // 1000)
    # mildly skewed weights over a scale-proportional vocabulary —
    # a full Zipf head makes unrelated docs share so many top words
    # that simhash finds accidental near-dups quadratically; rank^-0.3
    # keeps word-frequency realism without that collision mass
    ranks = np.arange(1, vocab_n + 1)
    w = ranks ** -0.3
    w /= w.sum()
    vocab = np.array([f"w{i}" for i in range(vocab_n)])
    texts: list[str] = []
    kinds = rng.choice(["exact", "near", "fresh"], size=n,
                       p=[0.02, 0.08, 0.90])
    for i in range(n):
        if i >= 10 and kinds[i] == "exact":
            texts.append(texts[rng.integers(0, i)])
            continue
        if i >= 10 and kinds[i] == "near":
            toks = texts[rng.integers(0, i)].split()
            for pos in rng.integers(0, len(toks),
                                    size=max(1, len(toks) // 20)):
                toks[pos] = vocab[rng.choice(vocab_n, p=w)]
            texts.append(" ".join(toks))
            continue
        length = rng.integers(30, 121)
        texts.append(" ".join(vocab[rng.choice(vocab_n, size=length,
                                               p=w)]))
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, size=n),
        "source": rng.choice(SOURCES, size=n),
    })
    df["n_chars"] = df["text"].str.len().astype(np.int64)
    return df


def gen_embeddings(rng: np.random.Generator, n: int,
                   dim: int = 32, per_cluster: int = 20
                   ) -> pd.DataFrame:
    k = n // per_cluster
    centers = rng.normal(size=(k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = np.repeat(np.arange(k), per_cluster)[:n]
    vecs = centers[labels] + rng.normal(0, 0.03, size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in vecs],
        "label": (labels % 64).astype(np.int32),
    })


def main(force: bool = False) -> None:
    for tag, scale in (("lin1x", 1), ("lin10x", 10)):
        out = os.path.join(OUT_BASE, tag)
        os.makedirs(out, exist_ok=True)
        rng = np.random.default_rng(SEED + scale)
        for name, gen, base in (("documents", gen_documents, 5000),
                                ("embeddings", gen_embeddings, 2000)):
            path = os.path.join(out, f"{name}.parquet")
            if os.path.exists(path) and not force:
                continue
            df = gen(rng, base * scale)
            df.to_parquet(path, index=False)
            print(f"{tag}/{name}: {len(df)} rows")


if __name__ == "__main__":
    import sys

    main(force="--force" in sys.argv)
