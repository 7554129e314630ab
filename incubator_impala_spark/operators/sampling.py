"""Deterministic sampling operators for training-data pipelines.

TABLESAMPLE (the reference's sampling surface, sql-parser.cup:3080)
samples storage blocks — fast but layout-dependent, so results change
with file layout and can't be reproduced across engines or reruns.
These operators sample by *content hash* instead: a row's membership
depends only on its key, so samples are reproducible across engines,
cluster sizes, retries, and dataset versions (the property training
pipelines need for stable train/eval splits).

Mechanism: md5(key) is uniform; comparing a fixed-width hex prefix
against a threshold selects a fraction = threshold/16^width. Pure
Column expressions — codegen, no RNG state, trivially pushed down.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PREFIX_WIDTH = 8  # 32 bits of hash → fraction resolution ~2.3e-10


def _hash_prefix(key: Column) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, _PREFIX_WIDTH)


def _threshold_hex(fraction: float) -> str:
    n = int(round(fraction * (16 ** _PREFIX_WIDTH)))
    n = max(0, min(16 ** _PREFIX_WIDTH, n))
    return format(n, f"0{_PREFIX_WIDTH}x")


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of `key`."""
    return df.where(_hash_prefix(F.col(key)) < F.lit(_threshold_hex(fraction)))


def train_eval_split(df: DataFrame, key: str,
                     eval_fraction: float = 0.1) -> DataFrame:
    """Attach a deterministic 'split' column ('train' / 'eval').

    The same key always lands in the same split — across reruns, data
    versions, and engines — which is what prevents train/eval leakage
    when the corpus is rebuilt.
    """
    is_eval = _hash_prefix(F.col(key)) < F.lit(_threshold_hex(eval_fraction))
    return df.withColumn("split", F.when(is_eval, "eval").otherwise("train"))


def sample_sql(key_expr: str, fraction: float) -> str:
    """The same predicate as portable SQL (both Spark and DuckDB read
    `substr(md5(..),1,8) < 'hex'` identically) — used by oracles and
    by pushdown-friendly raw-SQL pipelines."""
    return (
        f"substr(md5(CAST({key_expr} AS STRING)), 1, {_PREFIX_WIDTH})"
        f" < '{_threshold_hex(fraction)}'"
    )
