"""Skew-mitigation operators: salted join and salted distinct-count.

The reference handles skew implicitly (hash-partitioned exchanges +
per-node spilling; no explicit skew-join machinery exists in
`be/src/exec/`). On Spark, AQE's skew-join splitting
(`spark.sql.adaptive.skewJoin.enabled`, on in our session config)
covers sort-merge joins automatically; this module is the explicit
path for the cases AQE can't rewrite:

- a hot key joining a dimension too large to broadcast: salt the fact
  side deterministically, replicate the dim side `salt`-ways, join on
  (key, salt) — each hot key spreads over `salt` reducers;
- count(DISTINCT x) on a hot group: two-phase partial distinct over
  (group, salt) then final merge.

Salts are derived from xxhash64 of the row's own columns — stable
across retries (a rand()-based salt breaks task retry determinism at
scale, which is why it's banned here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_join(fact: DataFrame, dim: DataFrame, key: str, buckets: int = 16,
                how: str = "inner") -> DataFrame:
    """Equi-join with the fact side salted and the dim side replicated.

    Result is identical to `fact.join(dim, key, how)` for `how` in
    {inner, left/left_outer, left_semi, left_anti}; right/full outer
    would emit each unmatched dim row `buckets` times (the dim side is
    replicated before the join), so those modes raise.
    The plan spreads each join key over `buckets` partitions. Use when
    one key's row count dwarfs the rest AND the dim can't broadcast.
    Replication multiplies the dim shuffle volume by `buckets` — keep
    it small.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — dim-side replication "
            "would duplicate unmatched dim rows in right/full outer joins"
        )
    fact_cols = [c for c in fact.columns]
    salted_fact = fact.withColumn("_salt", _salt_col(fact_cols, buckets))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    joined = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return joined.drop("_salt")


def salted_count_distinct(df: DataFrame, group: str, distinct_col: str,
                          buckets: int = 16) -> DataFrame:
    """count(DISTINCT x) per group via two-phase salted aggregation:
    dedup within (group, salt-of-x), then sum partial counts.

    Exact (not approximate): the salt is a function of x alone, so
    equal values always land in the same bucket and are deduped there.
    """
    salted = df.select(
        group, distinct_col,
        _salt_col([distinct_col], buckets).alias("_salt"),
    )
    partial = (
        salted.groupBy(group, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_pc"))
    )
    return partial.groupBy(group).agg(
        F.sum("_pc").cast("bigint").alias(f"n_{distinct_col}")
    )
