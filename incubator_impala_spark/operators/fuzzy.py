"""Fuzzy (approximate string) join — record linkage at scale.

Neither the reference nor Spark has a fuzzy-join operator; this is the
standard blocking + verify decomposition:

1. **Block**: candidate pairs must share a cheap deterministic key —
   here (length bucket, first k chars). Blocking turns the O(|L|·|R|)
   all-pairs comparison into an equi-join, the same trick the MinHash
   LSH path uses for documents.
2. **Verify**: exact `levenshtein` (JVM-native) on candidates only,
   keep pairs within `max_distance`.

Recall is governed by the blocking rule: edits inside the first k
characters or big length changes escape the block. k=2 with a ±1
length bucket tolerates any single edit outside the first 2 chars —
documented, tunable, and cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_keys(col: Column, bucket: int) -> tuple[Column, Column]:
    return (F.floor(F.length(col) / bucket), F.substring(col, 1, 2))


def fuzzy_join(left: DataFrame, right: DataFrame, left_col: str,
               right_col: str, max_distance: int = 2,
               length_bucket: int = 4) -> DataFrame:
    """Pairs (left, right) with levenshtein(left_col, right_col) <=
    max_distance, found via (length-bucket, 2-char-prefix) blocking.
    Adjacent length buckets are probed so near-boundary lengths meet.
    """
    lb, lp = _block_keys(F.col(left_col), length_bucket)
    l_tagged = left.withColumn("_pfx", lp).withColumn(
        "_lb", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    rb, rp = _block_keys(F.col(right_col), length_bucket)
    r_tagged = right.withColumn("_pfx", rp).withColumn("_lb", rb)
    cand = l_tagged.join(r_tagged, ["_lb", "_pfx"]).drop("_lb", "_pfx")
    return cand.withColumn(
        "edit_distance", F.levenshtein(F.col(left_col), F.col(right_col))
    ).where(F.col("edit_distance") <= max_distance)
