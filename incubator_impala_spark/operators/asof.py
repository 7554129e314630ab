"""As-of (time-travel) join — a capability the reference lacks.

The reference's join algebra is hash + nested-loop only
(`common/thrift/PlanNodes.thrift:361-378`; no range/as-of join node
exists under `be/src/exec/`), so this is a net-new operator per the
build plan's beyond-reference track (SURVEY.md §2.4 note, §7 M6).

Implementation is the *union-and-carry* pattern, not a pairwise join:
tag left/right rows, union them, sort within each key partition by
(ts, side, tiebreak) and carry the latest right-side payload forward
with `last(..., ignorenulls=True)`. One shuffle on the key, one
window sort — O(n log n) per partition, no candidate-pair blowup, and
skew-safe compared to a `left.ts >= right.ts` range join, which Spark
would execute as a broadcast-nested-loop at O(|L|·|R|) per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              payload: list[str], tiebreak: str,
              prefix: str = "asof_") -> DataFrame:
    """For each left row, attach the payload of the latest right row
    with `right.ts <= left.ts` within the same `key` (inclusive as-of,
    matching DuckDB's `ASOF JOIN ... ON l.ts >= r.ts`).

    `tiebreak` is a unique column present on both sides — it makes the
    carry order total, so results are deterministic even with equal
    timestamps. Left rows with no prior right row keep NULL payloads.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in payload],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (key, ts, tiebreak) else F.lit(None).cast(t).alias(c)
            for c, t in ((c, dict(left.dtypes).get(c, "string")) for c in lcols)
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal ts => inclusive as-of
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.col("_side"), F.col(tiebreak))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
