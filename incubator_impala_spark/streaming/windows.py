"""Time-window operators shared by batch and streaming plans.

The reference has NO streaming operators (SURVEY.md §2.10 — the only
"streaming" term is its partial pre-aggregation node,
`be/src/exec/streaming-aggregation-node.h:46`); this module is the
net-new Structured-Streaming capability (SURVEY.md §7 M6). The same
functions work on a batch DataFrame and a `readStream` DataFrame —
Structured Streaming's core contract — so the DuckDB-oracled batch
corpus (`queries/streaming_batch.py`) verifies exactly the plans the
streaming jobs (`streaming/jobs.py`) run incrementally.

Scale notes:
- tumbling/sliding aggregation shuffles once on (window, keys) with
  partial aggregation before the shuffle — the streaming analogue of
  the reference's pre-agg → final-agg split.
- session windows require a shuffle on the session keys; Spark merges
  adjacent sessions within partitions (no global sort).
- watermarks bound state: on a real cluster state store size is
  O(open windows × keys), independent of total history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# value is DOUBLE in the source; aggregate it exactly as DECIMAL(14,2)
# so batch/stream/oracle sums are identical regardless of add order.
_DEC = "decimal(14,2)"


def money_sum(col: str) -> Column:
    return F.sum(F.col(col).cast(_DEC)).cast("decimal(38,2)")


def tumbling_agg(df: DataFrame, ts_col: str = "ts", duration: str = "1 hour",
                 keys: list[str] | None = None) -> DataFrame:
    """Fixed, non-overlapping event-time windows: count + exact sum."""
    keys = keys or []
    w = F.window(F.col(ts_col), duration)
    return (
        df.groupBy(w, *keys)
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("wstart"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(df: DataFrame, ts_col: str = "ts", duration: str = "2 hours",
                slide: str = "1 hour", keys: list[str] | None = None) -> DataFrame:
    """Overlapping windows — each event lands in duration/slide windows."""
    keys = keys or []
    w = F.window(F.col(ts_col), duration, slide)
    return (
        df.groupBy(w, *keys)
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("wstart"), *keys, "n_events", "sum_value")
    )


def session_agg(df: DataFrame, ts_col: str = "ts", gap: str = "6 hours",
                keys: list[str] | None = None) -> DataFrame:
    """Gap-based session windows: a session closes after `gap` of
    inactivity; window end = last event + gap (Spark semantics)."""
    keys = keys or ["user_id"]
    w = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(w, *keys)
        .agg(F.count("*").alias("n_events"), money_sum("value").alias("sum_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            *keys,
            "n_events",
            "sum_value",
        )
    )
