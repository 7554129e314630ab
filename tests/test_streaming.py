"""Structured Streaming tests: the same window plans verified against
DuckDB in batch mode must produce identical results when run
incrementally over a replayed event stream (micro-batches via the
file source), and the custom stateful sessionizer must agree with
`session_window` for every session the watermark closed.
"""

from __future__ import annotations

import os
import shutil

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    """Replayable stream: events split into 4 time-ordered parquet
    chunk files so maxFilesPerTrigger=1 yields 4 micro-batches with an
    advancing watermark."""
    import duckdb

    d = tmp_path_factory.mktemp("events_stream")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT event_id, epoch_ns(ts) AS ts, user_id,"
        " event_type, value, props FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    chunk = (n + 3) // 4
    for i in range(4):
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts LIMIT {chunk} OFFSET {i * chunk})"
            f" TO '{d}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
        # deterministic micro-batch order: file source picks up files
        # by modification time, so stamp them in event-time order
        os.utime(f"{d}/chunk{i}.parquet", (1_700_000_000 + i, 1_700_000_000 + i))
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def _batch_events(spark):
    from incubator_impala_spark.sources.tables import load_table

    return load_table(spark, SF_SMALL, "events")


def test_stream_tumbling_equals_batch(spark, events_stream_dir):
    from incubator_impala_spark.streaming import jobs, windows

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    result = windows.tumbling_agg(jobs.watermarked(stream),
                                  duration="1 hour", keys=["event_type"])
    got = jobs.run_available_now(result, output_mode="complete").toPandas()
    want = windows.tumbling_agg(_batch_events(spark), duration="1 hour",
                                keys=["event_type"]).toPandas()
    key = ["wstart", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), (got.head(), want.head())


def test_stream_session_window_equals_batch(spark, events_stream_dir):
    from incubator_impala_spark.streaming import jobs, windows

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    result = windows.session_agg(jobs.watermarked(stream), gap="6 hours",
                                 keys=["user_id"])
    got = jobs.run_available_now(result, output_mode="complete").toPandas()
    want = windows.session_agg(_batch_events(spark), gap="6 hours",
                               keys=["user_id"]).toPandas()
    key = ["user_id", "session_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))


def test_stateful_sessionizer_matches_session_window(spark, events_stream_dir):
    """Sessions emitted by the applyInPandasWithState operator must be
    exactly the batch `session_window` sessions that the final
    watermark closed (append mode can't emit still-open sessions)."""
    from incubator_impala_spark.streaming import jobs, stateful, windows

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    result = stateful.sessionize_stateful(jobs.watermarked(stream, "1 hour"))
    got = jobs.run_available_now(result, output_mode="append").toPandas()

    want = windows.session_agg(_batch_events(spark), gap="6 hours",
                               keys=["user_id"]).toPandas()
    assert len(got) > 0, "no sessions emitted"
    # every emitted session must match a batch session exactly
    want_keys = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in want.itertuples()
    }
    for r in got.itertuples():
        k = (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        assert k in want_keys, f"emitted session not in batch result: {k}"


def test_stream_json_filter_routing(spark, events_stream_dir):
    """Stateless streaming transform: filter + JSON extraction runs
    incrementally and matches the batch plan."""
    from pyspark.sql import functions as F

    from incubator_impala_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)

    def plan(df):
        return df.where(F.col("event_type") == "purchase").select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )

    got = jobs.run_available_now(plan(stream), output_mode="append").toPandas()
    want = plan(_batch_events(spark)).toPandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    assert got.equals(want)


def test_nanos_preserved_beyond_oracle(spark):
    """When the events file carries TIMESTAMP(NANOS), the loader keeps
    the raw sub-µs digits in ts_ns while DuckDB (and Spark's timestamp
    types) truncate to µs — assert the nanos actually survive. Driver
    data may instead ship µs-native timestamps; then ts_ns is derived
    (x1000) and the sub-µs assertion is vacuous, but the ts/ts_ns
    consistency contract must hold for both layouts."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from incubator_impala_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMALL, "events")
    unit = pq.ParquetFile(f"{SF_SMALL}/events.parquet").schema_arrow.field(
        "ts"
    ).type.unit
    if unit == "ns":
        with_subus = ev.where((F.col("ts_ns") % 1000) != 0).count()
        assert with_subus > 0
    # and ts is exactly ts_ns truncated to µs under either layout
    bad = ev.where(
        F.unix_micros(F.col("ts").cast("timestamp")) != F.expr("ts_ns div 1000")
    ).count()
    assert bad == 0


def test_append_mode_window_emission_contract(spark, tmp_path):
    """Append-mode late-data contract on this Spark build: a window is
    emitted AT MOST ONCE (no re-emission when late rows arrive after
    its event time passed — here the late batch's windows were never
    in state before, so they emit once on commit and are immediately
    evicted), and the window newer than watermark-delay stays open.
    State stays bounded either way: nothing reopens."""
    import duckdb

    from pyspark.sql import functions as F

    from incubator_impala_spark.streaming import jobs

    src = f"{tmp_path}/late_src"
    os.makedirs(src)
    con = duckdb.connect()
    # batch 1: events on 2024-01-05..2024-01-30 (advances watermark far)
    con.execute(
        "CREATE VIEW ev AS SELECT event_id, epoch_ns(ts) AS ts, user_id,"
        " event_type, value, props FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    con.execute(
        f"COPY (SELECT * FROM ev WHERE ts >= epoch_ns(TIMESTAMP '2024-01-05')) TO"
        f" '{src}/recent.parquet' (FORMAT PARQUET)"
    )
    # batch 2: VERY late events (before 2024-01-03 — far behind the
    # watermark after batch 1)
    con.execute(
        f"COPY (SELECT * FROM ev WHERE ts < epoch_ns(TIMESTAMP '2024-01-03')) TO"
        f" '{src}/late.parquet' (FORMAT PARQUET)"
    )
    os.utime(f"{src}/recent.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(f"{src}/late.parquet", (1_700_000_001, 1_700_000_001))

    stream = jobs.read_events_stream(spark, src, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("day"), "n")
    )
    got = jobs.run_available_now(agg, output_mode="append").toPandas()
    assert len(got) > 0
    # at-most-once emission per window
    assert got["day"].is_unique, got.sort_values("day")
    # the newest window (within watermark delay of max event time)
    # must still be open — append cannot emit unfinalized windows
    import pandas as pd

    assert got["day"].max() < pd.Timestamp("2024-01-30")


def test_stream_starts_on_empty_directory(spark, tmp_path):
    """File-stream startup pattern: the source directory may be empty
    when the stream starts and files arrive later. The schema probe
    must fall back to EVENTS_RAW_SCHEMA instead of throwing, and the
    stream must pick up files written after start (ts normalized to
    timestamp, ts_ns carried, exactly like the batch loader)."""
    import duckdb

    from incubator_impala_spark.streaming import jobs

    src = f"{tmp_path}/empty_then_filled"
    os.makedirs(src, exist_ok=True)
    ev = jobs.read_events_stream(spark, src)
    assert ev.isStreaming
    dt = dict(ev.dtypes)
    assert dt["ts"] == "timestamp" and dt["ts_ns"] == "bigint"
    # now drop a file matching the raw layout and drain
    duckdb.sql(
        "COPY (SELECT 1::BIGINT AS event_id, 1577836800000000000::BIGINT AS ts,"
        " 7::BIGINT AS user_id, 'click' AS event_type, 1.5::DOUBLE AS value,"
        " '{}' AS props) TO '%s/part0.parquet' (FORMAT PARQUET)" % src
    )
    out = jobs.run_available_now(ev, output_mode="append")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["ts_ns"] == 1577836800000000000
