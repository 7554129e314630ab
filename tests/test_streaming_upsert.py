"""foreachBatch ingestion — the production streaming-sink pattern for
training-data pipelines: each micro-batch is deduplicated against the
destination and appended via dynamic partition overwrite, giving
idempotent per-batch upserts on plain parquet tables. (Net-new vs the
reference; its only sinks are batch INSERT/UPSERT, DataSinks.thrift.)
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def events_stream_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("ev_upsert_stream")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT event_id, epoch_ns(ts) AS ts, user_id,"
        " event_type, value, props FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    chunk = (n + 2) // 3
    # chunks OVERLAP by half a chunk — replayed rows must not duplicate
    for i in range(3):
        off = max(0, i * chunk - chunk // 2)
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts, event_id LIMIT {chunk + chunk // 2} "
            f"OFFSET {off}) TO '{d}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
        os.utime(f"{d}/chunk{i}.parquet", (1_700_000_000 + i,) * 2)
    return str(d)


def test_foreachbatch_dedup_upsert(spark, events_stream_dir, tmp_path):
    from pyspark.sql import functions as F

    from incubator_impala_spark.sources.tables import load_table
    from incubator_impala_spark.streaming import jobs

    dest = f"{tmp_path}/events_table"

    def upsert(batch_df, batch_id):
        batch = batch_df.dropDuplicates(["event_id"])
        try:
            existing = batch_df.sparkSession.read.parquet(dest)
            batch = batch.join(
                existing.select("event_id"), "event_id", "left_anti"
            )
        except Exception:  # destination doesn't exist yet
            pass
        batch.write.mode("append").parquet(dest)

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    back = spark.read.parquet(dest)
    want = load_table(spark, SF_SMALL, "events")
    # overlapping replay must collapse to the exact original id set
    assert back.count() == want.count()
    assert back.select("event_id").distinct().count() == want.count()
    # spot-check content equality on a sample of ids
    got_vals = {
        (r.event_id, r.user_id, r.event_type)
        for r in back.where(F.col("event_id") % 97 == 0).collect()
    }
    want_vals = {
        (r.event_id, r.user_id, r.event_type)
        for r in want.where(F.col("event_id") % 97 == 0).collect()
    }
    assert got_vals == want_vals


def test_declarative_stream_dedup_within_watermark(spark, events_stream_dir,
                                                   tmp_path):
    """dropDuplicatesWithinWatermark: the declarative streaming dedup —
    duplicate event_ids arriving across micro-batches (the overlapping
    chunks) collapse to one row each, with state bounded by the
    watermark instead of growing forever."""
    from incubator_impala_spark.sources.tables import load_table
    from incubator_impala_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    deduped = (
        stream.withWatermark("ts", "24 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    got = jobs.run_available_now(deduped, output_mode="append").toPandas()
    want = load_table(spark, SF_SMALL, "events").count()
    assert len(got) == want
    assert got["event_id"].is_unique


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once across restarts: a second run with the same
    checkpoint must process only files that arrived after the first
    run — no re-emission of already-committed batches."""
    import duckdb

    from incubator_impala_spark.streaming import jobs

    src = f"{tmp_path}/src"
    os.makedirs(src)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT event_id, epoch_ns(ts) AS ts, user_id,"
        " event_type, value, props FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    con.execute(
        f"COPY (SELECT * FROM ev WHERE event_id < 400) TO '{src}/a.parquet'"
        " (FORMAT PARQUET)"
    )

    def run_once():
        stream = jobs.read_events_stream(spark, src).select("event_id")
        q = (
            stream.writeStream.format("parquet")
            .option("path", f"{tmp_path}/out")
            .option("checkpointLocation", f"{tmp_path}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert spark.read.parquet(f"{tmp_path}/out").count() == 400

    # new data lands; restart from the same checkpoint
    con.execute(
        f"COPY (SELECT * FROM ev WHERE event_id >= 400) TO '{src}/b.parquet'"
        " (FORMAT PARQUET)"
    )
    run_once()
    out = spark.read.parquet(f"{tmp_path}/out")
    total = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    assert out.count() == total
    assert out.select("event_id").distinct().count() == total
