"""Stream-stream joins + durable streaming sinks — the remaining
Structured Streaming surfaces: a watermarked interval join of two
event streams must match the equivalent batch join, and a parquet
sink with checkpointing must produce a readable, exactly-once table.
(All net-new vs the reference, which has no streaming — SURVEY §2.10.)
"""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream_dir(tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("ev_join_stream")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT event_id, epoch_ns(ts) AS ts, user_id,"
        " event_type, value, props FROM "
        f"read_parquet('{SF_SMALL}/events.parquet')"
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    chunk = (n + 2) // 3
    for i in range(3):
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts LIMIT {chunk} OFFSET {i * chunk})"
            f" TO '{d}/chunk{i}.parquet' (FORMAT PARQUET)"
        )
        os.utime(f"{d}/chunk{i}.parquet", (1_700_000_000 + i,) * 2)
    return str(d)


def _split(df):
    from pyspark.sql import functions as F

    purchases = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    clicks = df.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return purchases, clicks


def _interval_join(purchases, clicks):
    from pyspark.sql import functions as F

    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 2 HOURS")),
    ).select("p_id", "c_id", "p_user")


def test_stream_stream_interval_join_matches_batch(spark, events_stream_dir):
    """Purchases ⋈ clicks within a 2h event-time window; both sides
    watermarked so join state is bounded (the scale requirement)."""
    from incubator_impala_spark.sources.tables import load_table
    from incubator_impala_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    p_s, c_s = _split(stream)
    got = jobs.run_available_now(
        _interval_join(
            p_s.withWatermark("p_ts", "1 hour"),
            c_s.withWatermark("c_ts", "3 hours"),
        ),
        output_mode="append",
    ).toPandas()

    p_b, c_b = _split(load_table(spark, SF_SMALL, "events"))
    want = _interval_join(p_b, c_b).toPandas()
    key = ["p_id", "c_id"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got.equals(want), (len(got), len(want))


def test_streaming_parquet_sink_with_checkpoint(spark, events_stream_dir,
                                                tmp_path):
    """writeStream → parquet with checkpointing: the durable-sink path
    (memory sinks are test-only). Output must equal the batch filter."""
    from pyspark.sql import functions as F

    from incubator_impala_spark.sources.tables import load_table
    from incubator_impala_spark.streaming import jobs

    stream = jobs.read_events_stream(spark, events_stream_dir,
                                     max_files_per_trigger=1)
    out = stream.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{tmp_path}/sink")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(f"{tmp_path}/sink")
    want = (
        load_table(spark, SF_SMALL, "events")
        .where(F.col("event_type") == "signup")
        .count()
    )
    assert back.count() == want
    # checkpoint must record completed batches (restart safety)
    assert os.path.isdir(f"{tmp_path}/ckpt/commits")
    assert len(os.listdir(f"{tmp_path}/ckpt/commits")) >= 1


def test_scalar_subquery_cardinality_check(spark):
    """Uncorrelated scalar subquery returning >1 row must raise — the
    reference guards this with CardinalityCheckNode
    (be/src/exec/cardinality-check-node.h:33-40); Spark enforces the
    same contract at runtime."""
    from incubator_impala_spark.sources.tables import load_table

    load_table(spark, SF_SMALL, "region").createOrReplaceTempView("region_cc")
    with pytest.raises(Exception, match="(?i)more than one row|MULTI_VALUE"):
        spark.sql(
            "SELECT (SELECT r_name FROM region_cc) AS x"
        ).collect()


def test_engine_explain_surface(engine):
    """EXPLAIN <stmt> (sql-parser.cup:765-775) → formatted plan text
    with the physical operators visible."""
    txt = engine.explain(
        "SELECT count(*) FROM lineitem WHERE l_quantity < 10"
    )
    assert "HashAggregate" in txt and "Scan parquet" in txt.replace("FileScan", "Scan parquet")
