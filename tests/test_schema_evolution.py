"""Schema evolution / resolution (SURVEY §1.4): the reference resolves
parquet by name with schema evolution on read (hdfs-avro-scanner
schema resolution; parquet-metadata-utils by-name/by-index). Spark's
mergeSchema + by-name column resolution covers it: old files surface
NULL for later-added columns, reordered writers still resolve
correctly, and type widening on read is explicit."""

from __future__ import annotations


def test_added_column_reads_null_from_old_files(spark, tmp_path):
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(
        f"{tmp_path}/t/p=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id int, v string, score double"
    ).write.parquet(f"{tmp_path}/t/p=2")
    df = spark.read.option("mergeSchema", "true").parquet(f"{tmp_path}/t")
    rows = {(r.id, r.v, r.score) for r in df.collect()}
    assert rows == {(1, "a", None), (2, "b", 9.5)}
    assert "score" in df.columns


def test_reordered_writer_resolves_by_name(spark, tmp_path):
    spark.createDataFrame([(1, "x")], "a int, b string").write.parquet(
        f"{tmp_path}/t/p=1"
    )
    # second writer reorders columns; by-name resolution must not
    # transpose values
    spark.createDataFrame([("y", 2)], "b string, a int").write.parquet(
        f"{tmp_path}/t/p=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(f"{tmp_path}/t")
    rows = {(r.a, r.b) for r in df.collect()}
    assert rows == {(1, "x"), (2, "y")}


def test_explicit_schema_projects_subset(spark, tmp_path):
    """Declared-schema read (the reference's metastore-schema model):
    reading with an explicit narrower schema projects only those
    columns regardless of what the files carry."""
    from pyspark.sql.types import _parse_datatype_string

    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id int, v string, score double"
    ).write.parquet(f"{tmp_path}/t")
    narrow = spark.read.schema(
        _parse_datatype_string("id int, score double")
    ).parquet(f"{tmp_path}/t")
    assert narrow.columns == ["id", "score"]
    assert {(r.id, r.score) for r in narrow.collect()} == {(1, 10.0), (2, 20.0)}
