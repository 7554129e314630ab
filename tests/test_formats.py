"""Format round-trip tests — the reference's file-format × query test
matrix (its QueryTest corpus runs each test over parquet/text/avro/orc
dimensions; tests/common/impala_test_suite.py): the same query must
return identical results regardless of storage format, and columnar
formats must push predicates."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

FORMATS = ["parquet", "orc", "csv", "json", "text_impala", "avro"]


@pytest.fixture(scope="module")
def li(spark):
    from incubator_impala_spark.sources.tables import load_table

    return load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"
    )


@pytest.fixture(scope="module")
def format_dirs(spark, li, tmp_path_factory):
    from incubator_impala_spark.sources import formats

    d = tmp_path_factory.mktemp("fmt")
    avail = formats.available_formats(spark)
    dirs = {}
    for fmt in FORMATS:
        probe = "csv" if fmt == "text_impala" else fmt
        if probe not in avail:
            continue
        # timestamps as ISO strings for the text formats
        out = li.withColumn("l_shipdate", li.l_shipdate.cast("string"))
        formats.write_as(out, f"{d}/{fmt}", fmt)
        dirs[fmt] = f"{d}/{fmt}"
    return dirs


def _q6ish(df):
    from pyspark.sql import functions as F

    return (
        df.where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * F.col("l_discount").cast("decimal(12,2)")
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )


@pytest.mark.parametrize("fmt", FORMATS)
def test_format_roundtrip_same_result(spark, li, format_dirs, fmt):
    from incubator_impala_spark.sources import formats

    if fmt not in format_dirs:
        pytest.skip(f"{fmt} not available in this build")
    schema = (
        "l_orderkey bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_shipdate string"
    )
    from pyspark.sql.types import _parse_datatype_string

    need_schema = fmt in ("csv", "json", "text_impala")
    df = formats.read_as(
        spark, format_dirs[fmt], fmt,
        schema=_parse_datatype_string(schema) if need_schema else None,
    )
    want = _q6ish(li.withColumn("l_shipdate", li.l_shipdate.cast("string")))
    got = _q6ish(df)
    assert got.n == want.n and got.revenue == want.revenue, fmt


def test_orc_pushes_predicates(spark, format_dirs):
    from incubator_impala_spark.sources import formats

    df = formats.read_as(spark, format_dirs["orc"], "orc").where(
        "l_quantity < 5"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]


def test_impala_text_defaults(spark, tmp_path):
    """'\\x01'-delimited, header-less, '\\N' nulls — the reference's
    delimited-text table defaults must survive a round-trip."""
    from pyspark.sql.types import _parse_datatype_string

    from incubator_impala_spark.sources import formats

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c,with,commas")], "k int, v string"
    )
    formats.write_as(df, f"{tmp_path}/t", "text_impala")
    back = formats.read_as(
        spark, f"{tmp_path}/t", "text_impala",
        schema=_parse_datatype_string("k int, v string"),
    )
    rows = {(r.k, r.v) for r in back.collect()}
    assert rows == {(1, "a"), (2, None), (3, "c,with,commas")}


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip", "none"])
def test_parquet_compression_matrix(spark, li, tmp_path, codec):
    """The reference supports NONE..ZSTD parquet codecs
    (CatalogObjects.thrift:74-88); every codec must round-trip."""
    path = f"{tmp_path}/{codec}"
    li.write.mode("overwrite").option("compression", codec).parquet(path)
    assert spark.read.parquet(path).count() == li.count()


def test_sequencefile_text_roundtrip(spark, li, tmp_path):
    """Impala text-in-SequenceFile (hdfs-sequence-scanner.cc): write
    via saveAsSequenceFile, scan back with '\\x01'/'\\N' conventions,
    NULLs included."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    from incubator_impala_spark.sources import formats

    src = li.select(
        "l_orderkey",
        F.when(F.col("l_quantity") < 3, None)
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
    )
    path = str(tmp_path / "seq")
    formats.write_sequence_text(src, path)
    back = formats.read_sequence_text(
        spark, path, _parse_datatype_string("l_orderkey bigint, l_quantity double")
    )
    assert back.count() == src.count()
    assert (
        back.where("l_quantity IS NULL").count()
        == src.where("l_quantity IS NULL").count()
    )
    want = src.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        F.sum("l_orderkey").alias("k"),
    ).collect()[0]
    got = back.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        F.sum("l_orderkey").alias("k"),
    ).collect()[0]
    assert (got.s, got.k) == (want.s, want.k)


def test_rcfile_roundtrip_via_hive_serde():
    """RCFile scan/write (reference: be/src/exec/hdfs-rcfile-scanner.cc)
    through an external Hive serde table — needs
    spark.sql.catalogImplementation=hive at session build, so run in a
    subprocess JVM (same pattern as the Hive-UDF call-through)."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from incubator_impala_spark.sources.formats import read_rcfile, write_rcfile
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.catalogImplementation", "hive")
         .config("spark.sql.warehouse.dir", "/tmp/hive_rcfile_wh")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
src = spark.createDataFrame(
    [(1, "alpha", 1.5), (2, "beta", None), (3, None, -2.25)],
    "k int, s string, v double")
write_rcfile(src, "/tmp/rcfile_rt")
back = read_rcfile(spark, "/tmp/rcfile_rt", src.schema)
got = sorted([tuple(r) for r in back.collect()])
want = sorted([tuple(r) for r in src.collect()])
assert got == want, (got, want)
# column pruning reaches the serde scan: single-column projection runs
one = back.select("s").collect()
assert sorted(x.s for x in one if x.s) == ["alpha", "beta"]
print("RCFILE_OK")
"""
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd="/tmp",
    )
    assert "RCFILE_OK" in res.stdout, res.stderr[-2000:]
