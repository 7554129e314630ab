"""Multi-format scan/write surface — the reference's scanner matrix.

Reference scanners (SURVEY.md §2.1): Parquet
(`be/src/exec/parquet/hdfs-parquet-scanner.cc`), ORC
(`hdfs-orc-scanner.cc`), delimited text (`hdfs-text-scanner.cc` +
`delimited-text-parser.cc`), Avro (`hdfs-avro-scanner.cc`), legacy
RC/Sequence (out of scope). Formats enum:
`common/thrift/CatalogObjects.thrift:60-70`.

Spark's DataSource v2 covers each with split planning, predicate
pushdown (parquet + orc), and schema handling. This module is the thin
catalog: one place that knows the format names, their reference-parity
options (Impala text tables default to '\\x01' field delimiters,
header-less, with '\\N' NULLs — mirrored in TEXT_OPTIONS), and which
formats this build actually has (avro ships as an external module; we
degrade gracefully when absent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Impala delimited-text defaults (hdfs-text-scanner; table defaults in
# the reference's CREATE TABLE ... ROW FORMAT DELIMITED docs).
TEXT_OPTIONS = {
    "sep": "\x01",
    "header": "false",
    "nullValue": "\\N",
    "escape": "\\",
}

# CSV as users actually write it (header row, comma).
CSV_OPTIONS = {"sep": ",", "header": "true", "nullValue": ""}


def has_native_avro(spark: SparkSession) -> bool:
    """True when the external spark-avro datasource jar is on the
    classpath (it is not bundled with pip pyspark)."""
    try:
        spark.read.format("avro").schema(StructType([])).load("/nonexistent")
    except Exception as e:  # noqa: BLE001
        return "Failed to find data source" not in str(e)
    return True


def available_formats(spark: SparkSession) -> list[str]:
    """Formats this engine can scan. Avro is always available: the
    native spark-avro module when on the classpath, else the pure-
    Python object-container reader (`sources/avro_io.py` — schema
    evolution included, like the reference's hdfs-avro-scanner)."""
    return ["parquet", "orc", "csv", "json", "avro"]


def write_as(df: DataFrame, path: str, fmt: str, **options: str) -> None:
    if fmt == "avro" and not has_native_avro(df.sparkSession):
        from incubator_impala_spark.sources import avro_io

        avro_io.write_avro(df, path, codec=options.get("codec", "deflate"))
        return
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        w = w.options(**{**CSV_OPTIONS, **options})
    elif fmt == "text_impala":
        w = df.write.mode("overwrite").format("csv").options(
            **{**TEXT_OPTIONS, **options}
        )
    else:
        w = w.options(**options)
    w.save(path)


def read_as(spark: SparkSession, path: str, fmt: str,
            schema: StructType | None = None, **options: str) -> DataFrame:
    """Schema-on-read: CSV/JSON take an explicit schema (the
    reference's declared-schema model — no inference surprises);
    parquet/ORC carry their own."""
    if fmt == "avro" and not has_native_avro(spark):
        from incubator_impala_spark.sources import avro_io

        return avro_io.read_avro(spark, path)
    if fmt == "text_impala":
        r = spark.read.format("csv").options(**{**TEXT_OPTIONS, **options})
    elif fmt == "csv":
        r = spark.read.format("csv").options(**{**CSV_OPTIONS, **options})
    else:
        r = spark.read.format(fmt).options(**options)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


# ---------------------------------------------------------------------------
# SequenceFile (reference: be/src/exec/hdfs-sequence-scanner.cc) —
# Impala's sequence tables hold one delimited text row per value
# (same '\x01'/'\N' conventions as text tables). Spark core reads and
# writes Hadoop SequenceFiles natively (sc.sequenceFile /
# saveAsSequenceFile), so the scan is: values -> split -> cast, all
# JVM-side after the initial read.
# RCFile (hdfs-rcfile-scanner.cc): Spark has no path-based RCFile
# datasource — the read path is a Hive-catalog serde table
# (STORED AS RCFILE, ColumnarSerDe from the bundled hive-serde jar).
# read_rcfile/write_rcfile below wrap that: an EXTERNAL serde table
# over the path, so the bytes live wherever the caller says and the
# scan/write go through Spark's normal HiveTableScan/InsertIntoHive
# operators (distributed, column-pruned via the columnar serde).
# Requires spark.sql.catalogImplementation=hive at session build —
# tested in a subprocess JVM like the Hive-UDF call-through.
# ---------------------------------------------------------------------------


def _require_hive_catalog(spark: SparkSession) -> None:
    impl = spark.conf.get("spark.sql.catalogImplementation", "in-memory")
    if impl != "hive":
        raise RuntimeError(
            "RCFile needs a Hive serde table: build the session with "
            "spark.sql.catalogImplementation=hive (reference scanner: "
            "be/src/exec/hdfs-rcfile-scanner.cc)"
        )


def _rcfile_ext_table(spark: SparkSession, path: str,
                      schema: StructType) -> str:
    # Stable digest, not hash(): Python string hashing is randomized
    # per process, which would mint a fresh metastore table per session
    # for the same path. With a stable name, re-reads replace the one
    # helper table (bounded residency: one table per distinct path; it
    # cannot be dropped eagerly because the returned scan is lazy).
    import hashlib

    name = f"rcfile_ext_{hashlib.md5(path.encode()).hexdigest()[:8]}"
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE EXTERNAL TABLE {name} ({cols}) STORED AS RCFILE "
        f"LOCATION '{path}'"
    )
    return name


def read_rcfile(spark: SparkSession, path: str,
                schema: StructType) -> DataFrame:
    """Scan an RCFile directory through an external Hive serde table."""
    _require_hive_catalog(spark)
    return spark.table(_rcfile_ext_table(spark, path, schema))


def write_rcfile(df: DataFrame, path: str) -> None:
    """Write a DataFrame as RCFile via an external Hive serde table."""
    spark = df.sparkSession
    _require_hive_catalog(spark)
    name = _rcfile_ext_table(spark, path, df.schema)
    df.write.insertInto(name, overwrite=True)


def read_sequence_text(spark: SparkSession, path: str,
                       schema: StructType) -> DataFrame:
    """Scan an Impala-style text SequenceFile into typed columns."""
    from pyspark.sql import functions as F

    lines = spark.sparkContext.sequenceFile(path).values()
    df = spark.createDataFrame(lines.map(lambda v: (v,)), "line string")
    parts = F.split(F.col("line"), "\x01")
    cols = []
    for i, field in enumerate(schema.fields):
        c = F.element_at(parts, i + 1)
        c = F.when(c == "\\N", None).otherwise(c)
        cols.append(c.cast(field.dataType).alias(field.name))
    return df.select(*cols)


def write_sequence_text(df: DataFrame, path: str) -> None:
    """Write rows as an Impala-style text SequenceFile."""
    from pyspark.sql import functions as F

    line = F.concat_ws(
        "\x01", *[
            F.coalesce(F.col(c).cast("string"), F.lit("\\N"))
            for c in df.columns
        ]
    )
    df.select(line.alias("l")).rdd.map(lambda r: ("", r.l)).saveAsSequenceFile(path)
