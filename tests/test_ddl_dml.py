"""DML/DDL surface tests (SURVEY.md §2.13 / build plan M4): CTAS,
INSERT INTO / INSERT OVERWRITE PARTITION with dynamic-partition
semantics, clustered partitioned writes, COMPUTE STATS → ANALYZE, and
partition pruning on the written layout — the reference's
HdfsTableSink + catalog statements (CreateTableAsSelectStmt.java,
ComputeStatsStmt.java, HdfsPartitionPruner.java) re-expressed on
Spark's catalog."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def db(spark, tmp_path):
    name = "ddl_test_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name} LOCATION '{tmp_path}/wh'")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def _lineitem(spark):
    from incubator_impala_spark.sources.tables import load_table

    return load_table(spark, SF_SMALL, "lineitem")


def test_ctas_roundtrip(spark, db):
    _lineitem(spark).createOrReplaceTempView("li_src")
    spark.sql(
        f"CREATE TABLE {db}.li_small AS "
        "SELECT l_orderkey, l_quantity, l_returnflag FROM li_src "
        "WHERE l_quantity < 10"
    )
    want = spark.table("li_src").where("l_quantity < 10").count()
    assert spark.table(f"{db}.li_small").count() == want
    cols = [f.name for f in spark.table(f"{db}.li_small").schema.fields]
    assert cols == ["l_orderkey", "l_quantity", "l_returnflag"]


def test_insert_into_appends(spark, db):
    spark.sql(f"CREATE TABLE {db}.t_app (k INT, v STRING)")
    spark.sql(f"INSERT INTO {db}.t_app VALUES (1, 'a'), (2, 'b')")
    spark.sql(f"INSERT INTO {db}.t_app VALUES (3, 'c')")
    assert spark.table(f"{db}.t_app").count() == 3


def test_insert_overwrite_dynamic_partitions(spark, db):
    """Impala INSERT OVERWRITE PARTITION replaces only the partitions
    present in the input — dynamic mode, not whole-table truncate."""
    from incubator_impala_spark.sources import sink

    sink.configure_dynamic_overwrite(spark)
    spark.sql(
        f"CREATE TABLE {db}.t_part (v STRING) PARTITIONED BY (p INT)"
    )
    spark.sql(f"INSERT INTO {db}.t_part PARTITION(p=1) VALUES ('one')")
    spark.sql(f"INSERT INTO {db}.t_part PARTITION(p=2) VALUES ('two')")
    # overwrite only p=2
    spark.sql(f"INSERT OVERWRITE TABLE {db}.t_part PARTITION(p=2) VALUES ('TWO')")
    rows = {(r.p, r.v) for r in spark.table(f"{db}.t_part").collect()}
    assert rows == {(1, "one"), (2, "TWO")}


def test_partitioned_clustered_write_and_pruning(spark, tmp_path):
    """write_partitioned lays out partition dirs; a filtered read must
    prune partitions (the reference's HdfsPartitionPruner.java:80 —
    on Spark, PartitionFilters in the scan node)."""
    from incubator_impala_spark.sources import sink

    li = _lineitem(spark)
    path = f"{tmp_path}/li_by_flag"
    sink.write_partitioned(
        li, path, partition_cols=["l_returnflag"], clustered_by=["l_shipdate"]
    )
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    plan = back.where("l_returnflag = 'R'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:200]
    want = li.where("l_returnflag = 'R'").count()
    assert back.where("l_returnflag = 'R'").count() == want


def test_compute_stats_feeds_cbo(spark, db, engine):
    """COMPUTE STATS (Impala spelling) must run through the dialect as
    ANALYZE TABLE and make row counts visible to the optimizer."""
    _lineitem(spark).createOrReplaceTempView("li_src")
    spark.sql(f"CREATE TABLE {db}.t_stats AS SELECT * FROM li_src")
    out = engine.translate(f"COMPUTE STATS {db}.t_stats")
    assert out == (
        f"ANALYZE TABLE {db}.t_stats COMPUTE STATISTICS FOR ALL COLUMNS"
    )
    engine.sql(f"COMPUTE STATS {db}.t_stats").collect()
    desc = spark.sql(f"DESC EXTENDED {db}.t_stats").collect()
    stats = [r for r in desc if r.col_name == "Statistics"]
    assert stats and "rows" in stats[0].data_type


def test_show_and_describe(spark, db):
    spark.sql(f"CREATE TABLE {db}.t_show (a INT, b STRING)")
    tables = {r.tableName for r in spark.sql(f"SHOW TABLES IN {db}").collect()}
    assert "t_show" in tables
    cols = {r.col_name for r in spark.sql(f"DESCRIBE {db}.t_show").collect()}
    assert {"a", "b"} <= cols


def test_compact_small_files(spark, tmp_path):
    """200 tiny files -> a handful of right-sized ones, same rows."""
    from incubator_impala_spark.sources.sink import compact_small_files

    li = _lineitem(spark)
    path = f"{tmp_path}/fragmented"
    li.repartition(200).write.parquet(path)
    import glob

    assert len(glob.glob(f"{path}/*.parquet")) == 200
    want = li.count()
    n = compact_small_files(spark, path, target_file_mb=128)
    got_files = glob.glob(f"{path}/*.parquet")
    assert len(got_files) == n <= 4
    assert spark.read.parquet(path).count() == want


# ---------------------------------------------------------------------------
# Function DDL surface (reference: CreateUdfStmt.java, CreateUdaStmt,
# ShowFunctionsStmt, DropFunctionStmt; grammar sql-parser.cup
# create_udf_stmt) — SQL-created functions, listed and dropped in SQL.
# ---------------------------------------------------------------------------


def test_create_function_ddl_translation(engine):
    out = engine.translate(
        "CREATE FUNCTION my_fn(INT, STRING) RETURNS INT "
        "LOCATION '/does/not/exist.jar' SYMBOL='com.example.MyFn'"
    )
    assert out == "CREATE TEMPORARY FUNCTION my_fn AS 'com.example.MyFn'"
    out = engine.translate("SHOW AGGREGATE FUNCTIONS IN mydb 'ds_kll*'")
    assert out == "SHOW USER FUNCTIONS LIKE 'ds_kll*'"
    out = engine.translate("DROP FUNCTION IF EXISTS my_fn(INT, STRING)")
    assert out == "DROP TEMPORARY FUNCTION IF EXISTS my_fn"


def test_sql_function_lifecycle(engine):
    """Create in SQL, call in a query, SHOW lists it, DROP removes it."""
    engine.sql(
        "CREATE TEMPORARY FUNCTION plus_two(x INT) RETURNS INT RETURN x + 2"
    )
    assert engine.sql("SELECT plus_two(40) AS v").collect()[0].v == 42
    listed = {r.function for r in engine.sql("SHOW FUNCTIONS 'plus*'").collect()}
    assert any("plus_two" in f for f in listed)
    engine.sql("DROP FUNCTION plus_two(INT)")
    listed = {r.function for r in engine.sql("SHOW FUNCTIONS 'plus*'").collect()}
    assert not any("plus_two" in f for f in listed)


def test_show_functions_lists_registered_udfs(engine):
    listed = {r.function for r in engine.sql("SHOW FUNCTIONS").collect()}
    joined = ",".join(listed)
    assert "fnv_hash" in joined and "ds_kll_sketch" in joined


def test_hive_java_udf_call_through():
    """End-to-end Hive GenericUDF via the Impala CREATE FUNCTION form.

    Needs spark.sql.catalogImplementation=hive at session build, which
    can't be flipped on the shared test session — run in a subprocess
    JVM (the reference's equivalent needs a whole cluster; ours needs
    a second JVM)."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from incubator_impala_spark import dialect
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.catalogImplementation", "hive")
         .config("spark.sql.warehouse.dir", "/tmp/hive_udf_wh")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
stmt = dialect.translate(
    "CREATE FUNCTION hive_upper LOCATION '' "
    "SYMBOL='org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper'")
assert stmt == "CREATE TEMPORARY FUNCTION hive_upper AS " \\
    "'org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper'", stmt
spark.sql(stmt)
assert spark.sql("SELECT hive_upper('abc') AS v").collect()[0].v == "ABC"
spark.sql(dialect.translate("DROP FUNCTION hive_upper()"))
print("HIVE_UDF_OK")
"""
    res = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd="/tmp",
    )
    assert "HIVE_UDF_OK" in res.stdout, res.stderr[-2000:]


# ---------------------------------------------------------------------------
# LOAD DATA (LoadDataStmt.java) + ALTER TABLE ADD PARTITION
# (AlterTableAddPartitionStmt.java)
# ---------------------------------------------------------------------------


def test_load_data_into_partitioned_table(spark, engine, tmp_path):
    spark.sql("DROP TABLE IF EXISTS ld_pt")
    spark.sql(
        "CREATE TABLE ld_pt (x INT, p STRING) USING parquet PARTITIONED BY (p)"
    )
    try:
        staged = str(tmp_path / "staged")
        spark.range(5).selectExpr("CAST(id AS INT) AS x").write.parquet(staged)
        engine.sql(f"LOAD DATA INPATH '{staged}' INTO TABLE ld_pt PARTITION (p='a')")
        assert spark.table("ld_pt").where("p = 'a'").count() == 5
        # append again
        engine.sql(f"LOAD DATA INPATH '{staged}' INTO TABLE ld_pt PARTITION (p='a')")
        assert spark.table("ld_pt").where("p = 'a'").count() == 10
        # second partition untouched by the overwrite of 'a'
        engine.sql(f"LOAD DATA INPATH '{staged}' INTO TABLE ld_pt PARTITION (p='b')")
        engine.sql(
            f"LOAD DATA INPATH '{staged}' OVERWRITE INTO TABLE ld_pt PARTITION (p='a')"
        )
        assert spark.table("ld_pt").where("p = 'a'").count() == 5
        assert spark.table("ld_pt").where("p = 'b'").count() == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ld_pt")


def test_load_data_unpartitioned(spark, engine, tmp_path):
    spark.sql("DROP TABLE IF EXISTS ld_flat")
    spark.sql("CREATE TABLE ld_flat (x INT) USING parquet")
    try:
        staged = str(tmp_path / "flat")
        spark.range(7).selectExpr("CAST(id AS INT) AS x").write.parquet(staged)
        engine.sql(f"LOAD DATA INPATH '{staged}' INTO TABLE ld_flat")
        assert spark.table("ld_flat").count() == 7
    finally:
        spark.sql("DROP TABLE IF EXISTS ld_flat")


def test_alter_table_add_partition_visibility(spark, engine):
    spark.sql("DROP TABLE IF EXISTS ap_pt")
    spark.sql(
        "CREATE TABLE ap_pt (x INT, p STRING) USING parquet PARTITIONED BY (p)"
    )
    try:
        engine.sql("ALTER TABLE ap_pt ADD IF NOT EXISTS PARTITION (p='z')")
        parts = {r.partition for r in engine.sql("SHOW PARTITIONS ap_pt").collect()}
        assert "p=z" in parts
        engine.sql("ALTER TABLE ap_pt DROP IF EXISTS PARTITION (p='z')")
        parts = {r.partition for r in engine.sql("SHOW PARTITIONS ap_pt").collect()}
        assert "p=z" not in parts
    finally:
        spark.sql("DROP TABLE IF EXISTS ap_pt")
