"""Per-partition mixed-format scan dispatch (mixedformat.py): the
ALTER PARTITION SET FILEFORMAT / SET LOCATION round-trip and the
pruning-aware Avro reconciliation error — unit-level twins of the
reference's incompatible_avro_partition.test (wired with recorded
results in test_format_matrix.py).

Reference: fe/.../catalog/HdfsStorageDescriptor.java:46-82 (format is
per-partition metadata), fe/src/main/cup/sql-parser.cup:1206 (the
ALTER grammar), fe/.../util/AvroSchemaUtils.java reconcileSchemas."""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def avro_dir(tmp_path):
    from incubator_impala_spark.sources import avro_io

    schema = {"type": "record", "name": "r", "fields": [
        {"name": "i", "type": ["null", "int"]},
        {"name": "t", "type": ["null", "int"]},
        {"name": "s", "type": ["null", "string"]}]}
    d = str(tmp_path / "avpart")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "f1.avro"), "wb") as fh:
        fh.write(avro_io.write_container(
            schema, [{"i": 9, "t": 9, "s": "x"}]))
    return d


def _fresh(engine, name, tcol):
    engine.sql(f"drop table if exists {name}")
    engine.sql(f"create table {name} (i int, t {tcol}, s string) "
               f"partitioned by (p int) stored as parquet")
    engine.sql(f"insert into {name} partition (p=1) "
               f"values (1, 2, 'a')")
    engine.sql(f"alter table {name} add partition (p=2)")
    engine.sql(f"alter table {name} partition (p=2) "
               f"set fileformat avro")


def test_alter_fileformat_roundtrip(engine, avro_dir):
    from incubator_impala_spark import scan_errors as se

    _fresh(engine, "mixrt", "tinyint")
    # dispatch active, avro partition empty: original rows + types
    assert engine.mixed_tables.get("mixrt")
    rows = engine.sql("select * from mixrt").collect()
    assert [tuple(r) for r in rows] == [(1, 2, "a", 1)]
    # SHOW PARTITIONS reflects the per-partition format
    fmts = {r["p"]: r["Format"] for r in
            engine.sql("show partitions mixrt").collect()
            if r["p"] not in ("Total",)}
    assert fmts == {"1": "PARQUET", "2": "AVRO"}
    # incompatible avro data: unpruned scans raise the reference's
    # reconcileSchemas error, pruned scans still succeed
    engine.sql(f"alter table mixrt partition (p=2) "
               f"set location '{avro_dir}'")
    engine.sql("refresh mixrt")
    with pytest.raises(se.ScanError,
                       match=r"Unresolvable types for column 't': "
                             r"declared column type: TINYINT, "
                             r"table's Avro schema type: int"):
        engine.sql("select * from mixrt").collect()
    assert engine.sql(
        "select count(*) c from mixrt where p = 1").collect()[0][0] == 1
    engine.sql("drop table mixrt")
    assert "mixrt" not in getattr(engine, "mixed_tables", {})


def test_compatible_avro_partition_union(engine, avro_dir):
    _fresh(engine, "mixok", "int")
    engine.sql(f"alter table mixok partition (p=2) "
               f"set location '{avro_dir}'")
    rows = sorted(tuple(r) for r in
                  engine.sql("select * from mixok").collect())
    assert rows == [(1, 2, "a", 1), (9, 9, "x", 2)]
    # base partitions keep flowing through the catalog table (one
    # pruned leg), only the overridden partition reads raw
    engine.sql("drop table mixok")
