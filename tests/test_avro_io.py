"""Avro scan/write parity — the reference's hdfs-avro-scanner surface
(be/src/exec/hdfs-avro-scanner.cc): object-container decode, null +
deflate codecs, and reader-schema resolution (rename via aliases,
defaults for added fields, dropped fields, numeric promotion) — run
through the distributed Spark bridge, not just the codec layer."""

from __future__ import annotations

import glob
import json

import pytest

from incubator_impala_spark.sources import avro_io as A

WRITER = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "int"},
        {"name": "old_name", "type": ["null", "string"]},
        {"name": "dropped", "type": "string"},
        {"name": "score", "type": "long"},
    ],
}
READER = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"], "aliases": ["old_name"]},
        {"name": "added", "type": "string", "default": "dflt"},
        {"name": "score", "type": "double"},
    ],
}


def _records(n, base=0):
    return [
        {
            "id": base + i,
            "old_name": None if i % 5 == 0 else f"n{base + i}",
            "dropped": "x",
            "score": i * 3,
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    recs = _records(500)
    blob = A.write_container(WRITER, recs, codec=codec)
    schema, out = A.read_container(blob)
    assert schema == WRITER
    assert out == recs


def test_spark_read_with_schema_evolution(spark, tmp_path):
    d = tmp_path / "av"
    d.mkdir()
    for i, codec in enumerate(["null", "deflate"]):
        (d / f"f{i}.avro").write_bytes(
            A.write_container(WRITER, _records(100, base=i * 100), codec=codec)
        )
    df = A.read_avro(spark, str(d), reader_schema=READER)
    assert df.schema.simpleString() == (
        "struct<id:bigint,name:string,added:string,score:double>"
    )
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 200
    assert rows[0].name is None and rows[1].name == "n1"
    assert rows[101].name == "n101"  # alias-renamed field, file 2
    assert all(r.added == "dflt" for r in rows.values())  # default applied
    assert rows[7].score == 21.0  # long -> double promotion
    assert "dropped" not in df.columns


def test_spark_write_read_roundtrip(spark, tmp_path):
    from tests.conftest import SF_SMALL

    from incubator_impala_spark.sources.tables import load_table

    li = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .repartition(4)
    )
    out = str(tmp_path / "li_avro")
    n_files = A.write_avro(li, out, codec="deflate")
    assert n_files == 4
    assert len(glob.glob(out + "/*.avro")) == 4
    back = A.read_avro(spark, out)
    assert back.count() == li.count()
    from pyspark.sql import functions as F

    dec = F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
    want = li.agg(dec).collect()[0][0]
    got = back.agg(dec).collect()[0][0]
    assert got == want


def test_read_without_reader_schema_uses_writer_schema(spark, tmp_path):
    d = tmp_path / "one"
    d.mkdir()
    (d / "a.avro").write_bytes(A.write_container(WRITER, _records(10)))
    df = A.read_avro(spark, str(d))
    assert set(df.columns) == {"id", "old_name", "dropped", "score"}
    assert df.count() == 10


def test_avro_schema_for_df_rejects_complex(spark):
    df = spark.sql("SELECT array(1, 2) AS a")
    with pytest.raises(ValueError, match="unsupported spark type"):
        A.avro_schema_for_df(df)


def test_nested_complex_decode():
    schema = {
        "type": "record",
        "name": "n",
        "fields": [
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "props", "type": {"type": "map", "values": "int"}},
            {"name": "kind", "type": {
                "type": "enum", "name": "k", "symbols": ["A", "B"]}},
        ],
    }
    recs = [
        {"tags": ["x", "y", "z"], "props": {"a": 1, "b": 2}, "kind": "B"},
        {"tags": [], "props": {}, "kind": "A"},
    ]
    blob = A.write_container(schema, recs)
    _, out = A.read_container(blob)
    assert out == recs


def test_json_schema_string_compat():
    # schema JSON written by other tools round-trips through our header
    blob = A.write_container(json.loads(json.dumps(WRITER)), _records(3))
    schema, out = A.read_container(blob)
    assert [f["name"] for f in schema["fields"]] == [
        "id", "old_name", "dropped", "score",
    ]
    assert len(out) == 3


# --- round 3: header-only discovery, intra-file splits, union/promotions ---


def test_read_header_stops_before_first_block():
    blob = A.write_container(WRITER, _records(1000))
    import io as _io

    fh = _io.BytesIO(blob)
    schema, codec, sync = A.read_header(fh)
    assert schema == WRITER and codec == "null" and len(sync) == 16
    # header of this schema is well under 1 KB; the 1000-record body
    # must not have been consumed
    assert fh.tell() < 1024 < len(blob)


def test_multi_block_roundtrip():
    recs = _records(1000)
    blob = A.write_container(WRITER, recs, max_block_records=100)
    schema, out = A.read_container(blob)
    assert out == recs


def test_single_file_splits_into_multiple_tasks(spark, tmp_path):
    """One multi-block container file must fan out across >1 task
    (reference scan-range splitting, hdfs-avro-scanner.cc) and still
    decode every record exactly once."""
    recs = _records(5000)
    blob = A.write_container(WRITER, recs, max_block_records=100)
    p = tmp_path / "big.avro"
    p.write_bytes(blob)
    # ~50 blocks; split every 4 KB → many ranges
    df = A.read_avro(spark, str(p), reader_schema=READER, split_bytes=4096)
    n_parts = df.rdd.getNumPartitions()
    assert n_parts > 1
    ids = sorted(r.id for r in df.collect())
    assert ids == list(range(5000))  # no dup, no loss across ranges


def test_split_planning_covers_file_exactly():
    import os

    recs = _records(2000)
    blob = A.write_container(WRITER, recs, max_block_records=50)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "f.avro")
        with open(p, "wb") as fh:
            fh.write(blob)
        splits = A.plan_avro_splits(p, 2048)
        assert len(splits) > 1
        # contiguous, non-overlapping, ending at file size
        for (f1, _, e1), (f2, s2, _) in zip(splits, splits[1:]):
            assert e1 == s2
        assert splits[-1][2] == len(blob)


def test_union_branch_selected_by_value_type():
    schema = {
        "type": "record",
        "name": "u",
        "fields": [{"name": "v", "type": ["null", "long", "string"]}],
    }
    recs = [{"v": None}, {"v": 42}, {"v": "forty-two"}]
    _, out = A.read_container(A.write_container(schema, recs))
    assert out == recs


def test_resolve_string_bytes_promotion():
    w = {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "string"},
                    {"name": "b", "type": "bytes"}]}
    r = {"type": "record", "name": "r",
         "fields": [{"name": "a", "type": "bytes"},
                    {"name": "b", "type": "string"}]}
    out = A.resolve(w, r, {"a": "hi", "b": b"yo"})
    assert out == {"a": b"hi", "b": "yo"}


def test_resolve_promotion_through_nullable_union():
    w = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": ["null", "int"]}]}
    r = {"type": "record", "name": "r",
         "fields": [{"name": "x", "type": ["null", "double"]}]}
    assert A.resolve(w, r, {"x": 7}) == {"x": 7.0}
    assert A.resolve(w, r, {"x": None}) == {"x": None}
