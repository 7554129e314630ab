"""insert_parquet_multi_codecs.test / insert_parquet_invalid_codec
semantics (reference tests/query_test/test_insert_parquet.py:
TestInsertParquetMultiCodecs / TestInsertParquetInvalidCodec;
hdfs-parquet-table-writer.cc:1010-1035 codec validation + mapping).

The .test blocks carry no RESULTS sections — the reference verifies
python-side (select-all equality of the default-codec and mixed
zstd/gzip tables). This test runs the same statements through the
engine and adds the file-level assertion the reference gets from its
scanners: the written files actually carry the requested codecs.
"""
from __future__ import annotations

import glob
import os

import pytest


@pytest.fixture(scope="module")
def codec_engine(engine):
    from incubator_impala_spark.sources.functional import (
        register_functional,
    )

    register_functional(engine.spark)
    return engine


def _codecs_of(table_dir: str) -> set[str]:
    import pyarrow.parquet as pq

    out = set()
    for f in glob.glob(os.path.join(table_dir, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            out.add(md.row_group(rg).column(0).compression.lower())
    return out


def test_insert_parquet_multi_codecs(codec_engine):
    eng = codec_engine
    wh = eng._warehouse_dir()
    for t in ("t1_default", "t1_zstd_gzip"):
        eng.sql(f"DROP TABLE IF EXISTS {t}")
    cols = ("c1 tinyint, c2 smallint, c3 int, c4 bigint, c5 boolean, "
            "c6 float, c7 real, c8 double, c9 decimal(20,15), "
            "c10 timestamp, c11 char(10), c13 varchar(20), c14 string")
    sel = ("select tinyint_col, smallint_col, id, bigint_col, "
           "bool_col, float_col, double_col, double_col, "
           "cast(float_col as decimal(20,15)), timestamp_col, "
           "cast(year as char(10)), cast(double_col as varchar(10)), "
           "string_col from alltypes")
    eng.sql(f"create table t1_default ({cols}) stored as parquet")
    eng.sql(f"create table t1_zstd_gzip ({cols}) stored as parquet")
    eng.sql(f"insert into t1_default {sel}")
    eng.sql("insert into t1_default(c3) values (8000),(9000)")
    eng.sql("SET COMPRESSION_CODEC=ZSTD")
    eng.sql(f"insert into t1_zstd_gzip {sel} where id < 4000")
    eng.sql("SET COMPRESSION_CODEC=GZIP")
    eng.sql("insert into t1_zstd_gzip(c3) values (9000)")
    eng.sql(f"insert into t1_zstd_gzip {sel} where id >= 4000")
    eng.sql("SET COMPRESSION_CODEC=ZSTD")
    eng.sql("insert into t1_zstd_gzip(c3) values(8000)")
    eng.sql("SET COMPRESSION_CODEC=NONE")

    base = eng.sql("select * from t1_default order by c3").collect()
    test = eng.sql("select * from t1_zstd_gzip order by c3").collect()
    assert base == test
    assert len(base) == 7302
    # the mixed table's files really carry both requested codecs
    codecs = _codecs_of(os.path.join(wh, "t1_zstd_gzip"))
    assert codecs == {"zstd", "gzip"}, codecs
    for t in ("t1_default", "t1_zstd_gzip"):
        eng.sql(f"DROP TABLE {t}")


def test_insert_parquet_invalid_codec(codec_engine):
    eng = codec_engine
    eng.sql("DROP TABLE IF EXISTS parquet_invalid_codec")
    eng.sql("create table if not exists parquet_invalid_codec "
            "(x BIGINT) stored as parquet")
    eng.sql("SET COMPRESSION_CODEC=bzip2")
    try:
        with pytest.raises(Exception,
                           match="Invalid parquet compression codec "
                                 "bzip2"):
            eng.sql("insert overwrite table parquet_invalid_codec "
                    "select 1")
    finally:
        eng.sql("SET COMPRESSION_CODEC=NONE")
        eng.compression_codec = None
        eng.sql("drop table parquet_invalid_codec")
