"""Format x query matrix — the reference runs its query corpus over
every (file format, codec) combination (tests/common/impala_test_suite
.py parametrizes workloads by table_format); the isolated format tests
in test_formats.py cannot see format-specific TYPE drift flowing
through real query shapes (timestamp precision, decimal scale, null
defaults).

Method: round-trip the sf0.001 TPC-H tables through the repo's own
writers/readers for each format, land the round-tripped rows as a
parquet sf-dir, and run representative corpus entries against it —
results must be IDENTICAL to the parquet-sourced run (collected and
compared row-wise, zero tolerance). Any value the format layer bends
shows up as a query-level diff naming the query and format.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

# every table these queries touch (events via the normalizing loader —
# its raw physical layout differs by driver round); embeddings is
# present because register_tables()-based entries read the whole set
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "events", "embeddings"]

# one per family: scan+agg, join chain, selective filter, null-aware
# anti join, rollup, window frames, set op, nested build+HOF, lateral
# unnest, top-n, text pipeline, distinct agg
MATRIX_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q6", "join_not_in_with_nulls",
    "agg_rollup", "analytic_window_frames", "setop_intersect_except",
    "nested_tpch_order_totals", "unnest_words", "topn_offset",
    "pipeline_text_token_stats", "agg_multi_distinct",
]


@pytest.fixture(scope="module", params=["orc", "avro"])
def fmt_sf_dir(request, spark, tmp_path_factory):
    """A parquet sf-dir whose rows went through a <fmt> round-trip
    written and read by the repo's format layer."""
    fmt = request.param
    from incubator_impala_spark.sources.formats import read_as, write_as

    from incubator_impala_spark.sources.tables import load_table

    base = tmp_path_factory.mktemp(f"fmt_matrix_{fmt}")
    for t in TABLES:
        # events needs the normalizing loader (nanos-vs-micros ts);
        # write the NORMALIZED form (ts timestamp + ts_ns bigint) and
        # land it back with both columns so load_table's micros branch
        # re-derives ts_ns identically
        src = (load_table(spark, SF_SMALL, t).drop("ts_ns")
               if t == "events"
               else spark.read.parquet(f"{SF_SMALL}/{t}.parquet"))
        if t == "embeddings" and fmt == "avro":
            # the pure-Python avro writer scopes out nested arrays
            # (documented contract) — present for register_tables,
            # not avro-round-tripped
            src.write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
            continue
        fpath = str(base / f"{t}.{fmt}")
        write_as(src, fpath, fmt)
        back = read_as(spark, fpath, fmt)
        # land as parquet under the loader's expected layout; any type
        # or value drift the format introduced is preserved here
        back.write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return fmt, str(base)


def _q(name):
    from incubator_impala_spark.queries import QUERIES

    return QUERIES[name]


@pytest.mark.parametrize("name", MATRIX_QUERIES)
def test_query_over_format_roundtrip(spark, fmt_sf_dir, name):
    fmt, fdir = fmt_sf_dir
    expected = _q(name)(spark, SF_SMALL).collect()
    got = _q(name)(spark, fdir).collect()
    assert len(expected) > 0, f"{name}: empty baseline is a weak test"
    assert len(got) == len(expected), f"{name} over {fmt}: row count"
    for i, (e, g) in enumerate(zip(expected, got)):
        assert e == g, f"{name} over {fmt}: row {i}: {e} != {g}"


def test_lineitem_shipdate_survives_both_formats(spark, fmt_sf_dir):
    """The known drift risk: l_shipdate is timestamp[us]; ORC stores
    nanos-capable timestamps, Avro (the pure-Python container) maps to
    micros — both must round-trip exactly at µs."""
    fmt, fdir = fmt_sf_dir
    a = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_shipdate") \
        .orderBy("l_orderkey", "l_linenumber").collect()
    b = spark.read.parquet(f"{fdir}/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_shipdate") \
        .orderBy("l_orderkey", "l_linenumber").collect()
    assert a == b, f"shipdate drift through {fmt}"


# ---------------------------------------------------------------------------
# Per-partition mixed-format dispatch (mixedformat.py): the
# reference's incompatible_avro_partition.test — a non-avro table
# gains an avro partition; queries keep the declared types, reading
# the bad partition raises AvroSchemaUtils.reconcileSchemas' error,
# and a pruned scan still succeeds
# (tests/metadata/test_partition_metadata.py parametrizes
# $MAIN_TABLE_FORMAT over parquetfile/textfile; the reference xfails
# its parquetfile variant on IMPALA-7309 — a catalog-implementation
# bug this engine does not share, so both variants run green here).
# ---------------------------------------------------------------------------

_INCOMPAT_QT = ("/root/reference/testdata/workloads/functional-query/"
                "queries/QueryTest/incompatible_avro_partition.test")


def _stage_alltypes_avro(engine):
    """Stage what the reference's load carries at
    /test-warehouse/alltypes_avro/year=2009/month=1: an avro
    container with the alltypes avro schema (tinyint/smallint as
    avro int — avro has no 8/16-bit types)."""
    import os

    from incubator_impala_spark.sources import avro_io

    d = engine._resolve_fs_path("/test-warehouse/alltypes_avro/"
                                "year=2009/month=1")
    os.makedirs(d, exist_ok=True)
    schema = {"type": "record", "name": "a", "fields": [
        {"name": n, "type": ["null", t]} for n, t in [
            ("id", "int"), ("bool_col", "boolean"),
            ("tinyint_col", "int"), ("smallint_col", "int"),
            ("int_col", "int"), ("bigint_col", "long"),
            ("float_col", "float"), ("double_col", "double"),
            ("date_string_col", "string"), ("string_col", "string"),
            ("timestamp_col", "string")]]}
    rec = {"id": 0, "bool_col": True, "tinyint_col": 1,
           "smallint_col": 1, "int_col": 1, "bigint_col": 10,
           "float_col": 1.0, "double_col": 10.0,
           "date_string_col": "01/01/09", "string_col": "0",
           "timestamp_col": "2009-01-01 00:00:00"}
    with open(os.path.join(d, "alltypes.avro"), "wb") as fh:
        fh.write(avro_io.write_container(schema, [rec]))
    return d


@pytest.mark.parametrize("main_fmt", ["parquetfile", "textfile"])
def test_incompatible_avro_partition(engine, main_fmt):
    import collections
    import os

    from incubator_impala_spark.testing import querytest as qt

    if not os.path.exists(_INCOMPAT_QT):
        pytest.skip("reference workload texts not present")
    _stage_alltypes_avro(engine)
    engine.sql("drop table if exists mixed")
    blocks = qt.parse_test_file(_INCOMPAT_QT)
    for b in blocks:
        # the reference's pytest driver substitutes test_file_vars
        # before the harness sees the text — do the same
        b.query = b.query.replace("$MAIN_TABLE_FORMAT", main_fmt)
    results = qt.run_blocks(
        engine, blocks, database=f"qtest_incompat_{main_fmt}",
        strict_catch=True)
    counts = collections.Counter(r.status for r in results)
    bad = [f"[{r.index}] {r.status}: {r.reason}\n    "
           + "\n    ".join(str(d) for d in r.diffs[:3])
           for r in results if r.status in ("fail", "error")]
    engine.sql("drop table if exists mixed")
    assert not bad, f"{dict(counts)}\n" + "\n".join(bad)
    # the 3 typed SELECTs + the reconciliation-error CATCH verify;
    # the DDL/DML staging blocks have no RESULTS sections
    assert counts.get("pass", 0) >= 4, dict(counts)
