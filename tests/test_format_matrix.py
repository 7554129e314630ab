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
