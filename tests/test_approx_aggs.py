"""Approximate-aggregate surface: ndv / appx_median / DataSketches HLL
(reference registrations BuiltinsDb.java:913-1082; estimator scalars
datasketches-functions-ir.cc). Estimators can't hash-match an exact
oracle, so this layer checks the properties that define them:
bounded relative error vs the exact answer, and sketch mergeability
(union of per-partition sketches == one global sketch). Also covers
the Engine SET option surface (query-options.h mapping)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def li_view(spark):
    from incubator_impala_spark.sources.tables import load_table

    load_table(spark, SF_SMALL, "lineitem").createOrReplaceTempView("li_approx")
    return "li_approx"


def test_ndv_macro_accuracy(engine, li_view):
    """Impala ndv() → approx_count_distinct; HLL error ≤ ~5% at this
    cardinality (reference documents ~1.9% typical for its NDV)."""
    row = engine.sql(
        f"SELECT ndv(l_orderkey) AS est, count(distinct l_orderkey) AS exact "
        f"FROM {li_view}"
    ).collect()[0]
    assert abs(row.est - row.exact) / row.exact < 0.05


def test_appx_median_macro(engine, li_view):
    row = engine.sql(
        f"SELECT appx_median(l_quantity) AS med FROM {li_view}"
    ).collect()[0]
    exact = engine.sql(
        f"SELECT percentile(l_quantity, 0.5) AS m FROM {li_view}"
    ).collect()[0].m
    assert abs(row.med - exact) <= 2.0


def test_ds_hll_sketch_estimate(engine, li_view):
    row = engine.sql(
        f"SELECT ds_hll_estimate(ds_hll_sketch(l_partkey)) AS est, "
        f"count(distinct l_partkey) AS exact FROM {li_view}"
    ).collect()[0]
    assert abs(row.est - row.exact) / row.exact < 0.05


def test_ds_hll_union_mergeability(engine, li_view):
    """Sketches built per partition then unioned must estimate like a
    single global sketch — the property that makes HLL work on a
    1000-executor cluster (partial agg → merge)."""
    merged = engine.sql(
        f"""
        SELECT ds_hll_estimate(ds_hll_union(sk)) AS est FROM (
          SELECT l_orderkey % 4 AS p, ds_hll_sketch(l_partkey) AS sk
          FROM {li_view} GROUP BY l_orderkey % 4)
        """
    ).collect()[0].est
    direct = engine.sql(
        f"SELECT ds_hll_estimate(ds_hll_sketch(l_partkey)) AS est FROM {li_view}"
    ).collect()[0].est
    assert merged == direct


def test_sampled_ndv_pattern(engine, li_view):
    """sampled_ndv (BuiltinsDb.java:1086) ≈ ndv over TABLESAMPLE."""
    est = engine.sql(
        f"SELECT ndv(l_orderkey) AS e FROM {li_view} TABLESAMPLE (50 PERCENT)"
    ).collect()[0].e
    exact = engine.sql(
        f"SELECT count(distinct l_orderkey) AS c FROM {li_view}"
    ).collect()[0].c
    # half-sample of a ~1500-key table still sees most keys
    assert est > exact * 0.5


def test_set_option_mapped(engine):
    assert engine.set_option("disable_codegen", "true") is True
    assert engine.spark.conf.get("spark.sql.codegen.wholeStage") == "false"
    engine.set_option("disable_codegen", "false")
    assert engine.spark.conf.get("spark.sql.codegen.wholeStage") == "true"


def test_set_option_accept_and_ignore(engine):
    # unknown Impala options are accepted (no error), ignored
    assert engine.set_option("mem_limit", "2g") is False
    assert engine.set_option("explain_level", "2") is False


def test_set_statement_through_sql(engine):
    out = engine.sql("SET runtime_filter_mode=OFF").collect()
    assert out[0].status == 1
    assert (
        engine.spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "false"
    )
    engine.sql("SET runtime_filter_mode=GLOBAL")
