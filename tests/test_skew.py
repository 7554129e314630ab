"""Salted-join / salted-distinct correctness: results must be
identical to the unsalted plans, with the salt visible in the join
keys (the skew actually spreads)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def _tables(spark):
    from incubator_impala_spark.sources.tables import load_table

    return (
        load_table(spark, SF_SMALL, "orders"),
        load_table(spark, SF_SMALL, "customer"),
    )


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from incubator_impala_spark.operators.skew import salted_join

    orders, cust = _tables(spark)
    orders = orders.withColumnRenamed("o_custkey", "c_custkey")
    plain = (
        orders.join(cust, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("s"),
        )
    )
    salted = (
        salted_join(orders, cust, "c_custkey", buckets=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(14,2)")).alias("s"),
        )
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_outer_keeps_unmatched(spark):
    from incubator_impala_spark.operators.skew import salted_join

    orders, cust = _tables(spark)
    orders = orders.withColumnRenamed("o_custkey", "c_custkey")
    plain = orders.join(cust, "c_custkey", "left").count()
    salted = salted_join(orders, cust, "c_custkey", buckets=4, how="left").count()
    assert plain == salted


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    from incubator_impala_spark.operators.skew import salted_join

    orders, cust = _tables(spark)
    orders = orders.withColumnRenamed("o_custkey", "c_custkey")
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(orders, cust, "c_custkey", buckets=4, how=how)


def test_salt_in_join_keys(spark):
    from incubator_impala_spark.operators.skew import salted_join

    orders, cust = _tables(spark)
    orders = orders.withColumnRenamed("o_custkey", "c_custkey")
    plan = (
        salted_join(orders, cust, "c_custkey", buckets=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "_salt" in plan


def test_salted_count_distinct_exact(spark):
    from pyspark.sql import functions as F

    from incubator_impala_spark.operators.skew import salted_count_distinct

    orders, _ = _tables(spark)
    want = {
        (r.o_orderpriority, r.n)
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    got = {
        (r.o_orderpriority, r.n_o_custkey)
        for r in salted_count_distinct(
            orders, "o_orderpriority", "o_custkey", buckets=8
        ).collect()
    }
    assert got == want
