"""Real TPC-H sf1 fixture — flat tables via DuckDB's dbgen, plus the
reference's nested ``tpch_nested_parquet`` schema rebuilt in Spark.

The reference's nested-types functional tests (nested-types-tpch.test,
nested-types-subplan.test, ...) run against `tpch_nested_parquet`
(customer with c_orders ARRAY<STRUCT<... o_lineitems ARRAY<STRUCT>>>,
region with r_nations, supplier with s_partsupps), built by
testdata/bin/load_nested.py:180-280 from dbgen sf1 data. Their expected
results are data-dependent (count(*) = 6001215 ...), so the fixture
must be the *real* spec-deterministic TPC-H sf1 dataset: DuckDB's
bundled dbgen produces it bit-identically (verified: the reference's
recorded probe counts match).

Everything is cached under ``fixtures/_cache/tpch_sf1`` (gitignored,
~1 GB): the first build costs ~2-4 min (dbgen 12 s + two Spark
shuffles for the nesting); later sessions just register temp views.

Scale note: the nested build is exactly the reference's two-level
GROUP_CONCAT pipeline re-expressed declaratively — two hash shuffles
(lineitem→orders on l_orderkey, orders→customer on o_custkey) with
JVM-side collect_list + array_sort, no Python in the loop. At 100 TB
the same plan holds: both shuffles are on the natural join keys.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
CACHE = os.path.join(_REPO, "fixtures", "_cache", "tpch_sf1")

FLAT_TABLES = ["region", "nation", "customer", "supplier", "part",
               "partsupp", "orders", "lineitem"]

_L_FIELDS = [  # load_nested.py:197-211 field order and types
    ("l_partkey", "bigint"), ("l_suppkey", "bigint"),
    ("l_linenumber", "int"), ("l_quantity", "decimal(12,2)"),
    ("l_extendedprice", "decimal(12,2)"), ("l_discount", "decimal(12,2)"),
    ("l_tax", "decimal(12,2)"), ("l_returnflag", "string"),
    ("l_linestatus", "string"), ("l_shipdate", "string"),
    ("l_commitdate", "string"), ("l_receiptdate", "string"),
    ("l_shipinstruct", "string"), ("l_shipmode", "string"),
    ("l_comment", "string"),
]
_O_FIELDS = [  # load_nested.py:188-196
    ("o_orderkey", "bigint"), ("o_orderstatus", "string"),
    ("o_totalprice", "decimal(12,2)"), ("o_orderdate", "string"),
    ("o_orderpriority", "string"), ("o_clerk", "string"),
    ("o_shippriority", "int"), ("o_comment", "string"),
]


def _flat_dir() -> str:
    return os.path.join(CACHE, "flat")


def _nested_dir() -> str:
    return os.path.join(CACHE, "nested")


def ensure_flat() -> str:
    """dbgen sf1 → one zstd parquet per table (idempotent)."""
    out = _flat_dir()
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("LOAD tpch")
    con.execute("CALL dbgen(sf=1)")
    for t in FLAT_TABLES:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' "
            f"(FORMAT PARQUET, COMPRESSION ZSTD)")
    con.close()
    open(done, "w").close()
    return out


def _struct(cols) -> "F.Column":
    return F.struct(*[F.col(n).cast(t).alias(n) for n, t in cols])


def _sorted_agg(struct_col, key: str):
    """collect_list → array_sort by the given struct field (the
    reference's GROUP_CONCAT order is undefined; tests verify sorted,
    but a deterministic order keeps parquet builds reproducible)."""
    return F.array_sort(
        F.collect_list(struct_col),
        lambda a, b: F.when(a[key] < b[key], F.lit(-1))
        .when(a[key] > b[key], F.lit(1)).otherwise(F.lit(0)),
    )


def ensure_nested(spark: SparkSession) -> str:
    """Build customer/region/supplier nested parquet (idempotent)."""
    out = _nested_dir()
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    flat = ensure_flat()
    os.makedirs(out, exist_ok=True)
    rd = lambda t: spark.read.parquet(f"{flat}/{t}.parquet")  # noqa: E731

    li = rd("lineitem").withColumn(
        "l_shipdate", F.col("l_shipdate").cast("string")).withColumn(
        "l_commitdate", F.col("l_commitdate").cast("string")).withColumn(
        "l_receiptdate", F.col("l_receiptdate").cast("string"))
    per_order = (
        li.groupBy("l_orderkey")
        .agg(_sorted_agg(_struct(_L_FIELDS), "l_linenumber")
             .alias("o_lineitems"))
    )
    orders = rd("orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("string"))
    # every order has lineitems, so inner join is exact here; the
    # customer side is a RIGHT join (load_nested.py:165): customers
    # without orders carry a NULL c_orders, not an empty array
    o_nested = (
        orders.join(per_order, orders.o_orderkey == per_order.l_orderkey)
        .select("o_custkey",
                _struct(_O_FIELDS).withField(
                    "o_lineitems", F.col("o_lineitems")).alias("ord"))
        .groupBy("o_custkey")
        .agg(_sorted_agg(F.col("ord"), "o_orderkey").alias("c_orders"))
    )
    cust = rd("customer").select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "c_name", "c_address",
        F.col("c_nationkey").cast("smallint").alias("c_nationkey"),
        "c_phone", F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
        "c_mktsegment", "c_comment")
    (cust.join(o_nested, cust.c_custkey == o_nested.o_custkey, "left")
         .drop("o_custkey")
         .write.mode("overwrite").parquet(f"{out}/customer"))

    nations = rd("nation").select(
        "n_regionkey",
        F.struct(F.col("n_nationkey").cast("smallint").alias("n_nationkey"),
                 F.col("n_name"), F.col("n_comment")).alias("nat"))
    (rd("region")
     .select(F.col("r_regionkey").cast("smallint").alias("r_regionkey"),
             "r_name", "r_comment")
     .join(nations, F.col("r_regionkey") == F.col("n_regionkey"))
     .groupBy("r_regionkey", "r_name", "r_comment")
     .agg(_sorted_agg(F.col("nat"), "n_nationkey").alias("r_nations"))
     .write.mode("overwrite").parquet(f"{out}/region"))

    ps = rd("partsupp").select(
        "ps_suppkey",
        F.struct(F.col("ps_partkey").cast("bigint").alias("ps_partkey"),
                 F.col("ps_availqty").cast("int").alias("ps_availqty"),
                 F.col("ps_supplycost").cast("decimal(12,2)")
                 .alias("ps_supplycost"),
                 F.col("ps_comment")).alias("psup"))
    (rd("supplier")
     .select(F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
             "s_name", "s_address",
             F.col("s_nationkey").cast("smallint").alias("s_nationkey"),
             "s_phone",
             F.col("s_acctbal").cast("decimal(12,2)").alias("s_acctbal"),
             "s_comment")
     .join(ps, F.col("s_suppkey") == F.col("ps_suppkey"))
     .drop("ps_suppkey")
     .groupBy("s_suppkey", "s_name", "s_address", "s_nationkey",
              "s_phone", "s_acctbal", "s_comment")
     .agg(_sorted_agg(F.col("psup"), "ps_partkey").alias("s_partsupps"))
     .write.mode("overwrite").parquet(f"{out}/supplier"))
    open(done, "w").close()
    return out


def register_tpch_ref(spark: SparkSession) -> None:
    """Idempotent temp views: ``tpch_ref_<t>`` (flat sf1) and
    ``tpch_nested_<t>`` (the nested schema). Test files reach them via
    per-file table_rewrites (customer -> tpch_nested_customer,
    tpch_parquet. -> tpch_ref_)."""
    flat = ensure_flat()
    nested = ensure_nested(spark)
    from pyspark.sql.types import DateType

    for t in FLAT_TABLES:
        df = spark.read.parquet(f"{flat}/{t}.parquet")
        # the reference's TPC-H schema types all date columns STRING
        # (tpch_schema_template.sql: O_ORDERDATE STRING, ...); the
        # recorded workload results quote them accordingly
        df = df.select(*[
            F.col(f.name).cast("string").alias(f.name)
            if isinstance(f.dataType, DateType) else F.col(f.name)
            for f in df.schema.fields])
        df.createOrReplaceTempView(f"tpch_ref_{t}")
    for t in ["customer", "region", "supplier"]:
        spark.read.parquet(f"{nested}/{t}") \
            .createOrReplaceTempView(f"tpch_nested_{t}")
    # the nested db's `part` is the flat part table (load_nested.py:287)
    spark.read.parquet(f"{flat}/part.parquet") \
        .createOrReplaceTempView("tpch_nested_part")
    _register_masked_views(spark)


def _register_masked_views(spark: SparkSession) -> None:
    """The Ranger-masked faces of the nested tables — the reference's
    column-masking policies (tests/authorization/test_ranger.py
    test_tpch_nested_column_masking): name/address/p_name get MASK
    (uppercase -> X, lowercase -> x, digits -> n, other characters
    kept), phones MASK_SHOW_FIRST_4 (the country code Q22 needs);
    masked-tpch_nested-*.test runs against these."""
    def mask(col):
        return F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(col, "[A-Z]", "X"), "[a-z]", "x"),
            "[0-9]", "n")

    def mask_show4(name):
        # Ranger's MASK_SHOW_FIRST_4 template is
        # mask_show_first_n(col, 4, 'x', 'x', 'x', ...) — ALL char
        # classes mask to 'x', unlike plain MASK's X/x/n (verified
        # against the recorded masked-q2/q10/q15 phone rows)
        c = F.col(name)
        return F.concat(
            F.substring(c, 1, 4),
            F.regexp_replace(
                F.expr(f"substring({name}, 5)"), "[A-Za-z0-9]", "x"))

    cust = spark.table("tpch_nested_customer")
    cust.select(*[
        mask(F.col(f)).alias(f) if f in ("c_name", "c_address")
        else mask_show4(f).alias(f) if f == "c_phone"
        else F.col(f) for f in cust.columns]) \
        .createOrReplaceTempView("tpch_masked_customer")
    supp = spark.table("tpch_nested_supplier")
    supp.select(*[
        mask(F.col(f)).alias(f) if f in ("s_name", "s_address")
        else mask_show4(f).alias(f) if f == "s_phone"
        else F.col(f) for f in supp.columns]) \
        .createOrReplaceTempView("tpch_masked_supplier")
    part = spark.table("tpch_nested_part")
    part.select(*[
        mask(F.col(f)).alias(f) if f == "p_name" else F.col(f)
        for f in part.columns]) \
        .createOrReplaceTempView("tpch_masked_part")
