"""Randomized differential testing — the port of the reference's
`tests/comparison/discrepancy_searcher.py` (random queries checked
against Postgres/Oracle; SURVEY.md §5.5). Hypothesis generates
query *specs* (filters, group-bys, aggregates, sorts over lineitem);
each spec is rendered to semantically-identical Spark SQL and DuckDB
SQL and results must match row-for-row.

Generation rules keep specs inside the deterministic-comparison
envelope the corpus uses everywhere: aggregates over money go through
DECIMAL, averages end in a single double division, and predicates use
exactly-representable constants.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_SMALL

# columns: (name, kind)
NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]
GROUP_COLS = STR_COLS + ["l_linenumber"]

CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicates(draw):
    kind = draw(st.sampled_from(["num", "int", "str", "in", "between"]))
    if kind == "num":
        col = draw(st.sampled_from(NUM_COLS))
        op = draw(st.sampled_from(CMP_OPS))
        # exactly-representable constants: k/4
        val = draw(st.integers(min_value=0, max_value=400)) / 4.0
        return f"{col} {op} {val}"
    if kind == "int":
        col = draw(st.sampled_from(INT_COLS))
        op = draw(st.sampled_from(CMP_OPS))
        val = draw(st.integers(min_value=0, max_value=60000))
        return f"{col} {op} {val}"
    if kind == "str":
        col = draw(st.sampled_from(STR_COLS))
        val = draw(st.sampled_from(["A", "N", "R", "O", "F"]))
        op = draw(st.sampled_from(["=", "<>"]))
        return f"{col} {op} '{val}'"
    if kind == "in":
        col = draw(st.sampled_from(STR_COLS))
        vals = draw(
            st.lists(st.sampled_from(["A", "N", "R", "O", "F"]), min_size=1,
                     max_size=3, unique=True)
        )
        lit = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({lit})"
    col = draw(st.sampled_from(INT_COLS))
    lo = draw(st.integers(min_value=0, max_value=30000))
    hi = lo + draw(st.integers(min_value=0, max_value=30000))
    return f"{col} BETWEEN {lo} AND {hi}"


@st.composite
def query_specs(draw):
    preds = draw(st.lists(predicates(), min_size=0, max_size=3))
    conj = draw(st.sampled_from([" AND ", " OR "]))
    group = draw(st.sampled_from(GROUP_COLS))
    aggs = draw(
        st.lists(
            st.sampled_from(
                [
                    "CAST(COUNT(*) AS BIGINT) AS n",
                    "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS nd",
                    "CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS sq",
                    "CAST(MIN(l_extendedprice) AS DOUBLE) AS mn",
                    "CAST(MAX(l_extendedprice) AS DOUBLE) AS mx",
                    "CAST(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)"
                    " / COUNT(*) AS DOUBLE) AS ad",
                ]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    where = f"WHERE {conj.join(f'({p})' for p in preds)}" if preds else ""
    return (
        f"SELECT {group}, {', '.join(aggs)} FROM lineitem {where} "
        f"GROUP BY {group}"
    )


@pytest.fixture(scope="module")
def engines(spark):
    from incubator_impala_spark.sources.tables import load_table

    load_table(spark, SF_SMALL, "lineitem").createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    return spark, con


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=query_specs())
def test_random_query_differential(engines, sql):
    spark, con = engines
    from incubator_impala_spark.testing.oracle import compare_frames

    got: pd.DataFrame = spark.sql(sql).toPandas()
    want: pd.DataFrame = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"


@st.composite
def join_window_specs(draw):
    """Join + window specs: customer⋈orders with a filter, a windowed
    rank per segment, and a band on the rank."""
    seg_op = draw(st.sampled_from(["=", "<>"]))
    seg = draw(st.sampled_from(["BUILDING", "MACHINERY", "FURNITURE"]))
    price_cut = draw(st.integers(min_value=0, max_value=500000))
    k = draw(st.integers(min_value=1, max_value=10))
    wfn = draw(st.sampled_from(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"]))
    return f"""
    SELECT c_custkey, o_orderkey, rnk FROM (
      SELECT c.c_custkey, o.o_orderkey,
        CAST({wfn} OVER (PARTITION BY c.c_mktsegment
                         ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT)
          AS rnk
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment {seg_op} '{seg}'
        AND o.o_totalprice > {price_cut}) t
    WHERE rnk <= {k}
    """


@pytest.fixture(scope="module")
def engines_joined(spark):
    from incubator_impala_spark.sources.tables import load_table

    for t in ("customer", "orders"):
        load_table(spark, SF_SMALL, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{t}.parquet')"
        )
    return spark, con


@settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=join_window_specs())
def test_random_join_window_differential(engines_joined, sql):
    spark, con = engines_joined
    from incubator_impala_spark.testing.oracle import compare_frames

    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"


# ---------------------------------------------------------------------------
# Round-3 grammar extensions (VERDICT r2 #10): window frames and
# decimal arithmetic — the two areas where Spark/DuckDB tie-rounding
# and frame semantics bite hardest.
# ---------------------------------------------------------------------------


@st.composite
def window_frame_specs(draw):
    """Random ROWS/RANGE frames over a deterministic aggregate base.

    The base (one row per (l_linenumber, l_orderkey)) gives the
    window ORDER BY a total order, so ROWS frames are well-defined;
    the measure is an exact decimal sum, so any frame's sum is
    order-independent. RANGE offsets run over the BIGINT order key."""
    cut = draw(st.integers(min_value=500, max_value=6000))
    mode = draw(st.sampled_from(["ROWS", "RANGE"]))
    n_pre = draw(st.integers(min_value=0, max_value=5))
    n_fol = draw(st.integers(min_value=0, max_value=5))
    lo = draw(st.sampled_from(
        ["UNBOUNDED PRECEDING", f"{n_pre} PRECEDING", "CURRENT ROW"]))
    hi = draw(st.sampled_from(
        ["CURRENT ROW", f"{n_fol} FOLLOWING", "UNBOUNDED FOLLOWING"]))
    if mode == "RANGE":
        # integer-offset RANGE frames need multiples sized to the key
        lo = lo.replace(f"{n_pre} PRECEDING", f"{n_pre * 7} PRECEDING")
        hi = hi.replace(f"{n_fol} FOLLOWING", f"{n_fol * 7} FOLLOWING")
    frame = f"{mode} BETWEEN {lo} AND {hi}"
    fn, out = draw(st.sampled_from([
        ("SUM(v)", "DECIMAL(38,2)"),
        ("MIN(v)", "DECIMAL(38,2)"),
        ("MAX(v)", "DECIMAL(38,2)"),
        ("COUNT(*)", "BIGINT"),
    ]))
    return f"""
    WITH base AS (
      SELECT l_linenumber AS p, l_orderkey AS k,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS v
      FROM lineitem WHERE l_orderkey <= {cut}
      GROUP BY l_linenumber, l_orderkey)
    SELECT p, k,
      CAST({fn} OVER (PARTITION BY p ORDER BY k {frame}) AS {out}) AS w
    FROM base
    """


@settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=window_frame_specs())
def test_random_window_frame_differential(engines, sql):
    spark, con = engines
    from incubator_impala_spark.testing.oracle import compare_frames

    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"


@st.composite
def decimal_exprs(draw, depth=0):
    """Random decimal +/-/* trees with a tracked (precision, scale)
    calculus, so the final CAST is scale-preserving (exact — never
    rounds) in both engines. Division is excluded by design: Spark
    yields DECIMAL(·,13) quotients, DuckDB yields DOUBLE — a
    documented dialect divergence, not a bug to fuzz.

    Precision is tracked so a multiply is only drawn when the
    operands' precisions sum to ≤ 18: DuckDB executes a multiply whose
    declared result width is ≤ 18 in int64, and the column magnitudes
    here (unscaled ≤ ~1.05e7 at DECIMAL(9,2)) keep every such product
    below 2^63 — no runtime `Overflow in multiplication of
    DECIMAL(18)` in the oracle (VERDICT r3 #2). Wider multiplies are
    re-drawn as +/- instead. Returns (sql_fragment, precision, scale).
    """
    if depth >= 2 or draw(st.booleans()):
        kind = draw(st.sampled_from(["col", "lit"]))
        if kind == "col":
            col = draw(st.sampled_from(
                ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]))
            return f"CAST({col} AS DECIMAL(9,2))", 9, 2
        s = draw(st.integers(min_value=0, max_value=3))
        mag = draw(st.integers(min_value=-999, max_value=999))
        val = mag / (10 ** s)
        return f"CAST({val:.{s}f} AS DECIMAL(6,{s}))", 6, s
    a, pa, sa = draw(decimal_exprs(depth=depth + 1))
    b, pb, sb = draw(decimal_exprs(depth=depth + 1))
    op = draw(st.sampled_from(["+", "-", "*"]))
    if op == "*" and pa + pb > 18:
        op = draw(st.sampled_from(["+", "-"]))
    if op == "*":
        prec, scale = pa + pb, sa + sb
    else:
        scale = max(sa, sb)
        prec = max(pa - sa, pb - sb) + scale + 1
    return f"({a} {op} {b})", prec, scale


@st.composite
def decimal_arith_specs(draw):
    expr, _prec, scale = draw(decimal_exprs())
    cut = draw(st.integers(min_value=200, max_value=3000))
    return f"""
    SELECT l_orderkey, l_linenumber,
      CAST({expr} AS DECIMAL(38,{scale})) AS val
    FROM lineitem WHERE l_orderkey <= {cut}
    """


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=decimal_arith_specs())
def test_random_decimal_arith_differential(engines, sql):
    spark, con = engines
    from incubator_impala_spark.testing.oracle import compare_frames

    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"


def test_decimal_product_of_product_and_sum_pinned(engines):
    """Pinned regression for VERDICT r3 #2: the round-3 fuzzer's
    falsifying shape (product·(product+sum)) with widths the new
    precision calculus would allow — DECIMAL(9,2)·DECIMAL(9,2) (width
    18, int64-safe given quantity ≤ 50) times a narrow sum. Both
    engines must agree bit-exactly; neither may overflow."""
    spark, con = engines
    from incubator_impala_spark.testing.oracle import compare_frames

    sql = """
    SELECT l_orderkey, l_linenumber,
      CAST((CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2)))
           * (CAST(l_discount AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))
           AS DECIMAL(38,6)) AS val
    FROM lineitem WHERE l_orderkey <= 1500
    """
    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"


def test_decimal_expr_generator_never_overflows_oracle(engines):
    """The generator's own invariant, tested directly: every fragment
    the precision calculus admits must execute in DuckDB without a
    runtime decimal overflow (the round-3 failure mode). 200
    deterministic draws, each run against the full lineitem view."""
    _, con = engines
    seen = []

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(t=decimal_exprs())
    def collect(t):
        seen.append(t)

    collect()
    assert len(seen) >= 50, "generator produced too few expressions"
    for expr, _prec, scale in seen:
        con.execute(
            f"SELECT CAST({expr} AS DECIMAL(38,{scale})) AS v FROM lineitem"
        ).fetchall()


@st.composite
def string_fn_specs(draw):
    """Random string-function pipelines over customer names, inside
    the dialect-safe envelope: positive indices only (Spark and DuckDB
    diverge on substr(0)/negative starts — a documented dialect
    difference, not a bug), instr/locate on literal needles, and
    concat/trim/pad compositions."""
    inner = draw(st.sampled_from([
        "c_name",
        "upper(c_name)",
        "lower(c_name)",
        "reverse(c_name)",
        "trim(c_name)",
    ]))
    start = draw(st.integers(min_value=1, max_value=12))
    ln = draw(st.integers(min_value=0, max_value=10))
    needle = draw(st.sampled_from(["0", "1", "Customer", "#", "er", "zz"]))
    pad = draw(st.integers(min_value=1, max_value=20))
    exprs = [
        f"substr({inner}, {start}, {ln}) AS sub",
        f"CAST(length({inner}) AS INT) AS len",
        f"CAST(instr({inner}, '{needle}') AS INT) AS pos",
        f"concat_ws('|', {inner}, 'x') AS cw",
        f"lpad({inner}, {pad}, '.') AS lp",
        f"replace({inner}, '{needle}', '_') AS rep",
    ]
    picked = draw(st.lists(st.sampled_from(exprs), min_size=1, max_size=3,
                           unique=True))
    cut = draw(st.integers(min_value=50, max_value=1500))
    return (
        f"SELECT c_custkey, {', '.join(picked)} FROM customer "
        f"WHERE c_custkey <= {cut}"
    )


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(sql=string_fn_specs())
def test_random_string_fn_differential(engines_joined, sql):
    spark, con = engines_joined
    from incubator_impala_spark.testing.oracle import compare_frames

    got = spark.sql(sql).toPandas()
    want = con.execute(sql).df()
    problems = compare_frames(got, want)
    assert not problems, f"{sql}\n{problems}"
