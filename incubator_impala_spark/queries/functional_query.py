"""Driver-graded entries over the `functional` schema fixture — the
reference's primary test dataset (fixtures/functional/, regenerated
from the public generator semantics by scripts/gen_functional_fixture).

Each entry runs Impala-dialect SQL through the Engine shim (the same
path the reference's own functional-query texts take in
tests/test_functional_query.py) and pairs it with a self-contained
DuckDB oracle over the same parquet. Where the Impala spelling is the
point (RIGHT SEMI JOIN, left-assoc set ops, 2-arg EXTRACT, decode,
CHAR padding), the oracle restates the SAME semantics in portable SQL
— so the dialect translation itself is what gets graded.

Scale notes: every query is a declarative scan + join/agg plan
(pushdown visible to Catalyst); the fixture is small but nothing here
is fixture-specific — the registration is one temp view per parquet
path, so pointing register_functional at a large dataset changes only
statistics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from incubator_impala_spark import dialect
from incubator_impala_spark.functions.registry import MACROS
from incubator_impala_spark.sources.functional import (
    duckdb_oracle_sql,
    register_functional,
)

QUERIES: dict = {}
ORACLE_SQL: dict = {}


def _register(name: str, impala_sql: str, oracle: str | None = None):
    """Register a Spark callable (dialect-translated `impala_sql`) and
    a DuckDB oracle (`oracle`, defaulting to the same text) with
    read_parquet CTEs injected for every referenced fixture table."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from incubator_impala_spark import nested_paths

        register_functional(spark)
        text = dialect.translate(impala_sql, MACROS)
        text = nested_paths.rewrite_collection_refs(spark, text)
        return spark.sql(text)

    fn.__name__ = name
    fn.__doc__ = (
        "functional-schema fixture query (reference dataset: "
        "testdata/datasets/functional); Impala dialect via Engine shim.")
    QUERIES[name] = fn
    ORACLE_SQL[name] = duckdb_oracle_sql(oracle or impala_sql)
    return fn


# --- scans, aggregation, nulls ---------------------------------------------

_register(
    "functional_alltypes_monthly",
    """
    SELECT year, month, count(*) AS n, sum(int_col) AS s_int,
           sum(bigint_col) AS s_big, min(id) AS min_id, max(id) AS max_id,
           count(distinct tinyint_col) AS ndv_tiny
    FROM alltypes GROUP BY year, month ORDER BY year, month
    """)

_register(
    "functional_agg_null_partition",
    """
    SELECT day, count(*) AS n, count(tinyint_col) AS n_tiny,
           count(distinct smallint_col) AS d_small, sum(int_col) AS s_int
    FROM alltypesagg GROUP BY day ORDER BY day NULLS LAST
    """,
    # DuckDB defaults NULLS LAST on ASC already; spelled out for parity
    """
    SELECT day, count(*) AS n, count(tinyint_col) AS n_tiny,
           count(distinct smallint_col) AS d_small, sum(int_col) AS s_int
    FROM alltypesagg GROUP BY day ORDER BY day NULLS LAST
    """)

_register(
    "functional_null_semantics",
    """
    SELECT group_str AS g, count(*) AS n, count(null_int) AS n_int,
           count(some_nulls) AS n_some,
           sum(CASE WHEN blank = '' THEN 1 ELSE 0 END) AS n_blank,
           sum(CASE WHEN bool_nulls THEN 1 ELSE 0 END) AS n_true
    FROM nullrows GROUP BY group_str ORDER BY g
    """)

_register(
    "functional_ragged_scan",
    """
    SELECT str_col, int_col FROM tblwithraggedcolumns
    ORDER BY str_col NULLS LAST, int_col NULLS LAST
    """,
    """
    SELECT str_col, int_col FROM tblwithraggedcolumns
    ORDER BY str_col NULLS LAST, int_col NULLS LAST
    """)

# --- joins ------------------------------------------------------------------

_register(
    "functional_join_dims",
    """
    SELECT j.test_id AS tid, j.test_name AS tname, j.test_zip AS tzip,
           d.name AS dname, d.zip AS dzip
    FROM jointbl j JOIN dimtbl d ON j.test_id = d.id
    WHERE d.zip > 94600 ORDER BY tid, tzip, dname
    """)

_register(
    "functional_outer_join",
    """
    SELECT j.test_id AS tid, j.test_name AS tname, d.id AS did,
           d.name AS dname
    FROM jointbl j FULL OUTER JOIN dimtbl d ON j.test_id = d.id
    ORDER BY tid NULLS LAST, tname NULLS LAST, did NULLS LAST
    """,
    """
    SELECT j.test_id AS tid, j.test_name AS tname, d.id AS did,
           d.name AS dname
    FROM jointbl j FULL OUTER JOIN dimtbl d ON j.test_id = d.id
    ORDER BY tid NULLS LAST, tname NULLS LAST, did NULLS LAST
    """)

# the Impala side exercises RIGHT SEMI/ANTI commuting in the shim
_register(
    "functional_right_semi_join",
    """
    SELECT b.a AS a, b.b AS b, b.c AS c
    FROM semijointbla a RIGHT SEMI JOIN semijointblb b ON a.b = b.b
    ORDER BY a, b, c
    """,
    """
    SELECT b.a AS a, b.b AS b, b.c AS c
    FROM semijointblb b SEMI JOIN semijointbla a ON a.b = b.b
    ORDER BY a, b, c
    """)

_register(
    "functional_right_anti_join",
    """
    SELECT b.a AS a, b.b AS b, b.c AS c
    FROM semijointbla a RIGHT ANTI JOIN semijointblb b ON a.b = b.b
    ORDER BY a NULLS LAST, b NULLS LAST, c NULLS LAST
    """,
    """
    SELECT b.a AS a, b.b AS b, b.c AS c
    FROM semijointblb b ANTI JOIN semijointbla a ON a.b = b.b
    ORDER BY a NULLS LAST, b NULLS LAST, c NULLS LAST
    """)

# --- subqueries -------------------------------------------------------------

_register(
    "functional_subquery_in",
    """
    SELECT id AS id, int_col AS i FROM alltypessmall
    WHERE id IN (SELECT id FROM alltypestiny WHERE bool_col)
    ORDER BY id
    """)

_register(
    "functional_exists_correlated",
    """
    SELECT t.id AS id FROM alltypestiny t
    WHERE EXISTS (SELECT 1 FROM alltypesagg a
                  WHERE a.id = t.id AND a.int_col IS NULL)
    ORDER BY id
    """)

# --- analytics --------------------------------------------------------------

_register(
    "functional_analytic_rank",
    """
    SELECT id AS id, month AS m,
           row_number() OVER (PARTITION BY month ORDER BY id) AS rn,
           rank() OVER (PARTITION BY month ORDER BY tinyint_col) AS rk,
           sum(int_col) OVER (PARTITION BY month ORDER BY id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS s3
    FROM alltypessmall ORDER BY m, id
    """)

_register(
    "functional_analytic_ignore_nulls",
    """
    SELECT id AS id,
           last_value(tinyint_col ignore nulls)
             OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS lv
    FROM alltypesagg WHERE id < 25 ORDER BY id
    """,
    """
    SELECT id AS id,
           last_value(tinyint_col ignore nulls)
             OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS lv
    FROM alltypesagg WHERE id < 25 ORDER BY id
    """)

# --- decimals ----------------------------------------------------------------

_register(
    "functional_decimal_arith",
    """
    SELECT d1 AS d1, d2 AS d2, d1 + d2 AS add12, d1 * d2 AS mul12,
           cast(d3 AS decimal(20, 4)) AS d3_4, d5 AS d5
    FROM decimal_tbl ORDER BY d1, d5
    """,
    # DuckDB's decimal->decimal cast truncates; the engine (and the
    # reference) round HALF_UP — restate with an explicit round
    """
    SELECT d1 AS d1, d2 AS d2, d1 + d2 AS add12, d1 * d2 AS mul12,
           cast(round(d3, 4) AS decimal(20, 4)) AS d3_4, d5 AS d5
    FROM decimal_tbl ORDER BY d1, d5
    """)

_register(
    "functional_decimal_window",
    """
    SELECT c1 AS c1,
           sum(c1) OVER (ORDER BY c1 ROWS BETWEEN 5 PRECEDING
                         AND CURRENT ROW) AS s6,
           (cast(sum(c2) OVER (ORDER BY c1 ROWS BETWEEN CURRENT ROW
                               AND 2 FOLLOWING) AS double)
            / count(c2) OVER (ORDER BY c1 ROWS BETWEEN CURRENT ROW
                              AND 2 FOLLOWING)) AS a3
    FROM decimal_tiny ORDER BY c1
    """)

# --- dates & timestamps -------------------------------------------------------

_register(
    "functional_date_arith",
    """
    SELECT id_col AS id, cast(date_col AS string) AS d,
           year(date_col) AS y, month(date_col) AS m, day(date_col) AS dd,
           cast(date_add(date_col, 10) AS string) AS plus10,
           datediff(date_part, date_col) AS dd_part
    FROM date_tbl WHERE date_col IS NOT NULL AND date_col < '9000-01-01'
    ORDER BY id, d
    """,
    """
    SELECT id_col AS id, cast(date_col AS varchar) AS d,
           year(date_col) AS y, month(date_col) AS m,
           dayofmonth(date_col) AS dd,
           cast(cast(date_col + INTERVAL 10 DAY AS date) AS varchar) AS plus10,
           datediff('day', date_col, date_part) AS dd_part
    FROM date_tbl WHERE date_col IS NOT NULL AND date_col < '9000-01-01'
    ORDER BY id, d
    """)

_register(
    "functional_extract_2arg",
    """
    SELECT id AS id,
           extract(timestamp_col, 'year') AS y,
           extract(timestamp_col, 'minute') AS mi,
           extract(timestamp_col, 'millisecond') AS ms,
           extract(timestamp_col, 'epoch') AS ep
    FROM alltypestiny ORDER BY id
    """,
    """
    SELECT id AS id,
           CAST(extract(year FROM timestamp_col) AS BIGINT) AS y,
           CAST(extract(minute FROM timestamp_col) AS BIGINT) AS mi,
           CAST(extract(second FROM timestamp_col) AS BIGINT) * 1000
             + CAST(extract(millisecond FROM timestamp_col) AS BIGINT)
             % 1000 AS ms,
           CAST(epoch(timestamp_col) AS BIGINT) AS ep
    FROM alltypestiny ORDER BY id
    """)

# --- dialect-specific shapes ---------------------------------------------------

_register(
    "functional_setop_left_assoc",
    """
    SELECT 100 AS v UNION SELECT 101 INTERSECT SELECT 101
    """,
    """
    SELECT v FROM (SELECT 100 AS v UNION SELECT 101) u
    INTERSECT SELECT 101 AS v
    """)

_register(
    "functional_decode",
    """
    SELECT decode(tinyint_col, NULL, -2, 1, 100, -9) AS d, count(*) AS n
    FROM alltypesagg GROUP BY d ORDER BY d
    """,
    """
    SELECT CASE WHEN tinyint_col IS NOT DISTINCT FROM NULL THEN -2
                WHEN tinyint_col IS NOT DISTINCT FROM 1 THEN 100
                ELSE -9 END AS d, count(*) AS n
    FROM alltypesagg GROUP BY d ORDER BY d
    """)

_register(
    "functional_char_pad",
    """
    SELECT cs AS cs, vc AS vc FROM chars_tiny
    WHERE cs = cast('6a' AS char(5)) ORDER BY cs, vc
    """,
    """
    SELECT cs AS cs, vc AS vc FROM chars_tiny
    WHERE cs = rpad('6a', 5, ' ') ORDER BY cs, vc
    """)

_register(
    "functional_histogram_tiny",
    """
    SELECT histogram(tinyint_col) AS h FROM alltypestiny
    """,
    """
    WITH s AS (SELECT list_sort(list(tinyint_col)) AS v,
                      count(tinyint_col) AS n
               FROM alltypestiny)
    SELECT array_to_string(
             list_transform(range(1, CAST(least(n, 100) AS BIGINT) + 1),
                            i -> CAST(v[CAST(i * greatest(n // 100, 1)
                                             AS BIGINT)] AS VARCHAR)),
             ', ') AS h
    FROM s
    """)

_register(
    "functional_zipcode_topn",
    """
    SELECT id AS id, zip AS zip, income AS income FROM zipcode_incomes
    WHERE income > 0 ORDER BY income DESC, id LIMIT 25
    """)

_register(
    "functional_views",
    """
    SELECT x AS x, y AS y FROM alltypes_view_sub
    WHERE x < 3 ORDER BY x, y LIMIT 20
    """)

# --- nested collection paths (SubplanNode syntax; nested_paths.py) ----------
# Spark side runs the reference's path spellings over its OWN nested
# parquet (ComplexTypesTbl); DuckDB restates with list lambdas/unnest.

_register(
    "functional_nested_unnest",
    """
    SELECT id AS id, pos AS pos, item AS item
    FROM complextypestbl t, t.int_array
    ORDER BY id, pos
    """,
    """
    SELECT id AS id, x.pos AS pos, x.item AS item
    FROM (SELECT id, unnest(list_transform(int_array,
               (v, i) -> {'pos': i - 1, 'item': v})) AS x
          FROM complextypestbl)
    ORDER BY id, pos
    """)

_register(
    "functional_nested_map_explode",
    """
    SELECT id AS id, key AS k, value AS v
    FROM complextypestbl t, t.int_map m
    ORDER BY id, k NULLS LAST, v NULLS LAST
    """,
    """
    SELECT id AS id, e.key AS k, e.value AS v
    FROM (SELECT id, unnest(map_entries(int_map)) AS e
          FROM complextypestbl)
    ORDER BY id, k NULLS LAST, v NULLS LAST
    """)

_register(
    "functional_nested_pair_alias_general",
    # (r11) FROM-level pair join of one collection under two aliases
    # with a GENERAL (non-pos-equality) condition — translated as
    # row-local HOF pair enumeration, zero decorrelation
    # (nested_paths.py; former DIALECT.md subplan-pair-alias blocker)
    """
    SELECT id AS id, a1.pos AS p1, a2.pos AS p2, a2.item AS i2
    FROM complextypestbl t
    JOIN t.int_array a1 JOIN t.int_array a2 ON (a1.pos < a2.pos)
    ORDER BY id, p1, p2
    """,
    """
    SELECT id AS id, e.p1 AS p1, e.p2 AS p2, e.i2 AS i2
    FROM (SELECT id, unnest(flatten(list_transform(
            range(1, len(int_array)+1), i1 ->
            [{'p1': i1-1, 'p2': i2-1, 'i2': int_array[i2]}
             FOR i2 IN range(1, len(int_array)+1) IF i2 > i1]))) AS e
          FROM complextypestbl)
    ORDER BY id, p1, p2
    """)

_register(
    "functional_nested_map_rownumber",
    # (r11) correlated inline view over a MAP collection with a
    # window fn — map_entries + array_sort + index-aware transform
    # (the full-acid-complex-type-scans b14 shape; Spark's analyzer
    # rejects the decorrelated MAP reference, the HOF form never
    # decorrelates)
    """
    SELECT a.id AS id, v.key AS k, v.rnum AS rnum
    FROM complextypestbl a,
      (SELECT key, row_number() OVER (ORDER BY key) rnum
       FROM a.int_map) v
    WHERE v.key != 'bad'
    ORDER BY id, k
    """,
    """
    SELECT id AS id, e.key AS k,
           row_number() OVER (PARTITION BY id ORDER BY e.key) AS rnum
    FROM (SELECT id, unnest(map_entries(int_map)) AS e
          FROM complextypestbl)
    WHERE e.key != 'bad'
    ORDER BY id, k
    """)

_register(
    "functional_nested_subplan_count",
    """
    SELECT t.id AS id, v.cnt AS cnt
    FROM complextypestbl t, (SELECT count(item) cnt FROM t.int_array) v
    ORDER BY id
    """,
    """
    SELECT id AS id,
           CAST(coalesce(len(list_filter(int_array, x -> x IS NOT NULL)),
                         0) AS BIGINT) AS cnt
    FROM complextypestbl ORDER BY id
    """)

_register(
    "functional_nested_flatten_chain",
    """
    SELECT count(item) AS n FROM complextypestbl.int_array_array.item
    """,
    """
    SELECT CAST(sum(coalesce(len(list_filter(
             flatten(coalesce(int_array_array, [])),
             v -> v IS NOT NULL)), 0)) AS BIGINT) AS n
    FROM complextypestbl
    """)
