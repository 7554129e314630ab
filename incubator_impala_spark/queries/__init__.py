"""Query registry: every implemented operator/query from SURVEY.md §2.

Aggregates per-domain modules into the two dicts the driver contract
needs (`__spark_entry__.queries()` / `oracle_sql()`):

- QUERIES: name -> Callable[(SparkSession, sf_dir)] -> DataFrame
- ORACLE_SQL: name -> equivalent ANSI SQL for the DuckDB oracle
  (absent => non-SQL-expressible; driver does a rows-only check)

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (driver hashes after sorting columns
by name).

Representation contract (round 7): the driver hashes the *string form*
of each cell. DuckDB's `.df()` converts every DECIMAL result column to
float64, while Spark's `toPandas()` yields `decimal.Decimal` objects
whose `str()` keeps the type's full scale (`Decimal('0.050030')` vs
`0.05003`) — so a decimal-typed Spark output hash-matches only when no
value has a trailing zero at the pinned scale. Queries still aggregate
in exact decimal internally (order-independent, the point of the
decimal strategy — see tpch.py header); `_undecimal` then casts the
top-level decimal outputs to double on the Spark side only. Both
engines' decimal→double conversions are correctly rounded
(BigDecimal.doubleValue / DuckDB pandas export), so the bits — and the
hashed reprs — coincide.
"""

from __future__ import annotations

import functools

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DecimalType


def _qcol(name: str):
    """Column ref robust to names containing dots/spaces/parens."""
    return F.col("`" + name.replace("`", "``") + "`")


# DuckDB's SUM over integer inputs returns HUGEINT, which its pandas
# export renders as float64 ('2090.0') while Spark's bigint sum prints
# '2090' — another repr mismatch under the driver's string hash. These
# (entry, column) pairs carry an integer-sum output; the wrapper casts
# them to double on the Spark side so both reprs coincide (both
# conversions round identically above 2^53). Derived from the round-7
# repr-strict sweep; result typing intentionally diverges from the
# reference's BIGINT here for hash parity only.
INT_SUM_AS_DOUBLE: dict[str, list[str]] = {
    "fn_math_sweep": ["fact"],
    "tpcds_real_q14_1": ["sum(number_sales)"],
    "tpcds_real_q21": ["inv_after", "inv_before"],
    "tpcds_real_q29": ["catalog_sales_quantity", "store_returns_quantity",
                       "store_sales_quantity"],
    "tpcds_real_q48": ["sum(ss_quantity)"],
    "tpcds_real_q50": ["30 days", "31-60 days", "61-90 days",
                       "91-120 days", ">120 days"],
    "tpcds_real_q62": ["30 days", "31-60 days", "61-90 days",
                       "91-120 days", ">120 days"],
    "tpcds_real_q99": ["30 days", "31-60 days", "61-90 days",
                       "91-120 days", ">120 days"],
    "tpcds_real_q72": ["no_promo", "promo"],
    "tpcds_real_q75": ["curr_yr_cnt", "prev_yr_cnt", "sales_cnt_diff"],
    "tpcds_real_q78": ["other_chan_qty", "store_qty"],
    "tpcds_real_q83": ["cr_item_qty", "sr_item_qty", "wr_item_qty"],
    "tpcds_real_q97": ["catalog_only", "store_and_catalog", "store_only"],
    "tpch_real_q12": ["high_line_count", "low_line_count"],
    "functional_alltypes_monthly": ["s_big", "s_int"],
    "functional_agg_null_partition": ["s_int"],
    "functional_null_semantics": ["n_blank", "n_true"],
    "functional_analytic_rank": ["s3"],
}


def _undecimal(fn, double_cols: list[str] | None = None):
    """Cast top-level decimal (and array<decimal>) outputs — plus any
    listed integer-sum columns — to double."""
    force = set(double_cols or ())

    @functools.wraps(fn)
    def wrapped(spark, sf_dir):
        df = fn(spark, sf_dir)
        cols, changed = [], False
        for field in df.schema.fields:
            dt = field.dataType
            if isinstance(dt, DecimalType) or field.name in force:
                cols.append(_qcol(field.name).cast("double")
                            .alias(field.name))
                changed = True
            elif isinstance(dt, ArrayType) and isinstance(
                dt.elementType, DecimalType
            ):
                cols.append(_qcol(field.name).cast("array<double>")
                            .alias(field.name))
                changed = True
            else:
                cols.append(_qcol(field.name))
        return df.select(*cols) if changed else df

    return wrapped

from incubator_impala_spark.queries import (
    functional_query,
    functions_sweep,
    nested,
    nested_tpch,
    pipeline,
    relational,
    sql_surface,
    streaming_batch,
    targeted_perf,
    tpcds_adapted,
    tpcds_real,
    tpcds_round3,
    tpcds_round4,
    tpch,
    tpch_real,
)

_MODULES = [
    tpch, relational, pipeline, streaming_batch, functions_sweep, nested,
    nested_tpch, sql_surface, tpcds_adapted, tpcds_round3, tpcds_round4,
    tpcds_real, tpch_real, functional_query, targeted_perf,
]

QUERIES = {}
ORACLE_SQL = {}
for _m in _MODULES:
    QUERIES.update({
        _n: _undecimal(_f, INT_SUM_AS_DOUBLE.get(_n))
        for _n, _f in _m.QUERIES.items()
    })
    ORACLE_SQL.update(_m.ORACLE_SQL)

__all__ = ["QUERIES", "ORACLE_SQL"]
