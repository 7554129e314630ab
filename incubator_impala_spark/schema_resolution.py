"""PARQUET_FALLBACK_SCHEMA_RESOLUTION semantics — read-time mapping of
a table's *logical* schema onto its parquet files' *physical* schema.

The reference alters table metadata without touching data files and
resolves file columns at scan time either by position (default) or by
name (be/src/exec/parquet/parquet-metadata-utils.cc,
ParquetSchemaResolver::ResolvePath; query option
PARQUET_FALLBACK_SCHEMA_RESOLUTION in query-options.h). Nested types
resolve recursively: a logical struct field absent from the file reads
NULL; extra file fields are ignored; reordering is transparent in name
mode (parquet-resolution-by-name.test).

Spark reads parquet by name with no positional fallback and no
metadata-only REPLACE/CHANGE COLUMNS, so the engine keeps an "overlay"
per altered table: the untouched file location plus the current
logical StructType. Before each statement the engine re-projects the
files through this resolver into a temp view under the table's name —
pure expression work (casts, named_struct, transform, map_from_entries)
in one declarative plan; at scale this costs exactly one columnar scan
with Catalyst's nested-schema pruning intact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DataType, MapType, StructType)


def _null(dtype: DataType) -> Column:
    return F.lit(None).cast(dtype.simpleString())


def _resolve_value(expr: Column | None, file_t: DataType | None,
                   log_t: DataType, by_name: bool) -> Column:
    """Expression producing `log_t` from a file-typed expression (or
    NULL when the file lacks the path)."""
    if expr is None or file_t is None:
        return _null(log_t)
    if isinstance(log_t, StructType):
        if not isinstance(file_t, StructType):
            return _null(log_t)
        parts = []
        ffields = list(file_t.fields)
        fmap = {f.name.lower(): f for f in ffields}
        for i, lf in enumerate(log_t.fields):
            if by_name:
                ff = fmap.get(lf.name.lower())
            else:
                ff = ffields[i] if i < len(ffields) else None
            sub = (_resolve_value(expr[ff.name], ff.dataType,
                                  lf.dataType, by_name)
                   if ff is not None else _null(lf.dataType))
            parts.append(sub.alias(lf.name))
        struct_e = F.struct(*parts)
        # a NULL file struct must stay NULL (not a struct of NULLs)
        return F.when(expr.isNull(), _null(log_t)).otherwise(struct_e)
    if isinstance(log_t, ArrayType):
        if not isinstance(file_t, ArrayType):
            return _null(log_t)
        return F.transform(
            expr, lambda x: _resolve_value(
                x, file_t.elementType, log_t.elementType, by_name))
    if isinstance(log_t, MapType):
        if not isinstance(file_t, MapType):
            return _null(log_t)
        return F.map_from_entries(F.transform(
            F.map_entries(expr),
            lambda kv: F.struct(
                _resolve_value(kv["key"], file_t.keyType,
                               log_t.keyType, by_name).alias("key"),
                _resolve_value(kv["value"], file_t.valueType,
                               log_t.valueType, by_name).alias("value"),
            )))
    if isinstance(file_t, (StructType, ArrayType, MapType)):
        return _null(log_t)  # complex -> scalar: unresolvable
    try:
        return expr.cast(log_t.simpleString())
    except Exception:  # noqa: BLE001
        return _null(log_t)


def resolve_overlay(spark: SparkSession, location: str,
                    logical: StructType, mode: str) -> DataFrame:
    """DataFrame presenting `location`'s parquet files under the
    logical schema, resolved by `mode` ('name' | 'position')."""
    base = spark.read.parquet(location)
    by_name = mode == "name"
    ffields = list(base.schema.fields)
    fmap = {f.name.lower(): f for f in ffields}
    cols = []
    for i, lf in enumerate(logical.fields):
        if by_name:
            ff = fmap.get(lf.name.lower())
        else:
            ff = ffields[i] if i < len(ffields) else None
        e = (_resolve_value(base[ff.name], ff.dataType, lf.dataType,
                            by_name)
             if ff is not None else _null(lf.dataType))
        cols.append(e.alias(lf.name,
                            metadata=dict(lf.metadata or {})))
    return base.select(*cols)
