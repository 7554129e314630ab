"""Engine facade: the reference's query entry point, Spark-native.

The reference's lifecycle (SURVEY.md §3) is: HS2 ExecuteStatement →
JNI → CUP parse → analyze/rewrite → single-node plan → distributed
plan → admission → coordinator fan-out → Volcano execution. On Spark
the whole pipeline is `spark.sql(text)` (ANTLR → Catalyst → AQE →
DAGScheduler); our job is the *surface*: dialect translation, function
registry, table catalog, and session semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

import re

from incubator_impala_spark import dialect
from incubator_impala_spark.grants import GrantRegistry
from incubator_impala_spark.functions.registry import (
    MACROS,
    QUERY_OPTION_MAP,
    register_all,
)
from incubator_impala_spark.session import configure_session
from incubator_impala_spark.sources.tables import register_tables

_SET_STMT = re.compile(
    r"^\s*SET\s+([A-Za-z_][\w.]*)\s*=\s*(.+?)\s*;?\s*$", re.IGNORECASE
)

# LOAD DATA INPATH 'p' [OVERWRITE] INTO TABLE t [PARTITION (k=v, ...)]
# (reference fe/.../analysis/LoadDataStmt.java; grammar
# sql-parser.cup load_stmt). The reference *moves files* into the
# table directory; Spark's native LOAD DATA only supports Hive tables,
# so for datasource tables the veneer reads the staged files with the
# table's own format and appends (or overwrites the target partition)
# — same observable result, and the write goes through the normal
# distributed sink path.
_LOAD_DATA = re.compile(
    r"^\s*LOAD\s+DATA\s+INPATH\s+'(?P<path>[^']+)'\s+"
    r"(?P<over>OVERWRITE\s+)?INTO\s+TABLE\s+(?P<tbl>[A-Za-z_][\w.]*)\s*"
    r"(?:PARTITION\s*\((?P<part>[^)]*)\))?\s*;?\s*$",
    re.IGNORECASE,
)


# plain DESCRIBE <path> — Impala's three-column column listing incl.
# paths into complex types (describe.py). FORMATTED/EXTENDED keep the
# Spark extended-describe mapping in dialect._SIMPLE_STMTS.
_DESCRIBE_PATH = re.compile(
    r"^\s*DESCRIBE\s+(?!FORMATTED\b|EXTENDED\b|TABLE\b)"
    r"((?:`[^`]+`|[A-Za-z_]\w*)(?:\.(?:`[^`]+`|[A-Za-z_]\w*))*)\s*;?\s*$",
    re.IGNORECASE,
)
# non-CTAS CREATE TABLE returns the reference's DDL summary row
# (impala-shell surface: 'Table has been created.')
_CREATE_TABLE_PLAIN = re.compile(
    r"^\s*CREATE\s+(?:EXTERNAL\s+)?TABLE\b(?![\s\S]*\bAS\s+SELECT\b)"
    r"[\s\S]*$",
    re.IGNORECASE,
)


class Engine:
    """A SQL engine with the reference's dialect & function surface.

    Usage::

        eng = Engine(spark, sf_dir="/root/testdata/sf0.01")
        df = eng.sql("SELECT zeroifnull(sum(l_quantity)) FROM lineitem")
    """

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = configure_session(spark)
        register_all(self.spark)
        # GRANT/REVOKE/role veneer (no auth service in env; see
        # grants.py — accept-and-record, SHOW answers from the record)
        self.grants = GrantRegistry()
        # NOW_STRING query option (the reference test harness's fake
        # clock — used by FORMAT-cast century inference); None = wall
        # clock
        self.now = None
        if sf_dir:
            register_tables(self.spark, sf_dir)

    def register_tables(self, sf_dir: str) -> None:
        register_tables(self.spark, sf_dir)

    def translate(self, sql_text: str) -> str:
        """Impala SQL → Spark SQL (dialect shim only, no execution)."""
        return dialect.translate(sql_text, MACROS, now=self.now)

    def set_option(self, name: str, value: str) -> bool:
        """Impala SET <option>=<value> (118 options,
        be/src/service/query-options.h). Mapped options become Spark
        confs; Spark conf names pass through; everything else is
        accepted and ignored (returns False)."""
        key = name.lower()
        if key == "now_string":
            import datetime as _dt

            self.now = (_dt.datetime.fromisoformat(value.strip())
                        if value.strip() else None)
            return True
        if key in QUERY_OPTION_MAP:
            mapped = QUERY_OPTION_MAP[key](str(value))
            if mapped is None:  # option value means "auto"/inapplicable
                return True
            conf, v = mapped
            self.spark.conf.set(conf, v)
            return True
        if name.startswith("spark."):
            self.spark.conf.set(name, str(value))
            return True
        return False

    def sql(self, sql_text: str) -> DataFrame:
        m = _SET_STMT.match(sql_text)
        if m:
            self.set_option(m.group(1), m.group(2).strip("'\""))
            return self.spark.sql("SELECT 1 AS status")
        m = _DESCRIBE_PATH.match(sql_text)
        if m:
            from incubator_impala_spark.describe import describe_df

            # db-qualifier conventions match the query path: functional
            # variants resolve to the flat fixture views
            path = re.sub(r"^functional(_\w+)?\.", "", m.group(1))
            return describe_df(self.spark, path)
        m = _CREATE_TABLE_PLAIN.match(sql_text)
        if m:
            self.spark.sql(self.translate(sql_text))
            return self.spark.createDataFrame(
                [("Table has been created.",)], "summary string")
        granted = self.grants.handle(self.spark, sql_text)
        if granted is not None:
            return granted
        m = _LOAD_DATA.match(sql_text)
        if m:
            return self._load_data(
                m.group("path"), m.group("tbl"),
                overwrite=bool(m.group("over")),
                partition=m.group("part"),
            )
        from incubator_impala_spark import nested_paths

        # dialect first (plan hints stripped, macros expanded), then
        # collection-path resolution on the cleaned text
        translated = self.translate(sql_text)
        translated = nested_paths.rewrite_collection_refs(
            self.spark, translated)
        # Impala DECIMAL_V2 avg() result typing (scale max(6,s)) —
        # type-aware, so it runs on the final Spark text with an
        # analysis-only schema probe (no execution)
        translated = dialect.rewrite_decimal_avg(
            translated, self._schema_of)
        return self.spark.sql(translated)

    def _schema_of(self, probe_sql: str):
        """Analyzed output fields of `probe_sql` as
        [(name, (precision, scale) | None), ...] — lazy, no job runs."""
        from pyspark.sql.types import DecimalType

        out = []
        for f in self.spark.sql(probe_sql).schema.fields:
            dt = f.dataType
            out.append((f.name,
                        (dt.precision, dt.scale)
                        if isinstance(dt, DecimalType) else None))
        return out

    def _load_data(self, path: str, table: str, overwrite: bool,
                   partition: str | None) -> DataFrame:
        """LOAD DATA veneer: read staged files with the table's format,
        append/overwrite via insertInto (dynamic-partition aware)."""
        from pyspark.sql import functions as F

        detail = {
            r["col_name"]: r["data_type"]
            for r in self.spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            if r["col_name"] and not r["col_name"].startswith("#")
        }
        provider = (detail.get("Provider") or "parquet").lower()
        df = self.spark.read.format(provider).load(path)
        if partition:
            for item in partition.split(","):
                k, v = item.split("=", 1)
                df = df.withColumn(
                    k.strip(), F.lit(v.strip().strip("'\""))
                )
        cols = [f.name for f in self.spark.table(table).schema.fields]
        df = df.select(*cols)
        if overwrite:
            # static-partition overwrite semantics (replace only the
            # named partition) — Spark's dynamic overwrite mode
            prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                df.write.mode("overwrite").insertInto(table, overwrite=True)
            finally:
                self.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
        else:
            df.write.insertInto(table, overwrite=False)
        return self.spark.sql("SELECT 1 AS status")

    def create_java_function(self, name: str, class_name: str,
                             return_type=None) -> None:
        """Java UDF call-through — the reference's Hive-UDF bridge
        (be/src/exprs/hive-udf-call.h; CreateUdfStmt.java). Classes
        implementing org.apache.spark.sql.api.java.UDF* register here;
        Hive GenericUDF classes go through the SQL form
        `CREATE FUNCTION name LOCATION '..' SYMBOL='cls'` (translated
        to CREATE TEMPORARY FUNCTION ... AS — needs a hive-catalog
        session, spark.sql.catalogImplementation=hive)."""
        self.spark.udf.registerJavaFunction(name, class_name, return_type)

    def explain(self, sql_text: str, mode: str = "formatted") -> str:
        """EXPLAIN surface (reference: sql-parser.cup:765-775)."""
        import contextlib
        import io

        df = self.sql(sql_text)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()
