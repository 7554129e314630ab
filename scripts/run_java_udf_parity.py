#!/usr/bin/env python3
"""Java UDF parity runner (reference: QueryTest/java-udf.test +
QueryTest/load-java-udfs.test, tests/query_test/test_udfs.py).

Runs in its OWN process because Hive-bridge UDFs need a Hive-catalog
SparkSession (HiveUDFExpressionBuilder), and the main test suite's
session is in-memory — one JVM, one catalogImplementation.

Staging mirrors the reference's copy-udfs-uda.sh: hive-exec.jar is
the pyspark-shipped Hive jar; the reference's impala-hive-udfs.jar is
replaced by this repo's own-from-scratch jar (java_udfs/, built by
scripts/build_java_udfs.sh) whose classes implement the behaviors the
.test pins (identity/add/concat dispatch, s->ss replacement, same-jar
class loading). Symbols rewrite accordingly.

Prints one JSON line: {"pass": N, "fail": N, "skip": N, "xfail": N,
"problems": [...]}.
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QT = ("/root/reference/testdata/workloads/functional-query/queries/"
      "QueryTest")
PYSPARK_JARS = None
for p in sys.path:
    cand = os.path.join(p, "pyspark", "jars")
    if os.path.isdir(cand):
        PYSPARK_JARS = cand
        break
if PYSPARK_JARS is None:
    import pyspark

    PYSPARK_JARS = os.path.join(os.path.dirname(pyspark.__file__),
                                "jars")

SYMBOL_MAP = {
    # the reference pins its own Hive build's class names; the
    # pyspark-shipped hive-exec 2.3.10 carries these as GenericUDFs
    "org.apache.hadoop.hive.ql.udf.UDFRound":
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFRound",
    "org.apache.hadoop.hive.ql.udf.UDFFloor":
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFFloor",
    "org.apache.hadoop.hive.ql.udf.UDFPosMod":
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFPosMod",
    "org.apache.hadoop.hive.ql.udf.UDFLower":
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFLower",
    "org.apache.impala.TestUdf": "org.sparkgraft.hiveudfs.TestOpsUdf",
    "org.apache.impala.TestUdfException":
        "org.sparkgraft.hiveudfs.ThrowsExceptionUdf",
    "org.apache.impala.ReplaceStringUdf":
        "org.sparkgraft.hiveudfs.DoubleSUdf",
    "org.apache.impala.ImportsNearbyClassesUdf":
        "org.sparkgraft.hiveudfs.CrossClassUdf",
}

# blocks whose contract this engine documents as divergent
# (r10: the udf-exception-null xfails are gone — the bridge jar's
# NullOnThrowUdf base implements hive-udf-call.cc's NULL-on-throw
# at the UDF call boundary)
XFAIL: dict[int, str] = {}


def main() -> int:
    from pyspark.sql import SparkSession

    from incubator_impala_spark.engine import Engine
    from incubator_impala_spark.sources.functional import (
        register_functional,
    )
    from incubator_impala_spark.testing import querytest as qt

    scratch = tempfile.mkdtemp(prefix="judf_")
    os.chdir(scratch)  # derby metastore_db + spark-warehouse land here
    spark = (
        SparkSession.builder.appName("java-udf-parity")
        .master("local[8]")
        .config("spark.sql.catalogImplementation", "hive")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.path.join(scratch, "warehouse"))
        .getOrCreate()
    )
    engine = Engine(spark, sf_dir="/root/testdata/sf0.001")
    register_functional(spark)

    # stage the jars where the .test's /test-warehouse locations map
    wh = engine._warehouse_dir()
    os.makedirs(wh, exist_ok=True)
    hive_exec = glob.glob(
        os.path.join(PYSPARK_JARS, "hive-exec-*.jar"))[0]
    shutil.copyfile(hive_exec, os.path.join(wh, "hive-exec.jar"))
    shutil.copyfile(
        os.path.join(REPO, "fixtures", "_cache",
                     "sparkgraft-hive-udfs.jar"),
        os.path.join(wh, "impala-hive-udfs.jar"))

    # load-java-udfs.test: the CREATE FUNCTION DDL, through the
    # engine (ns._create_fn ADD JAR + CREATE TEMPORARY FUNCTION)
    load_blocks = qt.parse_test_file(
        os.path.join(QT, "load-java-udfs.test"))
    text = load_blocks[0].query
    for ref_sym, ours in SYMBOL_MAP.items():
        text = text.replace(f"'{ref_sym}'", f"'{ours}'")
    text = text.replace("$FILESYSTEM_PREFIX", "")
    n_created = 0
    for stmt in text.split(";"):
        if not stmt.strip() or stmt.strip().startswith("#"):
            continue
        stmt = "\n".join(ln for ln in stmt.split("\n")
                         if not ln.lstrip().startswith("#"))
        if not stmt.strip():
            continue
        engine.sql(stmt)
        n_created += 1

    blocks = qt.parse_test_file(os.path.join(QT, "java-udf.test"))
    results = qt.run_blocks(
        engine, blocks, xfail=XFAIL,
        table_rewrites={r"functional\.": ""},
        database="judfdb", strict_catch=True)
    counts: dict = {}
    problems = []
    for r in results:
        counts[r.status] = counts.get(r.status, 0) + 1
        if r.status in ("fail", "error", "xpass"):
            q = " ".join(blocks[r.index].query.split())[:120]
            problems.append(
                f"[{r.index}] {r.status}: {r.reason} Q: {q} "
                + " | ".join(str(d) for d in r.diffs[:2]))
    print(json.dumps({"created": n_created, **counts,
                      "problems": problems}))
    return 0 if not problems else 1


if __name__ == "__main__":
    sys.exit(main())
