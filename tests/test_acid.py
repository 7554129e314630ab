"""The reference's Hive-ACID corpus (QueryTest/acid*, full-acid*),
run against the engine's in-repo ACID model
(incubator_impala_spark/acid.py).

The reference drives these files against a live Hive metastore + txn
manager (tests/query_test/test_acid.py,
test_acid_row_validation.py); here the HIVE_QUERY sections run
through the engine's Hive shim (engine.hive_sql), which shares the
write-id registry but NOT the engine's cached ValidWriteIdList — the
reference's visibility semantics (Hive writes invisible until
REFRESH / INVALIDATE METADATA) hold by construction.

Fixture staging mirrors the reference drivers:

* full-acid-original-file: the driver copies
  testdata/data/alltypes_non_acid.orc into a fresh ORC table's
  directory as 000000_0 and upgrades it to full ACID via Hive
  (test_acid.py::test_full_acid_original_files).
* acid-row-validation-{0,1,2}: the driver stages
  testdata/data/streaming.orc (a Hive Streaming V2 side-file holding
  write ids 1 and 2) under delta_1_2 with both write ids OPEN, then
  commits one transaction between fragments
  (test_acid_row_validation.py::test_row_validation).
"""
from __future__ import annotations

import collections
import os
import re
import shutil

import pytest

QT_DIR = ("/root/reference/testdata/workloads/functional-query/"
          "queries/QueryTest")
REF_DATA = "/root/reference/testdata/data"

# file -> (min_pass floor, {block index: reason}[, table_rewrites])
FILES: dict[str, tuple] = {
    "acid-no-hive": (1, {}),
    "acid-insert": (14, {}),
    "acid-nonacid-insert": (5, {}),
    "acid-truncate": (11, {}),
    "acid": (13, {}),
    "acid-partitioned": (7, {}),
    "acid-compaction": (8, {}),
    "acid-compute-stats": (8, {}),
    "acid-clear-statsaccurate": (4, {}),
    # 'part' collides with the TPC-H fixture view; scratch-rename like
    # the functional harness's qscratch_ mechanism
    "acid-insert-fail": (10, {}, {"part": "qscratch_acidpart"}),
    "acid-negative": (5, {}),
    # the pinned RUNTIME_PROFILE line (Loaded ValidWriteIdLists) is
    # impalad introspection; the result contract verifies
    "acid-profile": (1, {}),
    "full-acid-scans": (12, {}),
    "full-acid-rowid": (15, {}),
    # block 14: relative map ref inside a correlated inline view with
    # a window fn — Spark's analyzer rejects correlated MAP-type
    # column references (UNSUPPORTED_CORRELATED_REFERENCE_DATA_TYPE)
    "full-acid-complex-type-scans": (14, {14: "analyzer"}),
}

STRICT_CATCH = {"acid-negative", "acid-insert-fail"}


@pytest.fixture(scope="module")
def acid_engine(engine):
    from incubator_impala_spark import acid
    from incubator_impala_spark.sources.functional import (
        register_functional,
    )

    register_functional(engine.spark)
    acid.register_fixture_acid(engine)
    return engine


@pytest.mark.skipif(not os.path.isdir(QT_DIR),
                    reason="reference workload texts not present")
@pytest.mark.parametrize("name", sorted(FILES), ids=str)
def test_acid_file(acid_engine, name):
    from incubator_impala_spark.testing import querytest as qt

    entry = FILES[name]
    min_pass, xfail = entry[0], entry[1]
    rewrites = entry[2] if len(entry) > 2 else None
    blocks = qt.parse_test_file(os.path.join(QT_DIR, f"{name}.test"))
    db = "qacid_" + re.sub(r"[^a-z0-9]", "", name.lower())
    results = qt.run_blocks(acid_engine, blocks, xfail=xfail,
                            table_rewrites=rewrites, database=db,
                            strict_catch=name in STRICT_CATCH)
    counts = collections.Counter(r.status for r in results)
    problems = []
    for r in results:
        if r.status in ("fail", "error"):
            q = " ".join(blocks[r.index].query.split())[:140]
            problems.append(
                f"[{r.index}] {r.status}: {r.reason}\n    Q: {q}\n    "
                + "\n    ".join(str(d) for d in r.diffs[:3]))
        elif r.status == "xpass":
            problems.append(f"[{r.index}] xpass — remove stale xfail "
                            f"({r.reason})")
    assert not problems, (
        f"{name}.test: {dict(counts)}\n" + "\n".join(problems))
    assert counts.get("pass", 0) >= min_pass, (
        f"{name}.test pass floor regressed: "
        f"{counts.get('pass', 0)} < {min_pass} ({dict(counts)})")


@pytest.mark.skipif(not os.path.isdir(QT_DIR),
                    reason="reference workload texts not present")
def test_full_acid_original_file(acid_engine):
    """test_acid.py::test_full_acid_original_files: stage the
    reference's alltypes_non_acid.orc as an original file, promote,
    then run QueryTest/full-acid-original-file."""
    from incubator_impala_spark.testing import querytest as qt

    eng = acid_engine
    db = "qacid_originalfile"
    eng.sql(f"drop database if exists {db} cascade")
    eng.sql(f"create database {db}")
    eng.ns.current = db
    eng.sql("drop table if exists alltypes_promoted_nopart")
    wh = re.sub(r"^file:", "", eng.spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"))
    shutil.rmtree(os.path.join(wh, "alltypes_promoted_nopart"),
                  ignore_errors=True)
    eng.sql("""CREATE TABLE alltypes_promoted_nopart (
        id INT, bool_col BOOLEAN, tinyint_col TINYINT,
        smallint_col SMALLINT, int_col INT, bigint_col BIGINT,
        float_col FLOAT, double_col DOUBLE, date_string_col STRING,
        string_col STRING, timestamp_col TIMESTAMP,
        year INT, month INT) STORED AS ORC""")
    loc = eng._table_location("alltypes_promoted_nopart")
    os.makedirs(loc, exist_ok=True)
    shutil.copy(os.path.join(REF_DATA, "alltypes_non_acid.orc"),
                os.path.join(loc, "000000_0"))
    eng.spark.catalog.refreshTable("alltypes_promoted_nopart")
    eng.hive_sql("alter table alltypes_promoted_nopart set "
                 "tblproperties('EXTERNAL'='FALSE',"
                 "'transactional'='true')")
    try:
        counts = _run_staged_file(eng, "full-acid-original-file", db)
    finally:
        eng.ns.current = None   # staged-db USE must not leak
    assert counts.get("pass", 0) >= 14, dict(counts)


def _run_staged_file(eng, name: str, db: str) -> dict:
    """Run a file's blocks WITHOUT run_blocks' hermetic db reset —
    for files whose fixture staging (done by the python driver in the
    reference) must survive into the run."""
    from incubator_impala_spark.testing import querytest as qt

    blocks = qt.parse_test_file(os.path.join(QT_DIR, f"{name}.test"))
    eng.ns.current = db
    problems, counts = [], collections.Counter()
    for b in blocks:
        b.query = b.query.replace("$DATABASE", db)
        if b.hive:
            for htext in b.hive:
                for s in qt._split_statements(
                        htext.replace("$DATABASE", db)):
                    if s.strip():
                        eng.hive_sql(s)
        r = qt._run_one(eng, b, None, {})
        counts[r.status] += 1
        if r.status in ("fail", "error"):
            q = " ".join(b.query.split())[:120]
            problems.append(
                f"[{r.index}] {r.status}: {r.reason} | {q} | "
                + "; ".join(str(d) for d in (r.diffs or [])[:2]))
    assert not problems, f"{dict(counts)}\n" + "\n".join(problems)
    return counts


@pytest.mark.skipif(not os.path.isdir(QT_DIR),
                    reason="reference workload texts not present")
def test_acid_row_validation(acid_engine):
    """test_acid_row_validation.py: a Hive Streaming V2 side-file
    (write ids 1-2 in one delta_1_2 ORC) with both transactions OPEN;
    commit one txn between fragments and verify row validation."""
    from incubator_impala_spark import acid
    from incubator_impala_spark.testing import querytest as qt

    eng = acid_engine
    db = "qacid_rowvalidation"
    eng.sql(f"drop database if exists {db} cascade")
    eng.sql(f"create database {db}")
    eng.ns.current = db
    eng.sql("CREATE TABLE streaming (a string, b string) "
            "STORED AS ORC TBLPROPERTIES('transactional'='true')")
    t = acid.lookup(eng, "streaming")
    delta = os.path.join(t.location, "delta_1_2")
    os.makedirs(delta, exist_ok=True)
    shutil.copy(os.path.join(REF_DATA, "streaming.orc"),
                os.path.join(delta, "streaming.orc"))
    t.highwater = 2
    t.open_txns = {1, 2}
    t.dirty = True

    def run(frag: str, floor: int) -> None:
        blocks = qt.parse_test_file(
            os.path.join(QT_DIR, f"acid-row-validation-{frag}.test"))
        # run_blocks drops + recreates $DATABASE; the staged table
        # must survive across fragments, so run the blocks directly
        eng.ns.current = db
        fails = []
        for b in blocks:
            r = qt._run_one(eng, b, None, {})
            if r.status != "pass":
                fails.append((frag, r.index, r.status, r.reason,
                              r.diffs[:2]))
        assert not fails, fails
        assert len(blocks) >= floor

    try:
        run("0", 2)
        acid.commit_writeid(eng, "streaming")
        run("1", 2)
        acid.commit_writeid(eng, "streaming")
        run("2", 2)
    finally:
        eng.ns.current = None   # staged-db USE must not leak
