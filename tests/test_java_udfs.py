"""java-udf.test / load-java-udfs.test parity (SURVEY §2.12 row 67).

Hive-bridge UDFs need a Hive-catalog SparkSession and this suite's
session is in-memory (one JVM, one catalogImplementation), so the
parity run happens in a subprocess (scripts/run_java_udf_parity.py):
the engine's CREATE FUNCTION ... LOCATION ... SYMBOL DDL genuinely
ADD-JARs and registers every function from load-java-udfs.test, then
java-udf.test runs block-by-block against the inline expectations.

The jar is this repo's own implementation (java_udfs/) of the
behaviors the .test pins; reference symbols map onto it
(run_java_udf_parity.SYMBOL_MAP). Built by scripts/build_java_udfs.sh
on demand.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JAR = os.path.join(REPO, "fixtures", "_cache",
                   "sparkgraft-hive-udfs.jar")


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/testdata/workloads"),
    reason="reference workload texts not present")
def test_java_udf_parity():
    if shutil.which("javac") is None and not os.path.exists(JAR):
        pytest.skip("no javac and no prebuilt jar")
    if not os.path.exists(JAR):
        subprocess.run(
            ["bash", os.path.join(REPO, "scripts",
                                  "build_java_udfs.sh")],
            check=True, capture_output=True)
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "run_java_udf_parity.py")],
        capture_output=True, text=True, timeout=600)
    last = out.stdout.strip().splitlines()[-1]
    res = json.loads(last)
    assert not res.get("problems"), res
    assert res.get("pass", 0) >= 33, res
    assert res.get("created", 0) >= 25, res
