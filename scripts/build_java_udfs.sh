#!/bin/bash
# Build this repo's own Hive-bridge UDF jar (java_udfs/ sources) used
# by the java-udf parity runner (scripts/run_java_udf_parity.py).
# Compiles against the pyspark-shipped hive-exec + hadoop jars.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
JARS="$(python3 -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "jars"))')"
HIVE_EXEC="$(ls "$JARS"/hive-exec-*.jar | head -1)"
HIVE_SERDE="$(ls "$JARS"/hive-serde-*.jar | head -1)"
HADOOP="$(ls "$JARS"/hadoop-client-api-*.jar | head -1)"
BUILD="$(mktemp -d)"
javac -encoding UTF-8 -cp "$HIVE_EXEC:$HIVE_SERDE:$HADOOP" -d "$BUILD" \
  "$REPO"/java_udfs/org/sparkgraft/hiveudfs/*.java
mkdir -p "$REPO/fixtures/_cache"
(cd "$BUILD" && jar cf "$REPO/fixtures/_cache/sparkgraft-hive-udfs.jar" org)
rm -rf "$BUILD"
echo "built fixtures/_cache/sparkgraft-hive-udfs.jar"
