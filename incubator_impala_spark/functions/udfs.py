"""Python-UDF gap functions (the deliberate slow path).

These are the ~handful of reference builtins with no Spark-native
equivalent (SURVEY.md §2.11 gap list). All are Arrow-batched pandas
UDFs — never row-at-a-time Python — and none appear in benchmark hot
paths. Value-stability notes cite the reference implementation.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, DoubleType, IntegerType

_FNV64_PRIME = 0x100000001B3
_FNV64_SEED = 0xCBF29CE484222325
_MASK64 = (1 << 64) - 1


def _fnv1_64(data: bytes) -> int:
    """FNV-1 64-bit as in the reference's HashUtil::FnvHash64
    (be/src/util/hash-util.h): multiply-then-xor over bytes."""
    h = _FNV64_SEED
    for b in data:
        h = ((h * _FNV64_PRIME) & _MASK64) ^ b
    # to signed 64
    return h - (1 << 64) if h >= (1 << 63) else h


def _typed_bytes(v, spark_type: str) -> bytes:
    """The reference hashes each value's raw slot bytes
    (utility-functions-ir.cc MurmurHash/FnvHash over sizeof(val)):
    little-endian fixed-width numerics, 4-byte day count for DATE,
    boost ptime layout (int64 nanos-of-day + uint32 Julian Day Number)
    for TIMESTAMP, the unscaled 4/8/16-byte int for DECIMAL, utf-8
    bytes for strings. Verified against the reference's own expected
    hashes for every alltypes column type (exprs.test) and date_tbl."""
    import datetime
    import struct
    from decimal import Decimal

    t = spark_type.lower()
    epoch = datetime.date(1970, 1, 1)
    if t == "boolean":
        return struct.pack("<b", 1 if v else 0)
    if t == "tinyint":
        return struct.pack("<b", int(v))
    if t == "smallint":
        return struct.pack("<h", int(v))
    if t in ("int", "integer"):
        return struct.pack("<i", int(v))
    if t == "bigint":
        return struct.pack("<q", int(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "date":
        d = v.date() if isinstance(v, datetime.datetime) else v
        return struct.pack("<i", (d - epoch).days)
    if t.startswith("timestamp"):
        nanos = ((v.hour * 3600 + v.minute * 60 + v.second) * 10 ** 9
                 + v.microsecond * 1000)
        jdn = (v.date() - epoch).days + 2440588
        return struct.pack("<q", nanos) + struct.pack("<I", jdn)
    if t.startswith("decimal"):
        import re as _re

        m = _re.match(r"decimal\((\d+),\s*(-?\d+)\)", t)
        p, sc = (int(m.group(1)), int(m.group(2))) if m else (38, 0)
        size = 4 if p <= 9 else 8 if p <= 18 else 16
        unscaled = int(Decimal(str(v)).scaleb(sc))
        return unscaled.to_bytes(size, "little", signed=True)
    if t == "binary":
        return bytes(v)
    return str(v).encode("utf-8")


def _murmur2_64a(data: bytes, seed: int = 0) -> int:
    """MurmurHash2 64A (public algorithm; reference
    HashUtil::MurmurHash2_64, be/src/util/hash-util.h, called with
    MURMUR_DEFAULT_SEED=0 by the murmur_hash builtin) — verified
    byte-exact against the reference's date.test expected hashes."""
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ ((len(data) * m) & _MASK64)) & _MASK64
    n = len(data) // 8
    for i in range(n):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * m) & _MASK64
        k ^= k >> r
        k = (k * m) & _MASK64
        h = (h ^ k) & _MASK64
        h = (h * m) & _MASK64
    tail = data[n * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & _MASK64
    h ^= h >> r
    h = (h * m) & _MASK64
    h ^= h >> r
    return h - (1 << 64) if h >= (1 << 63) else h


def _damerau_levenshtein(s1: str, s2: str) -> int:
    """Optimal-string-alignment distance, matching the reference's
    damerau_levenshtein (be/src/exprs/string-functions-ir.cc)."""
    if s1 is None or s2 is None:
        return None  # type: ignore[return-value]
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return l2
    if l2 == 0:
        return l1
    prev2 = None
    prev = list(range(l2 + 1))
    for i in range(1, l1 + 1):
        cur = [i] + [0] * l2
        for j in range(1, l2 + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and s1[i - 1] == s2[j - 2]
                and s1[i - 2] == s2[j - 1]
            ):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[l2]


def _jaro(s1: str, s2: str) -> float:
    if s1 is None or s2 is None:
        return None  # type: ignore[return-value]
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    match_dist = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - match_dist), min(l2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3.0


def _jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    j = _jaro(s1, s2)
    if j is None:
        return None  # type: ignore[return-value]
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix += 1
        else:
            break
    return j + prefix * prefix_scale * (1.0 - j)


def register(spark: SparkSession) -> None:
    """Install gap UDFs as SQL-callable functions on the session."""

    @pandas_udf(LongType())
    def fnv_hash(s: pd.Series) -> pd.Series:
        # dtype must stay a (nullable) int64: a None in the batch would
        # otherwise coerce the result to float64 and round the low ~11
        # bits of every hash (caught by date.test murmur expectations)
        return pd.Series(
            [_fnv1_64(str(v).encode("utf-8")) if v is not None else None
             for v in s], dtype="Int64")

    @pandas_udf(LongType())
    def murmur_hash(s: pd.Series) -> pd.Series:
        return pd.Series(
            [_murmur2_64a(str(v).encode("utf-8")) if v is not None
             else None for v in s], dtype="Int64")

    @pandas_udf(LongType())
    def murmur_hash_typed(s: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else _murmur2_64a(_typed_bytes(v, ty))
             for v, ty in zip(s, t)], dtype="Int64")

    @pandas_udf(LongType())
    def fnv_hash_typed(s: pd.Series, t: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else _fnv1_64(_typed_bytes(v, ty))
             for v, ty in zip(s, t)], dtype="Int64")

    @pandas_udf(IntegerType())
    def hll_slot_typed(s: pd.Series, t: pd.Series) -> pd.Series:
        # one value's HLL bucket update, packed idx*256+rank — the
        # reference's NDV hashing exactly (AnyValUtil::Hash64 =
        # MurmurHash2_64 over the type's memory layout, seeded with
        # FNV64_SEED; be/src/exprs/aggregate-functions-ir.cc
        # HllUpdate). Verified value-exact against distinct-estimate
        # .test's pinned outputs.
        from incubator_impala_spark.functions import hll

        seed = 0xCBF29CE484222325
        return pd.Series(
            [None if pd.isna(v) else hll.slot_code(
                _murmur2_64a(_typed_bytes(v, ty), seed))
             for v, ty in zip(s, t)], dtype="Int32")

    @pandas_udf(LongType())
    def pc_long_typed(s: pd.Series, t: pd.Series,
                      i: pd.Series) -> pd.Series:
        # distinctpc: bitmap rows 2i/2i+1 packed per long (functions/
        # pc.py — the reference's 64-seed CRC32C probabilistic counter)
        from incubator_impala_spark.functions import pc

        return pd.Series(
            [None if pd.isna(v) else pc.pc_long(
                _typed_bytes(v, ty), iv, ty.startswith("timestamp"))
             for v, ty, iv in zip(s, t, i)], dtype="Int64")

    @pandas_udf(LongType())
    def pcsa_long_typed(s: pd.Series, t: pd.Series,
                        i: pd.Series) -> pd.Series:
        from incubator_impala_spark.functions import pc

        return pd.Series(
            [None if pd.isna(v)
             else pc.pcsa_long(_typed_bytes(v, ty), iv,
                               ty.startswith("timestamp"))
             for v, ty, iv in zip(s, t, i)], dtype="Int64")

    @pandas_udf(LongType())
    def pc_est(longs: pd.Series) -> pd.Series:
        from incubator_impala_spark.functions import pc

        return pd.Series([pc.estimate(v, False) for v in longs],
                         dtype="Int64")

    @pandas_udf(LongType())
    def pcsa_est(longs: pd.Series) -> pd.Series:
        from incubator_impala_spark.functions import pc

        return pd.Series([pc.estimate(v, True) for v in longs],
                         dtype="Int64")

    @pandas_udf(LongType())
    def impala_hll_est(slots: pd.Series) -> pd.Series:
        # finalize over the collected slot codes (≤ 1024*55 entries,
        # bounded regardless of input size)
        from incubator_impala_spark.functions import hll

        return pd.Series(
            [hll.estimate_from_slots(v) for v in slots], dtype="Int64")

    @pandas_udf(IntegerType())
    def damerau_levenshtein(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [_damerau_levenshtein(x, y) for x, y in zip(a, b)], dtype="Int32"
        )

    @pandas_udf(DoubleType())
    def jaro_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [None if (v := _jaro(x, y)) is None else 1.0 - v for x, y in zip(a, b)]
        )

    @pandas_udf(DoubleType())
    def jaro_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_jaro(x, y) for x, y in zip(a, b)])

    @pandas_udf(DoubleType())
    def jaro_winkler_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([_jaro_winkler(x, y) for x, y in zip(a, b)])

    @pandas_udf(DoubleType())
    def jaro_winkler_distance(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if (v := _jaro_winkler(x, y)) is None else 1.0 - v
                for x, y in zip(a, b)
            ]
        )

    spark.udf.register("fnv_hash", fnv_hash)
    spark.udf.register("murmur_hash", murmur_hash)
    spark.udf.register("fnv_hash_typed", fnv_hash_typed)
    spark.udf.register("murmur_hash_typed", murmur_hash_typed)
    spark.udf.register("hll_slot_typed", hll_slot_typed)
    spark.udf.register("impala_hll_est", impala_hll_est)
    spark.udf.register("pc_long_typed", pc_long_typed)
    spark.udf.register("pcsa_long_typed", pcsa_long_typed)
    spark.udf.register("pc_est", pc_est)
    spark.udf.register("pcsa_est", pcsa_est)
    spark.udf.register("damerau_levenshtein", damerau_levenshtein)
    spark.udf.register("jaro_distance", jaro_distance)
    spark.udf.register("jaro_similarity", jaro_similarity)
    spark.udf.register("jaro_winkler_similarity", jaro_winkler_similarity)
    spark.udf.register("jaro_winkler_distance", jaro_winkler_distance)
