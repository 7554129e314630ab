"""Impala-exact distinctpc / distinctpcsa — Flajolet-Martin
probabilistic counting.

The reference's PC sketch (be/src/exprs/aggregate-functions-ir.cc
PcUpdate/PcsaUpdate/DistinctEstimateFinalize) is a 64x32 bitmap:

- distinctpc hashes each value 64 times (CRC32C seeded 0..63, the
  SSE4.2 crc32 path of HashUtil::Hash with the halves swapped) and
  sets bit ctz(hash) in every row;
- distinctpcsa (stochastic averaging) hashes once with seed 0, picks
  row hash%64 and bit ctz(hash/64);
- the estimate counts leading ones per row: avg = mean(run lengths),
  result = (2^avg - 2^(-1.75*avg)) / 0.77351, x64 for the PCSA form.

Spark-side the bitmap aggregates as 32 JVM `bit_or` longs (bitmap rows
2i and 2i+1 packed per long) — fixed-size state with map-side partial
aggregation, so the operator is one ordinary shuffle at any scale.
Only the per-row bit computation (a pandas UDF, Arrow-batched) and the
one finalize call are Python — the declared gap-function slow path.
"""

from __future__ import annotations

import math

NUM_BITMAPS = 64
BITMAP_LEN = 32
PC_THETA = 0.77351
PC_K = -1.75

# CRC32C (Castagnoli, reflected, no pre/post inversion — exactly the
# SSE4.2 crc32 instruction the reference's HashUtil::CrcHash chains)
_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc_hash(data: bytes, seed: int) -> int:
    h = seed & 0xFFFFFFFF
    for b in data:
        h = _CRC_TABLE[(h ^ b) & 0xFF] ^ (h >> 8)
    # the reference swaps the halves (CrcHash: lower half has poor
    # uniformity)
    return ((h << 16) | (h >> 16)) & 0xFFFFFFFF


def _ctz(x: int, cap: int) -> int:
    if x == 0:
        return cap
    return min(cap, (x & -x).bit_length() - 1)


def _hash32(data: bytes, seed: int, ts: bool) -> int:
    """AnyValUtil::Hash — TIMESTAMP chains TWO swapped CRC calls
    (TimestampValue::Hash: time_ 8 bytes, then date_ 4 bytes seeded
    with the first result); every other type is one call."""
    if ts:
        return crc_hash(data[8:12], crc_hash(data[:8], seed))
    return crc_hash(data, seed)


def _signed64(v: int) -> int:
    # bit 31 of the odd row lands on bit 63 — keep the long signed for
    # Arrow/Spark LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def pc_long(data: bytes, i: int, ts: bool = False) -> int:
    """distinctpc contribution for bitmap rows 2i and 2i+1, packed
    row2i | row2i+1 << 32."""
    out = 0
    for k, row in enumerate((2 * i, 2 * i + 1)):
        h = _hash32(data, row, ts)
        out |= (1 << _ctz(h, BITMAP_LEN - 1)) << (32 * k)
    return _signed64(out)


def pcsa_long(data: bytes, i: int, ts: bool = False) -> int:
    """distinctpcsa contribution to the long covering bitmap rows
    2i/2i+1 (zero when the hash lands elsewhere)."""
    h = _hash32(data, 0, ts)
    row = h % NUM_BITMAPS
    if row // 2 != i:
        return 0
    bit = _ctz(h // NUM_BITMAPS, BITMAP_LEN - 1)
    return _signed64((1 << bit) << (32 * (row % 2)))


def estimate(longs, stochastic: bool) -> int:
    """DistinctEstimateFinalize over the 32 packed longs."""
    if longs is None:
        return 0
    rows = []
    for v in longs:
        try:
            v = int(v) & 0xFFFFFFFFFFFFFFFF
        except (TypeError, ValueError):  # NULL bit_or (empty group)
            v = 0
        rows.append(v & 0xFFFFFFFF)
        rows.append((v >> 32) & 0xFFFFFFFF)
    if not any(rows):
        return 0
    total = 0
    for r in rows:
        run = 0
        while run < BITMAP_LEN and (r >> run) & 1:
            run += 1
        total += run
    avg = total / float(NUM_BITMAPS)
    result = (math.pow(2.0, avg) - math.pow(2.0, avg * PC_K)) / PC_THETA
    if stochastic:
        result *= NUM_BITMAPS
    return int(result)
