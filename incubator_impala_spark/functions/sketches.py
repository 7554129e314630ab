"""Quantile sketches: the reference's ds_kll_* family, Spark-native.

Reference surface: ds_kll_sketch / ds_kll_union / ds_kll_quantile /
ds_kll_rank / ds_kll_n (registrations
fe/src/main/java/org/apache/impala/catalog/BuiltinsDb.java:1327-1374;
scalar estimators be/src/exprs/datasketches-functions-ir.cc:1-223;
aggregate plumbing be/src/exprs/aggregate-functions-ir.cc DsKll*).

The Apache `datasketches` pip package is not available in this
container, so the sketch is implemented here from the public KLL paper
(Karnin, Lang, Liberty — "Optimal Quantile Approximation in Streams",
FOCS 2016): a hierarchy of buffers where level i items carry weight
2^i; a full level is sorted and every other item promoted upward.
Rank error is O(1/k) with k=200 default (~1% — the same ballpark the
reference documents for its KLL at default k).

Serialization is a small struct-packed format — NOT binary-compatible
with Apache DataSketches (documented divergence; the reference's
sketches interoperate with Hive's). Mergeability is the property that
matters at 100 TB: per-partition sketches merge associatively, so
Spark's partial aggregation (map-side combine → reduce merge) gives
one shuffle of ~KB-sized states instead of a global sort.

Determinism note: compaction keeps a flip-flop parity bit (the paper
uses a random coin; a deterministic alternating coin preserves the
error bound's telescoping argument in practice and keeps results
stable across retries, which matters for Spark task re-execution).
"""

from __future__ import annotations

import math
import struct

_MAGIC = b"KLL1"


class KllSketch:
    """Floats-in, quantiles-out KLL sketch (weight-2^i level buffers)."""

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[list[float]] = [[]]
        self.n = 0
        self.min_v = math.inf
        self.max_v = -math.inf
        self._coin = 0

    # -- capacity ----------------------------------------------------------
    def _cap(self, level: int) -> int:
        """Capacity of `level` given the current number of levels: the
        topmost levels get ~k, lower levels shrink by (2/3)^depth with
        a floor of 8 (the paper's c=2/3 schedule)."""
        depth = len(self.levels) - 1 - level
        return max(8, int(self.k * (2.0 / 3.0) ** depth))

    def _total_cap(self) -> int:
        return sum(self._cap(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(len(b) for b in self.levels)

    # -- updates -----------------------------------------------------------
    def update(self, v: float) -> None:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return
        v = float(v)
        self.levels[0].append(v)
        self.n += 1
        if v < self.min_v:
            self.min_v = v
        if v > self.max_v:
            self.max_v = v
        if self._size() > self._total_cap():
            self._compress()

    def update_many(self, values) -> None:
        for v in values:
            self.update(v)

    def _compress(self) -> None:
        for i, buf in enumerate(self.levels):
            if len(buf) > self._cap(i):
                buf.sort()
                if i + 1 == len(self.levels):
                    self.levels.append([])
                offset = self._coin
                self._coin ^= 1
                if len(buf) % 2 == 1:
                    # keep one leftover at this level so weights stay exact
                    leftover, body = [buf[-1]], buf[:-1]
                else:
                    leftover, body = [], buf
                self.levels[i + 1].extend(body[offset::2])
                self.levels[i] = leftover
                return
        # nothing individually over capacity but total is: compact level 0
        if self.levels[0]:
            self.levels[0].sort()
            if len(self.levels) == 1:
                self.levels.append([])
            body = self.levels[0]
            if len(body) % 2 == 1:
                self.levels[0], body = [body[-1]], body[:-1]
            else:
                self.levels[0] = []
            offset = self._coin
            self._coin ^= 1
            self.levels[1].extend(body[offset::2])

    # -- merge -------------------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for i, buf in enumerate(other.levels):
            self.levels[i].extend(buf)
        self.n += other.n
        self.min_v = min(self.min_v, other.min_v)
        self.max_v = max(self.max_v, other.max_v)
        while self._size() > self._total_cap():
            before = self._size()
            self._compress()
            if self._size() == before:  # safety: no progress
                break
        return self

    # -- queries -----------------------------------------------------------
    def _weighted_items(self) -> list[tuple[float, int]]:
        out: list[tuple[float, int]] = []
        for i, buf in enumerate(self.levels):
            w = 1 << i
            out.extend((v, w) for v in buf)
        out.sort(key=lambda t: t[0])
        return out

    def quantile(self, q: float) -> float | None:
        if self.n == 0:
            return None
        q = min(max(q, 0.0), 1.0)
        if q == 0.0:
            return self.min_v
        if q == 1.0:
            return self.max_v
        items = self._weighted_items()
        target = q * self.n
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return self.max_v

    def rank(self, v: float) -> float | None:
        """Estimated fraction of items <= v."""
        if self.n == 0:
            return None
        cum = sum(w for x, w in self._weighted_items() if x <= v)
        return cum / self.n

    # -- serialization -----------------------------------------------------
    def serialize(self) -> bytes:
        parts = [
            _MAGIC,
            struct.pack(
                "<iqddi", self.k, self.n,
                self.min_v if self.n else 0.0,
                self.max_v if self.n else 0.0,
                len(self.levels),
            ),
        ]
        for buf in self.levels:
            parts.append(struct.pack("<i", len(buf)))
            parts.append(struct.pack(f"<{len(buf)}d", *buf))
        return b"".join(parts)

    @classmethod
    def deserialize(cls, data: bytes) -> "KllSketch":
        if data[:4] != _MAGIC:
            raise ValueError("not a KLL1 sketch")
        k, n, mn, mx, n_levels = struct.unpack_from("<iqddi", data, 4)
        sk = cls(k)
        sk.n = n
        sk.min_v = mn if n else math.inf
        sk.max_v = mx if n else -math.inf
        sk.levels = []
        off = 4 + struct.calcsize("<iqddi")
        for _ in range(n_levels):
            (cnt,) = struct.unpack_from("<i", data, off)
            off += 4
            sk.levels.append(list(struct.unpack_from(f"<{cnt}d", data, off)))
            off += 8 * cnt
        if not sk.levels:
            sk.levels = [[]]
        return sk


# ---------------------------------------------------------------------------
# histogram / sampled_ndv helpers (operator-level, DataFrame-native)
# ---------------------------------------------------------------------------


def register(spark) -> None:
    """Install the ds_kll_* SQL surface on the session.

    Sketch values travel as hex STRINGs (the reference's sketch type is
    StringVal too) so they survive any SQL surface; ds_kll_sketch /
    ds_kll_union are pandas GROUPED_AGG UDAFs — Spark runs them as
    partial aggregates per partition + merge, which is exactly the
    Init/Update/Merge/Finalize lifecycle of the reference's UDAs and
    the property that keeps the shuffle at ~KB per group at 100 TB.
    """
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _kll_sketch_agg(v):
        sk = KllSketch()
        sk.update_many(v.dropna().astype(float).tolist())
        return sk.serialize().hex()

    _kll_sketch_agg.__annotations__ = {"v": pd.Series, "return": str}
    kll_sketch = pandas_udf(_kll_sketch_agg, "string", PandasUDFType.GROUPED_AGG)

    def _kll_union_agg(s):
        out = KllSketch()
        for h in s.dropna():
            out = out.merge(KllSketch.deserialize(bytes.fromhex(h)))
        return out.serialize().hex()

    _kll_union_agg.__annotations__ = {"s": pd.Series, "return": str}
    kll_union = pandas_udf(_kll_union_agg, "string", PandasUDFType.GROUPED_AGG)

    def _kll_quantile(s, q):
        return pd.Series(
            [
                None
                if h is None
                else KllSketch.deserialize(bytes.fromhex(h)).quantile(float(qq))
                for h, qq in zip(s, q)
            ],
            dtype="float64",
        )

    _kll_quantile.__annotations__ = {
        "s": pd.Series, "q": pd.Series, "return": pd.Series
    }
    kll_quantile = pandas_udf(_kll_quantile, "double")

    def _kll_rank(s, v):
        return pd.Series(
            [
                None
                if h is None
                else KllSketch.deserialize(bytes.fromhex(h)).rank(float(vv))
                for h, vv in zip(s, v)
            ],
            dtype="float64",
        )

    _kll_rank.__annotations__ = {"s": pd.Series, "v": pd.Series, "return": pd.Series}
    kll_rank = pandas_udf(_kll_rank, "double")

    def _kll_n(s):
        return pd.Series(
            [
                None if h is None else KllSketch.deserialize(bytes.fromhex(h)).n
                for h in s
            ],
            dtype="Int64",
        )

    _kll_n.__annotations__ = {"s": pd.Series, "return": pd.Series}
    kll_n = pandas_udf(_kll_n, "long")

    def _kll_quantiles_as_string(s, qs):
        out = []
        for h, qq in zip(s, qs):
            if h is None:
                out.append(None)
                continue
            sk = KllSketch.deserialize(bytes.fromhex(h))
            vals = [sk.quantile(float(x)) for x in str(qq).split(",")]
            out.append(", ".join("nan" if v is None else repr(v) for v in vals))
        return pd.Series(out, dtype="object")

    _kll_quantiles_as_string.__annotations__ = {
        "s": pd.Series, "qs": pd.Series, "return": pd.Series
    }
    kll_quantiles_as_string = pandas_udf(_kll_quantiles_as_string, "string")

    def _kll_stringify(s):
        out = []
        for h in s:
            if h is None:
                out.append(None)
                continue
            sk = KllSketch.deserialize(bytes.fromhex(h))
            out.append(
                f"K={sk.k} N={sk.n} "
                f"Min={sk.min_v if sk.n else 'nan'} "
                f"Max={sk.max_v if sk.n else 'nan'} "
                f"Levels={len(sk.levels)} "
                f"Retained={sum(len(b) for b in sk.levels)}"
            )
        return pd.Series(out, dtype="object")

    _kll_stringify.__annotations__ = {"s": pd.Series, "return": pd.Series}
    kll_stringify = pandas_udf(_kll_stringify, "string")

    def _cdf_points(sk, splits: str) -> list[float]:
        """CDF at each split (inclusive rank, our KllSketch.rank
        semantics) plus the trailing 1.0 — n+1 values like the
        DataSketches get_CDF contract (reference registry:
        ds_kll_cdf_as_string, impala_functions.py:954)."""
        pts = [float(x) for x in str(splits).split(",")]
        return [sk.rank(p) or 0.0 for p in pts] + [1.0]

    def _kll_cdf_as_string(s, splits):
        out = []
        for h, sp in zip(s, splits):
            if h is None:
                out.append(None)
                continue
            sk = KllSketch.deserialize(bytes.fromhex(h))
            out.append(", ".join(repr(v) for v in _cdf_points(sk, sp)))
        return pd.Series(out, dtype="object")

    _kll_cdf_as_string.__annotations__ = {
        "s": pd.Series, "splits": pd.Series, "return": pd.Series
    }
    kll_cdf_as_string = pandas_udf(_kll_cdf_as_string, "string")

    def _kll_pmf_as_string(s, splits):
        out = []
        for h, sp in zip(s, splits):
            if h is None:
                out.append(None)
                continue
            sk = KllSketch.deserialize(bytes.fromhex(h))
            cdf = _cdf_points(sk, sp)
            pmf = [cdf[0]] + [b - a for a, b in zip(cdf, cdf[1:])]
            out.append(", ".join(repr(v) for v in pmf))
        return pd.Series(out, dtype="object")

    _kll_pmf_as_string.__annotations__ = {
        "s": pd.Series, "splits": pd.Series, "return": pd.Series
    }
    kll_pmf_as_string = pandas_udf(_kll_pmf_as_string, "string")

    spark.udf.register("ds_kll_sketch", kll_sketch)
    spark.udf.register("ds_kll_union", kll_union)
    spark.udf.register("ds_kll_quantile", kll_quantile)
    spark.udf.register("ds_kll_rank", kll_rank)
    spark.udf.register("ds_kll_n", kll_n)
    spark.udf.register("ds_kll_quantiles_as_string", kll_quantiles_as_string)
    spark.udf.register("ds_kll_stringify", kll_stringify)
    spark.udf.register("ds_kll_cdf_impl", kll_cdf_as_string)
    spark.udf.register("ds_kll_pmf_impl", kll_pmf_as_string)


def sampled_ndv_estimate(d: int, f1: int, sample_n: int, fraction: float) -> int:
    """Extrapolate NDV from a sample: Duj1 estimator (Haas et al.,
    SIGMOD'95 — the same estimator family the reference's curve-fit
    SampledNdvFinalize approximates, aggregate-functions-ir.cc:2100+):

        D_hat = d / (1 - (1 - q) * f1 / n)

    d = distinct values in sample, f1 = values seen exactly once,
    n = sample row count, q = sampling fraction.
    """
    if sample_n == 0:
        return 0
    if fraction >= 1.0:
        return d
    denom = 1.0 - (1.0 - fraction) * f1 / sample_n
    if denom <= 0:
        denom = 1.0 / sample_n
    return int(round(d / denom))
