"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Net-new capability: image/audio/video treated as `binary` columns with
decode / feature-extraction / resize / frame-sample steps running as
Arrow-batched `mapInPandas` stages. The decode is REAL for PNG (full
pixel decode, pure stdlib — `operators/imagecodec.py`) and JPEG
(dimensions from the SOF frame header); payloads in any other format
fall back to `_decode_stub`'s *deterministic* fake metadata (labeled
`format='unknown'`), so pipelines over synthetic corpora keep an exact
SQL oracle while real image bytes get real answers.

At scale: mapInPandas streams Arrow batches; payload bytes never
round-trip through Python object-per-row. Partition sizing rule: keep
`spark.sql.files.maxPartitionBytes` at the default 128 MB so one task
holds ~128 MB of payloads + decode workspace.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, str]:
    """Fallback for formats without an in-container codec (webp, gif,
    raw text, ...): deterministic fake dimensions derived from payload
    length only, so pipelines over synthetic corpora keep an exact SQL
    oracle. Real formats never reach this — see `_decode_payload`."""
    n = len(payload)
    width = n % 640 + 16
    height = (n * 7) % 480 + 16
    return width, height, "unknown"


def _decode_payload(payload: bytes) -> tuple[int, int, str]:
    """Real decode where a codec exists, deterministic fake otherwise.

    PNG: full pixel decode (imagecodec.decode_png — stdlib zlib).
    JPEG: dimensions from the SOF frame header.
    """
    from incubator_impala_spark.operators import imagecodec

    fmt = imagecodec.sniff_format(payload)
    try:
        if fmt == "png":
            meta = imagecodec.decode_png(payload)
            return meta["width"], meta["height"], "png"
        if fmt == "jpeg":
            w, h, _comps = imagecodec.jpeg_dimensions(payload)
            return w, h, "jpeg"
    except ValueError:
        pass  # corrupt or unsupported variant → fake path below
    return _decode_stub(payload)


def decode_metadata(df: DataFrame, payload_col: str = "payload",
                    id_col: str = "doc_id") -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            meta = [_decode_payload(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pd.Series([m[0] for m in meta], dtype="int32"),
                    "height": pd.Series([m[1] for m in meta], dtype="int32"),
                    "format": [m[2] for m in meta],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _batches, schema=DECODE_META_SCHEMA
    )


def synthetic_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload column from text (the
    test stand-in for real image bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


FEATURE_BINS = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bin", IntegerType()),
        StructField("cnt", LongType()),
    ]
)


def byte_histogram_features(df: DataFrame, payload_col: str = "payload",
                            id_col: str = "doc_id") -> DataFrame:
    """Feature extraction over binary payloads: 16-bin byte histogram
    (byte % 16), one row per (doc, bin). Unlike the decode stub this
    is a *real* computation — the pattern for any per-payload feature
    (color histograms, spectral bins, ...) running as Arrow-batched
    mapInPandas with payload bytes never leaving the batch."""
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_bins, out_cnts = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8) % FEATURE_BINS
                counts = np.bincount(arr, minlength=FEATURE_BINS)
                for b in range(FEATURE_BINS):
                    if counts[b]:
                        out_ids.append(doc_id)
                        out_bins.append(b)
                        out_cnts.append(int(counts[b]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "bin": pd.Series(out_bins, dtype="int32"),
                    "cnt": pd.Series(out_cnts, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)

FRAME_SIZE = 64  # bytes per "frame" of the opaque payload


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", stride: int = 2) -> DataFrame:
    """Frame sampling: split the payload into FRAME_SIZE-byte frames
    and keep every `stride`-th one (video keyframe-sampling pattern;
    one output row per kept frame, payload sliced inside the Arrow
    batch)."""
    import hashlib

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                n_frames = (len(data) + FRAME_SIZE - 1) // FRAME_SIZE
                for i in range(0, n_frames, stride):
                    chunk = data[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(len(chunk))
                    rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(rows["frame_idx"], dtype="int32"),
                    "frame_len": pd.Series(rows["frame_len"], dtype="int32"),
                    "frame_md5": rows["frame_md5"],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_batches, schema=FRAME_SCHEMA)
