"""Multimodal decode with REAL codecs: PNG pixel decode and JPEG
header decode (operators/imagecodec.py, stdlib-only), end-to-end
through the Arrow-batched mapInPandas decode stage, plus the
deterministic fallback for un-decodable payloads."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from incubator_impala_spark.operators import imagecodec as IC


def _jpeg_bytes(w: int, h: int) -> bytes:
    head = b"\xff\xd8\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00" + b"\x00" * 8
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
    sof += struct.pack(">HHB", h, w, 3) + b"\x00" * 10
    return head + sof


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        arr = rng.integers(0, 256, size=(11, 13, c), dtype=np.uint8)
        meta = IC.decode_png(IC.encode_png(arr))
        assert (meta["width"], meta["height"], meta["channels"]) == (13, 11, c)
        assert (meta["pixels"] == arr).all()


def test_png_palette_decode():
    # hand-build a color-type-3 PNG: 2x2 indices into a 3-color palette
    import zlib

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # filter0,row(0,1); filter0,row(2,1)
    blob = (
        IC.PNG_MAGIC
        + IC._chunk(b"IHDR", ihdr)
        + IC._chunk(b"PLTE", palette)
        + IC._chunk(b"IDAT", zlib.compress(raw))
        + IC._chunk(b"IEND", b"")
    )
    meta = IC.decode_png(blob)
    assert meta["channels"] == 3
    assert meta["pixels"][0, 0].tolist() == [255, 0, 0]
    assert meta["pixels"][0, 1].tolist() == [0, 255, 0]
    assert meta["pixels"][1, 0].tolist() == [0, 0, 255]


def test_jpeg_header_dimensions():
    assert IC.jpeg_dimensions(_jpeg_bytes(640, 480)) == (640, 480, 3)
    assert IC.sniff_format(_jpeg_bytes(1, 1)) == "jpeg"


def test_sniff_formats():
    assert IC.sniff_format(b"GIF89a....") == "gif"
    assert IC.sniff_format(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert IC.sniff_format(b"plain text here") == "unknown"


def test_decode_errors():
    with pytest.raises(ValueError):
        IC.decode_png(b"not a png")
    with pytest.raises(ValueError):
        IC.jpeg_dimensions(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")


def test_decode_metadata_real_and_fallback(spark):
    """Mixed payload column: real PNG, real JPEG header, and text
    fallback — one mapInPandas stage, correct answer per row."""
    from incubator_impala_spark.operators.multimodal import decode_metadata

    rng = np.random.default_rng(3)
    png = IC.encode_png(rng.integers(0, 256, size=(24, 37, 3), dtype=np.uint8))
    jpeg = _jpeg_bytes(320, 200)
    txt = "just some document text".encode()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(jpeg)), (3, bytearray(txt))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_metadata(df).collect()}
    assert (rows[1].width, rows[1].height, rows[1].format) == (37, 24, "png")
    assert (rows[2].width, rows[2].height, rows[2].format) == (320, 200, "jpeg")
    n = len(txt)
    assert (rows[3].width, rows[3].height, rows[3].format) == (
        n % 640 + 16, (n * 7) % 480 + 16, "unknown",
    )
    assert rows[1].n_bytes == len(png)
