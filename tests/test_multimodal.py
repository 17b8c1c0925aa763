"""Multimodal: REAL header-based image metadata (stdlib parse, no codec) +
the fake-gated decode plumbing."""

from __future__ import annotations

import struct

from kafka_connect_tablestore_spark.operators.multimodal import (
    decode_and_featurize,
    extract_image_metadata,
    image_dims_from_header,
    synth_media,
)


def png_bytes(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
    )


def gif_bytes(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 3


def bmp_bytes(w: int, h: int) -> bytes:
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 4


def jpeg_bytes(w: int, h: int) -> bytes:
    # SOI + APP0 (JFIF, 16 bytes) + SOF0 carrying (h, w)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_header_parse_all_formats():
    assert image_dims_from_header(png_bytes(640, 480)) == (640, 480)
    assert image_dims_from_header(gif_bytes(320, 200)) == (320, 200)
    assert image_dims_from_header(bmp_bytes(800, 600)) == (800, 600)
    assert image_dims_from_header(bmp_bytes(800, -600)) == (800, 600)  # top-down DIB
    assert image_dims_from_header(jpeg_bytes(1024, 768)) == (1024, 768)
    assert image_dims_from_header(b"not an image") is None
    assert image_dims_from_header(b"\x89PNG\r\n\x1a\n") is None  # truncated


def test_extract_image_metadata_distributed(spark):
    rows = [
        (0, png_bytes(64, 32)),
        (1, jpeg_bytes(100, 50)),
        (2, gif_bytes(10, 20)),
        (3, b"garbage-payload"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_image_metadata(df).collect()}
    assert (got[0]["format"], got[0]["width"], got[0]["height"]) == ("png", 64, 32)
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("jpeg", 100, 50)
    assert (got[2]["format"], got[2]["width"], got[2]["height"]) == ("gif", 10, 20)
    assert got[3]["format"] is None and got[3]["width"] is None
    assert got[3]["n_bytes"] == len(b"garbage-payload")


def test_fake_decode_plumbing_still_gated(spark):
    media = synth_media(spark, 6)
    out = decode_and_featurize(media, fake=True).collect()
    assert len(out) == 6 and all(len(r["feature"]) == 8 for r in out)
