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
    # file header (14 bytes) + a real BITMAPINFOHEADER size field (40) —
    # the parser validates the DIB header size to tell 32-bit dims from
    # the OS/2 core header's 16-bit ones
    return b"BM" + b"\x00" * 12 + struct.pack("<I", 40) + struct.pack("<ii", w, h) + b"\x00" * 4


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


# ---- round-4: audio/video header metadata (stdlib container parse) ---------

def wav_bytes(rate: int = 44100, ch: int = 2, bits: int = 16, secs: float = 1.0) -> bytes:
    data_len = int(rate * ch * bits // 8 * secs)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", data_len) + b"\x00" * data_len
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mp4_bytes(w: int = 1920, h: int = 1080, timescale: int = 600, dur_units: int = 1800) -> bytes:
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"                       # version 0 + flags
        + struct.pack(">II", 0, 0)                 # creation/modification
        + struct.pack(">II", timescale, dur_units)
        + b"\x00" * 80,                            # rate..matrix..next_track
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + b"\x00" * 76                             # v0 fields through matrix
        + struct.pack(">II", w << 16, h << 16),    # 16.16 fixed width/height
    )
    trak = box(b"trak", tkhd)
    moov = box(b"moov", mvhd + trak)
    return ftyp + moov


def test_wav_header_parse():
    from kafka_connect_tablestore_spark.operators.multimodal import (
        wav_metadata_from_header,
    )

    m = wav_metadata_from_header(wav_bytes(rate=22050, ch=1, bits=8, secs=2.0))
    assert (m["sample_rate"], m["channels"], m["bits_per_sample"]) == (22050, 1, 8)
    assert abs(m["duration_s"] - 2.0) < 1e-6
    assert wav_metadata_from_header(b"RIFFxxxxNOPE") is None
    assert wav_metadata_from_header(b"short") is None
    # fmt chunk missing -> None (no sample_rate to report)
    assert wav_metadata_from_header(b"RIFF" + struct.pack("<I", 4) + b"WAVE") is None


def test_mp4_header_parse():
    from kafka_connect_tablestore_spark.operators.multimodal import (
        mp4_metadata_from_header,
    )

    m = mp4_metadata_from_header(mp4_bytes(w=640, h=360, timescale=1000, dur_units=2500))
    assert (m["width"], m["height"]) == (640, 360)
    assert abs(m["duration_s"] - 2.5) < 1e-9
    assert mp4_metadata_from_header(b"garbage") is None
    assert mp4_metadata_from_header(mp4_bytes()[:20]) is None  # truncated moov


def test_extract_av_metadata_distributed(spark):
    from kafka_connect_tablestore_spark.operators.multimodal import (
        extract_av_metadata,
    )

    rows = [
        (0, wav_bytes(rate=48000, ch=2, bits=16, secs=0.5)),
        (1, mp4_bytes(w=1280, h=720, timescale=600, dur_units=600)),
        (2, b"not-a-container"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in extract_av_metadata(df).collect()}
    assert got[0]["format"] == "wav" and got[0]["sample_rate"] == 48000
    assert got[0]["channels"] == 2 and abs(got[0]["duration_s"] - 0.5) < 1e-6
    assert got[1]["format"] == "mp4" and (got[1]["width"], got[1]["height"]) == (1280, 720)
    assert abs(got[1]["duration_s"] - 1.0) < 1e-9
    assert got[2]["format"] is None and got[2]["n_bytes"] == len(b"not-a-container")
    assert got[3]["format"] is None and got[3]["n_bytes"] == 0
