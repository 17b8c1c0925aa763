"""Multimodal/index-maint/engine review hardening (round-5 final review):
container-spec edge parsing (mvhd v1, BMP core header, JPEG fill bytes),
the shared format sniff, the tolerance-gate scan budget, and the
directory-derived compaction task count.
"""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from kafka_connect_tablestore_spark.config import (
    DeleteMode,
    RuntimeErrorTolerance,
    SinkConfig,
)
from kafka_connect_tablestore_spark.engine import CdcEngine
from kafka_connect_tablestore_spark.operators.multimodal import (
    image_dims_from_header,
    image_format_and_dims,
    mp4_metadata_from_header,
)
from kafka_connect_tablestore_spark.operators.rowchange import ToleranceError
from kafka_connect_tablestore_spark.sources.synth import synth_changelog


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def test_mvhd_version1_offsets():
    """64-bit mvhd (v1): timescale at +20, duration(8) at +24 — the
    v0-relative offsets read modification-time bytes as the timescale."""
    v1_body = (
        b"\x01\x00\x00\x00"  # version 1 + flags
        + struct.pack(">Q", 3_700_000_000)  # creation (post-2038 epoch)
        + struct.pack(">Q", 3_700_000_100)  # modification
        + struct.pack(">I", 600)  # timescale
        + struct.pack(">Q", 6000)  # duration -> 10.0 s
    )
    moov = _box(b"moov", _box(b"mvhd", v1_body))
    raw = _box(b"ftyp", b"isom") + moov
    meta = mp4_metadata_from_header(raw)
    assert meta["timescale"] == 600 and meta["duration_s"] == 10.0


def test_bmp_core_header_dims():
    """OS/2 BITMAPCOREHEADER: unsigned 16-bit dims — previously fused into
    one 32-bit read (100x100 came out as 6553700)."""
    core = (
        b"BM"
        + struct.pack("<IHHI", 26 + 4, 0, 0, 26)
        + struct.pack("<I", 12)  # header size 12 = core header
        + struct.pack("<HHHH", 100, 100, 1, 24)
    )
    assert image_dims_from_header(core) == (100, 100)
    # the modern 40-byte header still parses as before
    info = (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", 640, -480)  # top-down DIB
    )
    assert image_dims_from_header(info) == (640, 480)


def test_jpeg_fill_bytes_before_marker():
    """Spec-legal 0xFF padding before a marker must not derail the walk."""
    sof = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", 50, 100) + b"\x03" + b"\x00" * 9
    raw = b"\xff\xd8" + b"\xff\xff\xff" + sof + b"\xff\xd9"
    assert image_dims_from_header(raw) == (100, 50)


def test_image_format_and_dims_agree():
    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR" + struct.pack(">II", 64, 32) + b"\x00" * 5
    fmt, dims = image_format_and_dims(png)
    assert fmt == "png" and dims == (64, 32)
    assert image_format_and_dims(b"garbage") == (None, None)


def test_tolerance_none_single_stats_pass_still_aborts(spark, tmp_path):
    """The gate rides the combined stats pass (no extra clean-batch scan)
    and still aborts before any commit when errants exist."""
    cfg = SinkConfig(
        delete_mode=DeleteMode.ROW,
        tolerance=RuntimeErrorTolerance.NONE,
        lineage_per_partition=True,
    )
    eng = CdcEngine(spark, cfg, str(tmp_path))
    good = synth_changelog(spark, 500, seed=3)
    m = eng.apply_batch(good, "b-0")  # clean batch commits
    assert not m["skipped"]
    bad = good.limit(20).withColumn("op", F.lit("bogus"))
    with pytest.raises(ToleranceError):
        eng.apply_batch(good.unionByName(bad), "b-1")
    assert "b-1" not in eng.table.committed_batches()


def test_hive_partition_count(tmp_path):
    import os

    from kafka_connect_tablestore_spark.operators.index_maint import (
        _hive_partition_count,
    )

    base = str(tmp_path / "idx")
    for b in (0, 1):
        for c in (3, 5, 9):
            os.makedirs(os.path.join(base, f"batch_id={b}", f"cell={c}"))
    assert _hive_partition_count(base, ["batch_id", "cell"]) == 6
    assert _hive_partition_count(base, ["batch_id"]) == 2
