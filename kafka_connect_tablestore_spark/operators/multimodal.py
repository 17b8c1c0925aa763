"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side contract is fully real — schema, partitioning, UDF signature,
Arrow batch shape, output typing — while the codec step itself is STUBBED
(image/audio libraries are not in this container): ``decode_image_batch``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (dimensions/features derived from the byte
content) stands in so the pipeline is testable end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches (``spark.sql.execution
.arrow.maxRecordsPerBatch``) so executor memory is bounded by batch size, not
partition size — essential when rows carry multi-MB blobs.  Blob tables
should be written with small row groups and the metadata columns first, so
metadata-only queries never deserialize the binary column (parquet column
pruning)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("payload_sha256", T.StringType()),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.sha2(F.concat(F.lit(seed), F.col("id")), 256)).cast("long").alias("n_bytes"),
        F.sha2(F.concat(F.lit(seed), F.col("id")), 256).cast("binary").alias("payload"),
    )


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def decode_and_featurize(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode blobs and extract features via ``mapInPandas``.

    Three paths, probed at plan-construction time (driver side — a missing
    codec should fail the plan, not a mid-job executor task):

    - ``fake=True``: deterministic stand-in decoder (dims/features from the
      payload digest) — keeps the distributed plumbing tested where no
      codec library exists.
    - ``fake=False`` and PIL importable: REAL pixel decode — ``Image.open``
      per blob, true dimensions, and an 8-bin normalized grayscale
      histogram as the feature vector (deterministic for a given payload).
      Undecodable payloads yield null dims/feature (errant contract).
    - ``fake=False`` without PIL: ``NotImplementedError`` (audio/video
      additionally need torchaudio/ffmpeg, not probed here).
    """
    if not fake and not _pil_available():
        raise NotImplementedError(
            "real media decode needs PIL (pixel path) / torchaudio / ffmpeg; "
            "none importable — run with fake=True in this environment"
        )
    use_pil = not fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # self-contained closure: no module-global references, so cloudpickle
        # ships it by value and workers need no access to this package
        # (required when the driver script runs outside the repo without
        # --py-files)
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        if use_pil:
            # re-probed EXECUTOR-side: the driver's plan-time probe only
            # proves PIL exists in the driver venv; on a heterogeneous
            # cluster the executor image may lack it, and a bare import
            # here would fail the job through opaque task retries
            try:
                from PIL import Image as _Image
            except ImportError as e:
                raise RuntimeError(
                    "PIL is importable on the driver but not on this "
                    "executor — install Pillow in the executor image or "
                    "call decode_and_featurize(fake=True)"
                ) from e

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = b"" if payload is None else bytes(payload)
                sha = _hl.sha256(raw).hexdigest()
                if use_pil:
                    width = height = feature = None
                    if kind == "image":
                        try:
                            img = _Image.open(_io.BytesIO(raw))
                            width, height = img.size
                            # 8-bin grayscale histogram, L1-normalized — a
                            # real (if simple) content feature
                            hist = img.convert("L").histogram()  # 256 bins
                            coarse = [sum(hist[i * 32 : (i + 1) * 32]) for i in range(8)]
                            total = max(1, sum(coarse))
                            feature = [c / total for c in coarse]
                        except Exception:
                            width = height = feature = None  # errant → nulls
                    rows.append(
                        {
                            "media_id": media_id,
                            "kind": kind,
                            "width": width,
                            "height": height,
                            "feature": feature,
                            "payload_sha256": sha,
                        }
                    )
                else:
                    d = _hl.sha256(raw).digest()
                    rows.append(
                        {
                            "media_id": media_id,
                            "kind": kind,
                            "width": 32 + d[0] % 224,
                            "height": 32 + d[1] % 224,
                            "feature": [b / 255.0 for b in d[2:10]],
                            "payload_sha256": sha,
                        }
                    )
            yield _pd.DataFrame(rows)

    return df.mapInPandas(run, FEATURE_SCHEMA)


def image_dims_from_header(raw: bytes) -> tuple[int, int] | None:
    """REAL (stdlib-only) image dimension extraction from container headers:
    PNG / GIF / BMP / JPEG.  A training pipeline filters by resolution long
    before it can afford a pixel decode — header parsing needs ~30 bytes of
    the blob and no codec library.  Returns ``None`` for unrecognized or
    truncated payloads (caller routes those to the errant path)."""
    import struct

    if len(raw) >= 24 and raw[:8] == b"\x89PNG\r\n\x1a\n" and raw[12:16] == b"IHDR":
        w, h = struct.unpack(">II", raw[16:24])
        return int(w), int(h)
    if len(raw) >= 10 and raw[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", raw[6:10])
        return int(w), int(h)
    if len(raw) >= 26 and raw[:2] == b"BM":
        (hdr_size,) = struct.unpack("<I", raw[14:18])
        if hdr_size >= 40:  # BITMAPINFOHEADER and successors: 32-bit dims
            w, h = struct.unpack("<ii", raw[18:26])
            return int(w), int(abs(h))  # negative height = top-down DIB
        if hdr_size == 12 and len(raw) >= 22:
            # OS/2 BITMAPCOREHEADER: UNSIGNED 16-bit dims — fusing them
            # into one 32-bit read returned garbage (w + h*65536)
            w16, h16 = struct.unpack("<HH", raw[18:22])
            return int(w16), int(h16)
        return None
    if len(raw) >= 4 and raw[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(raw):
            if raw[i] != 0xFF:
                return None
            marker = raw[i + 1]
            if marker == 0xFF:
                # spec B.1.1.2: any number of 0xFF fill bytes may precede a
                # marker — treating the fill as a segment misparsed valid
                # files into a bogus skip and lost their dimensions
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker in (0xD9, 0xDA):
                # EOI / start-of-scan: dimensions must appear before the
                # entropy-coded data; nothing more to parse
                return None
            seg_len = struct.unpack(">H", raw[i + 2 : i + 4])[0]
            # SOF0/1/2 (baseline/extended/progressive): height, width
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", raw[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
    return None


def image_format_and_dims(raw: bytes) -> tuple[str | None, tuple[int, int] | None]:
    """ONE magic-byte sniff + header parse for the image family — the
    format list and the dimension parsers cannot drift apart (a format
    sniffed here is exactly a format ``image_dims_from_header`` knows)."""
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        fmt = "png"
    elif raw[:6] in (b"GIF87a", b"GIF89a"):
        fmt = "gif"
    elif raw[:2] == b"BM":
        fmt = "bmp"
    elif raw[:2] == b"\xff\xd8":
        fmt = "jpeg"
    else:
        fmt = None
    return fmt, image_dims_from_header(raw) if fmt else None


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_image_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header parse over the blob column: format sniff +
    dimensions, no codec library and no full decode (reads the first bytes
    of each payload; parquet row-group pruning keeps untouched columns
    unread).  Unrecognized payloads yield nulls — the S14-style errant
    contract for media."""

    # NOTE distribution contract: this closure calls the module-level
    # parsers (image_format_and_dims), so executors need the package on
    # their python path (spark-submit --py-files), same as every other
    # operator here; only decode_and_featurize's closure is deliberately
    # self-contained.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    # NULL blob = unrecognized payload: null metadata, not a
                    # job-failing TypeError (documented errant contract)
                    rows.append(
                        {
                            "media_id": media_id,
                            "format": None,
                            "width": None,
                            "height": None,
                            "n_bytes": 0,
                        }
                    )
                    continue
                raw = bytes(payload)
                fmt, dims = image_format_and_dims(raw)
                rows.append(
                    {
                        "media_id": media_id,
                        "format": fmt,
                        "width": dims[0] if dims else None,
                        "height": dims[1] if dims else None,
                        "n_bytes": len(raw),
                    }
                )
            yield _pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_META_SCHEMA)


def wav_metadata_from_header(raw: bytes) -> dict | None:
    """REAL (stdlib-only) WAV metadata from the RIFF container: walks the
    chunk list for ``fmt `` (codec, channels, sample rate, bit depth) and
    ``data`` (payload size → duration).  The audio analogue of
    :func:`image_dims_from_header` — a pipeline filters by sample rate /
    duration long before it can afford a codec decode.  Returns ``None``
    for non-RIFF/WAVE or truncated payloads."""
    import struct

    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    meta: dict = {}
    i = 12
    while i + 8 <= len(raw):
        cid = raw[i : i + 4]
        (size,) = struct.unpack("<I", raw[i + 4 : i + 8])
        body = raw[i + 8 : i + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt, ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            meta.update(
                audio_format=fmt,
                channels=ch,
                sample_rate=rate,
                bits_per_sample=bits,
            )
        elif cid == b"data":
            meta["data_bytes"] = size
        i += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if "sample_rate" not in meta:
        return None
    if "data_bytes" in meta and meta["channels"] and meta["bits_per_sample"]:
        bytes_per_s = (
            meta["sample_rate"] * meta["channels"] * meta["bits_per_sample"] // 8
        )
        if bytes_per_s:
            meta["duration_s"] = meta["data_bytes"] / bytes_per_s
    return meta


def mp4_metadata_from_header(raw: bytes) -> dict | None:
    """REAL (stdlib-only) MP4/ISO-BMFF metadata: walks the top-level box
    tree for ``moov`` → ``mvhd`` (timescale + duration) and every
    ``trak`` → ``tkhd`` (16.16 fixed-point width/height — the video track
    carries nonzero dims).  Returns ``None`` unless a valid ``ftyp`` box
    leads and a ``moov``/``mvhd`` is present."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            (size,) = struct.unpack(">I", buf[i : i + 4])
            btype = buf[i + 4 : i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
                hdr = 16
            elif size == 0:
                # ISO-BMFF: size 0 means "extends to the end of the file"
                # (common for a final mdat); a moov AFTER such a box can't
                # exist, but the walk must still surface this box rather
                # than abort — and at nested levels it spans to `end`.
                size = end - i
                hdr = 8
            else:
                hdr = 8
            if size < hdr or i + size > end:
                return
            yield btype, i + hdr, i + size
            i += size

    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    meta: dict = {}
    for btype, b0, b1 in boxes(raw, 0, len(raw)):
        if btype != b"moov":
            continue
        for ctype, c0, c1 in boxes(raw, b0, b1):
            if ctype == b"mvhd" and c1 - c0 >= 20:
                version = raw[c0]
                if version == 1 and c1 - c0 >= 32:
                    # v1 body: version/flags(4) + creation(8) +
                    # modification(8) -> timescale at +20, duration(8) at
                    # +24 (the v0-relative offsets read modification-time
                    # bytes as the timescale)
                    (tscale,) = struct.unpack(">I", raw[c0 + 20 : c0 + 24])
                    (dur,) = struct.unpack(">Q", raw[c0 + 24 : c0 + 32])
                else:
                    tscale, dur = struct.unpack(">II", raw[c0 + 12 : c0 + 20])
                meta["timescale"] = tscale
                if tscale:
                    meta["duration_s"] = dur / tscale
            elif ctype == b"trak":
                for ttype, t0, t1 in boxes(raw, c0, c1):
                    if ttype == b"tkhd" and t1 - t0 >= 84:
                        # width/height are the LAST 8 bytes of tkhd,
                        # 16.16 fixed point (same offset for v0/v1)
                        w, h = struct.unpack(">II", raw[t1 - 8 : t1])
                        if w and h:
                            meta["width"] = w >> 16
                            meta["height"] = h >> 16
    return meta if "timescale" in meta else None


AV_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),      # wav | mp4 | null
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_av_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched REAL header parse for audio/video blobs (WAV + MP4),
    closing the metadata tier the image-header parse covers for stills:
    sample rate / channels / bit depth / duration for WAV, track dims /
    duration for MP4 — no codec library, first-bytes-only reads.
    Unrecognized payloads yield nulls (the S14 errant contract); the
    actual sample/frame DECODE stays gated on torchaudio/ffmpeg
    (absent in this container — see :func:`decode_and_featurize`)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # references the module-level parsers (same distribution contract
        # as extract_image_metadata: package importable on executors —
        # --py-files on a cluster, sys.path locally)
        import pandas as _pd

        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = b"" if payload is None else bytes(payload)
                base = {
                    "media_id": media_id,
                    "format": None,
                    "sample_rate": None,
                    "channels": None,
                    "bits_per_sample": None,
                    "width": None,
                    "height": None,
                    "duration_s": None,
                    "n_bytes": len(raw),
                }
                wav = wav_metadata_from_header(raw)
                if wav is not None:
                    base.update(
                        format="wav",
                        sample_rate=wav.get("sample_rate"),
                        channels=wav.get("channels"),
                        bits_per_sample=wav.get("bits_per_sample"),
                        duration_s=wav.get("duration_s"),
                    )
                else:
                    mp4 = mp4_metadata_from_header(raw)
                    if mp4 is not None:
                        base.update(
                            format="mp4",
                            width=mp4.get("width"),
                            height=mp4.get("height"),
                            duration_s=mp4.get("duration_s"),
                        )
                rows.append(base)
            yield _pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, AV_META_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: the distributed shape (explode frame
    indices per blob, then per-frame decode) with the codec stubbed — frame
    count is derived from metadata, not a real container parse."""
    n_frames = (F.col("n_bytes") % 100 + 1).cast("int")
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
