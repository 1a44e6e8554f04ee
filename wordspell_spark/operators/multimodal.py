"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction are Arrow-batched pandas
UDFs over ``mapInPandas``.

Decode is tiered (``_decode``):

1. **Real container parsing** — ``decode_image_header`` reads the actual
   bytes of PNG / JPEG / GIF / BMP / WEBP headers (pure ``struct``, no
   image libraries needed) and returns true (width, height, format).
2. **PIL, feature-detected** — if Pillow is importable, unrecognized
   containers fall through to a full decoder (and ``resize_images`` /
   ``image_features`` operate on real pixels).
3. **Deterministic fake** — synthetic payloads that are not images (e.g.
   the text-derived fixture corpus) get the clearly-marked md5-derived
   stand-in, so plumbing stays testable in codec-less containers.

At 100 TB the rule is: never shuffle the binary column.  All derivations
here are row-local (mapInPandas, no groupBy touches ``payload``); any
downstream join moves only (doc_id, features).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

try:  # feature detection: Pillow is optional everywhere
    from PIL import Image as _PIL_Image  # pragma: no cover

    HAVE_PIL = True
except ImportError:
    _PIL_Image = None
    HAVE_PIL = False

METADATA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("features", ArrayType(FloatType(), False)),
    ]
)


def attach_binary(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the payload.

    In production this column comes straight from the lakehouse scan
    (Parquet/Iceberg BINARY); the engine never re-encodes it.
    """
    return docs.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def decode_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """REAL image metadata decode from container bytes — no codec library.

    Parses the actual binary headers of the common web formats:

    * PNG  — IHDR chunk, big-endian u32 width/height at offset 16
    * JPEG — walks marker segments to the first SOF0/1/2 frame header
    * GIF  — logical screen descriptor, little-endian u16 at offset 6
    * BMP  — BITMAPINFOHEADER, little-endian i32 at offset 18
    * WEBP — RIFF container: VP8X canvas, VP8L stream bits, or VP8 frame tag

    Returns (width, height, format) or None if the payload is not a
    recognized image container.
    """
    n = len(payload)
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, "gif"
    if n >= 26 and payload[:2] == b"BM":
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40:
            w, h = struct.unpack("<ii", payload[18:26])
            return w, abs(h), "bmp"  # negative height = top-down rows
    if n >= 16 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        chunk = payload[12:16]
        if chunk == b"VP8X" and n >= 30:
            # 24-bit little-endian canvas size minus one, at offset 24
            w = int.from_bytes(payload[24:27], "little") + 1
            h = int.from_bytes(payload[27:30], "little") + 1
            return w, h, "webp"
        if chunk == b"VP8L" and n >= 25 and payload[20] == 0x2F:
            bits = int.from_bytes(payload[21:25], "little")
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "webp"
        if chunk == b"VP8 " and n >= 30 and payload[23:26] == b"\x9d\x01\x2a":
            w, h = struct.unpack("<HH", payload[26:30])
            return w & 0x3FFF, h & 0x3FFF, "webp"
    if n >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 frame header
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return w, h, "jpeg"
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # no length field
                i += 2
                continue
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode — deterministic fake for payloads that are NOT real image
    containers (the synthetic text-derived fixtures).  Clearly marked; real
    bytes never reach this (see ``_decode``).  DuckDB-reproducible: md5 of
    the payload bytes."""
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:4], 16) % 1920 + 1
    height = int(h[4:8], 16) % 1080 + 1
    fmt = ["jpeg", "png", "webp"][int(h[8:10], 16) % 3]
    return width, height, fmt


def _decode(payload: bytes) -> tuple[int, int, str]:
    """Tiered decode: real header parse → PIL (if importable) → fake."""
    real = decode_image_header(payload)
    if real is not None:
        return real
    if HAVE_PIL:  # pragma: no cover — Pillow absent in the CI container
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return im.width, im.height, (im.format or "unknown").lower()
        except Exception:  # noqa: BLE001 — not an image PIL knows
            pass
    return _fake_decode(payload)


def make_png(width: int, height: int) -> bytes:
    """Build a REAL, fully valid 8-bit grayscale PNG of the given size
    (IHDR + zlib IDAT + IEND, correct CRCs) — pure stdlib.  Used by tests
    and the ``multimodal_real_decode`` contract query to prove the header
    parser runs against actual container bytes."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes([i % 256] * width) for i in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB feature extractor: md5-seeded unit vector (real models plug in
    here as Arrow-batched inference)."""
    h = hashlib.md5(b"feat|" + payload).digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def decode_metadata(binary_df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Binary payloads → typed metadata + feature vector, Arrow-batched.

    One mapInPandas pass; the payload column is dropped on output so nothing
    downstream ever shuffles bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads = pdf[payload_col].to_list()
            meta = [_decode(p) for p in payloads]
            feats = [_fake_features(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "n_bytes": np.array([len(p) for p in payloads], dtype=np.int32),
                    "width": np.array([m[0] for m in meta], dtype=np.int32),
                    "height": np.array([m[1] for m in meta], dtype=np.int32),
                    "format": [m[2] for m in meta],
                    "features": feats,
                }
            )

    return binary_df.mapInPandas(run, schema=METADATA_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    binary_df: DataFrame,
    target_w: int = 256,
    target_h: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stub: clamps the fake-decoded dims to the target box (aspect
    preserved) and re-emits a deterministic payload.  A real deployment
    swaps the body for PIL/libvips; the Spark contract — row-local
    mapInPandas, binary in/binary out, no shuffle — is the tested part."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, _ = _decode(payload)
                scale = min(target_w / w, target_h / h, 1.0)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                if HAVE_PIL and decode_image_header(payload) is not None:
                    import io  # pragma: no cover — real-pixel path, PIL-gated

                    with _PIL_Image.open(io.BytesIO(payload)) as im:
                        buf = io.BytesIO()
                        im.resize((nw, nh)).save(buf, format=im.format or "PNG")
                        out_bytes = buf.getvalue()
                else:
                    out_bytes = hashlib.md5(b"resize|%d|%d|" % (nw, nh) + payload).digest()
                rows.append((doc_id, nw, nh, out_bytes))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return binary_df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    binary_df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stub: treats the payload as a fake video and emits
    n_frames deterministic frame payloads per row (uniform temporal
    sampling in a real decoder).  Output explodes 1→n_frames rows — the
    fan-out shape downstream feature extraction consumes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i in range(n_frames):
                    rows.append((doc_id, i, hashlib.md5(b"frame|%d|" % i + payload).digest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame"])

    return binary_df.mapInPandas(run, schema=FRAMES_SCHEMA)


def multimodal_metadata(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """End-to-end: attach payload → decode → metadata table (no features,
    so the result is exactly DuckDB-oracle-checkable via md5)."""
    meta = decode_metadata(attach_binary(docs, text_col, id_col))
    return meta.select("doc_id", "n_bytes", "width", "height", "format")
