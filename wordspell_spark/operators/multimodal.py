"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction are Arrow-batched pandas
UDFs over ``mapInPandas``.  The actual codec step is STUBBED (no
image/audio libraries in this container) with a clearly-marked
deterministic fake, but everything Spark-side — schema, batch shape,
partitioning, UDF signature — is real and tested.

At 100 TB the rule is: never shuffle the binary column.  All derivations
here are row-local (mapInPandas, no groupBy touches ``payload``); any
downstream join moves only (doc_id, features).
"""

from __future__ import annotations

import hashlib
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


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB decode — deterministic fake in place of a real image decoder.

    A real deployment replaces this with PIL/libvips/ffmpeg inside the same
    mapInPandas batch loop; raising NotImplementedError here would break the
    plumbing tests, so we derive (width, height, format) from the payload
    md5 instead.  DuckDB-reproducible: md5 of the payload bytes.
    """
    h = hashlib.md5(payload).hexdigest()
    width = int(h[:4], 16) % 1920 + 1
    height = int(h[4:8], 16) % 1080 + 1
    fmt = ["jpeg", "png", "webp"][int(h[8:10], 16) % 3]
    return width, height, fmt


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
            meta = [_fake_decode(p) for p in payloads]
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
                w, h, _ = _fake_decode(payload)
                scale = min(target_w / w, target_h / h, 1.0)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                fake = hashlib.md5(b"resize|%d|%d|" % (nw, nh) + payload).digest()
                rows.append((doc_id, nw, nh, fake))
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
