"""Multimodal column conventions + processing plumbing.

Images / audio / video ride as opaque ``binary`` payload columns with a
typed metadata struct.  The Spark-side plumbing — schemas, Arrow-batched
mapInPandas pipelines, partitioning by media size — is real and tested;
the actual byte decoding is STUBBED (no image/audio libraries in this
environment): ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected, which derives a small fake pixel
tensor from a content hash so downstream plumbing (batching, schema,
feature shapes) is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Envelope for a media row: id + modality + raw bytes + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("source_uri", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_columns(
    df: DataFrame, payload_col: str, modality: str, id_col: str
) -> DataFrame:
    """Normalize an arbitrary table into the MEDIA_SCHEMA envelope."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("source_uri"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    STUB: real decoding needs an image library not present in this
    container.  ``fake=True`` selects the deterministic fake decoder
    (content-hash-seeded 8x8x3 tensor) used to exercise the pipeline.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not available here; "
            "use fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_note: str | None = None
) -> DataFrame:
    """mapInPandas feature extraction over media payloads.

    The pipeline shape is the production one — Arrow batches in, one
    feature row per media item out, decode isolated per item so one bad
    payload doesn't kill the batch — only the decoder itself is fake.
    At scale: repartition upstream by size so batches are byte-balanced,
    and keep features narrow (the payload column is dropped before any
    further shuffle).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "feature": [], "n_bytes": []}
            for _, row in pdf.iterrows():
                payload = row["payload"] if row["payload"] is not None else b""
                try:
                    pixels = decode_image(bytes(payload), fake=fake_decode)
                    feat = (
                        pixels.astype(np.float32).mean(axis=(0, 1)) / 255.0
                    )  # 3-dim channel-mean embedding
                except NotImplementedError:
                    feat = np.zeros(3, dtype=np.float32)
                out["media_id"].append(row["media_id"])
                out["modality"].append(row["modality"])
                out["feature"].append(feat.tolist())
                out["n_bytes"].append(len(payload))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, height: int = 4, width: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Decode → resize → re-encode pipeline shape.

    Resizing uses simple block-mean pooling over the (fake-)decoded pixel
    tensor; output carries the resized tensor flattened to bytes plus the
    new dimensions in the metadata struct.  Only the decoder is stubbed —
    batching, schema, and the binary-out path are production-shaped.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for _, row in pdf.iterrows():
                pixels = decode_image(bytes(row["payload"] or b""), fake=fake_decode)
                h0, w0, c = pixels.shape
                bh, bw = max(1, h0 // height), max(1, w0 // width)
                resized = (
                    pixels[: bh * height, : bw * width]
                    .reshape(height, bh, width, bw, c)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                out["media_id"].append(row["media_id"])
                out["payload"].append(resized.tobytes())
                out["width"].append(width)
                out["height"].append(height)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=schema)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, fake_decode: bool = True
) -> DataFrame:
    """Video → frame rows (media_id, frame_idx, ts_ms, feature).

    Frame extraction is faked (duration-derived count, hash-derived
    frames); the 1→N mapInPandas row-generation shape is the real one.
    """
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "feature": []}
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"] or b"")
                meta = row["meta"]
                duration = (meta or {}).get("duration_ms") or 3000
                n_frames = max(1, int(duration // every_ms))
                for i in range(n_frames):
                    pixels = decode_image(payload + i.to_bytes(4, "big"), fake=fake_decode)
                    feat = pixels.astype(np.float32).mean(axis=(0, 1)) / 255.0
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["feature"].append(feat.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=schema)
