"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with Arrow-batched (mapInPandas) decode/feature-extract.

The container has no image/audio codecs, so the decode step is a
clearly-marked STUB: ``decode_features`` computes deterministic fake
features from the payload bytes (oracle-checkable arithmetic), and
``decode_real`` raises NotImplementedError naming the codec you'd
plug in. Everything Spark-side — schema, binary column handling,
mapInPandas batch iteration, partitioning — is real and tested.

Scale notes: payloads travel as parquet binary columns; mapInPandas
streams Arrow record batches through pandas without materializing a
partition, so executor memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch regardless of total
size. No shuffle anywhere — decode is a pure map.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_fake_payload(documents: DataFrame) -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload
    with typed metadata — the multimodal column pattern: binary data
    + a metadata struct in the same row."""
    return documents.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
        ).alias("media_meta"),
    )


def _fake_decode(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for a real codec: derive image-like
    dimensions from payload size. Swap for PIL/ffmpeg in production."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int32"),
            "width": (16 + (n_bytes * 7) % 624).astype("int32"),
            "height": (16 + (n_bytes * 13) % 464).astype("int32"),
            "n_frames": (1 + n_bytes % 16).astype("int32"),
        }
    )


def decode_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload
    column. Batches stream through pandas; output schema is fixed
    (FEATURE_SCHEMA) so downstream plans are fully typed."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            out = _fake_decode(n_bytes)
            out.insert(0, "doc_id", pdf["doc_id"].astype("int64"))
            yield out

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema=FEATURE_SCHEMA
    )


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach payload → Arrow-batched decode."""
    return decode_features(attach_fake_payload(documents))


def multimodal_frames(documents: DataFrame) -> DataFrame:
    """Frame sampling plumbing: one row per (pseudo-)video frame with
    its byte offset — composition of the Arrow-batched decode with a
    JVM-side explode. The explode happens AFTER mapInPandas, so frame
    fan-out never inflates the Arrow transfer."""
    feats = multimodal_features(documents)
    return feats.select(
        "doc_id",
        "n_frames",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        # integer division (not /-then-cast: DuckDB casts by rounding,
        # Spark by truncation — div is unambiguous in both)
        F.expr("n_bytes div n_frames").cast("int").alias("frame_stride"),
    ).select(
        "doc_id",
        "frame_idx",
        (F.col("frame_idx") * F.col("frame_stride")).alias("frame_offset"),
    )


def decode_real(with_payload: DataFrame) -> DataFrame:
    """Real image decode: identical Arrow-batched plumbing to
    decode_features, but the per-batch body opens each payload with
    PIL and emits true (width, height) plus n_frames (animated
    formats report their frame count; stills are 1). Gated on PIL
    being importable — this container ships without codecs, so the
    deterministic stub (decode_features) carries the oracle and this
    path raises with instructions until PIL is installed."""
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        raise NotImplementedError(
            "real image decode requires PIL (pip install pillow); this "
            "container has no codecs — use decode_features "
            "(deterministic stub), whose Spark-side plumbing is identical"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in batches:
            widths, heights, frames, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                sizes.append(len(raw))
                with Image.open(io.BytesIO(raw)) as im:
                    widths.append(im.width)
                    heights.append(im.height)
                    frames.append(int(getattr(im, "n_frames", 1)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_frames": pd.Series(frames, dtype="int32"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        decode, schema=FEATURE_SCHEMA
    )


THUMB_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb_width", IntegerType()),
        StructField("thumb_height", IntegerType()),
        StructField("thumb_bytes", BinaryType()),
    ]
)


def resize_thumbnails(with_payload: DataFrame, max_px: int = 64) -> DataFrame:
    """Batch image-resize plumbing: decode dimensions, compute the
    aspect-preserving thumbnail size with INTEGER-only math (floor
    division — unambiguous across engines), and emit a binary
    thumbnail payload. The pixel resample itself is the stubbed codec
    step (thumbnail bytes = a deterministic byte-budget prefix of the
    payload, sized thumb_w*thumb_h*3 — swap `_fake_decode` and the
    slice for PIL in production); the Spark-side shape is the real
    thing: binary in, binary out, fixed schema, Arrow-batched, no
    shuffle, executor memory bounded by the Arrow batch size."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            dims = _fake_decode(n_bytes)
            w = dims["width"].astype("int64")
            h = dims["height"].astype("int64")
            long_side = w.where(w >= h, h)
            # integer aspect-preserving resize, never upscaling
            tw = (w * max_px // long_side).where(long_side > max_px, w)
            th = (h * max_px // long_side).where(long_side > max_px, h)
            tw = tw.clip(lower=1)
            th = th.clip(lower=1)
            budget = (tw * th * 3).astype("int64")
            thumbs = [
                bytes(p[: int(b)]) for p, b in zip(pdf["payload"], budget)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "thumb_width": tw.astype("int32"),
                    "thumb_height": th.astype("int32"),
                    "thumb_bytes": thumbs,
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        resize, schema=THUMB_SCHEMA
    )


def media_dedup(with_payload: DataFrame) -> DataFrame:
    """Exact duplicate groups over the OPAQUE binary payload — the
    multimodal twin of dedup_exact. md5 runs over raw bytes, so it
    needs no codec at all: identical images/audio dedup byte-for-byte
    before any decode is attempted (the cheap first pass every media
    pipeline runs before perceptual hashing). Shuffles (hash, doc_id)
    pairs only; payloads never leave their scan partition."""
    return (
        with_payload.select(
            F.md5("payload").alias("payload_hash"),
            "doc_id",
            F.length("payload").cast("long").alias("__bytes"),
        )
        .groupBy("payload_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            # identical payloads have identical size, so the dedup
            # saving is (copies - 1) x that size
            ((F.count(F.lit(1)) - 1) * F.max("__bytes")).alias("dup_bytes"),
        )
    )
