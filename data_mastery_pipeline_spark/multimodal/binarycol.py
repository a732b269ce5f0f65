"""Multimodal binary-column operators.

Data model: one ``binary`` payload column + a typed metadata struct
(media_type, byte size, content hash). Heavy per-item work (decode,
resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` — bytes never round-trip through Python row-at-a-time,
and each task processes a partition's batches independently, so the
operators scale with executors and are skew-safe (payload size bounded
per batch by maxRecordsPerBatch).

Decoders are STUBS: the container ships no image/audio codecs, so
``decode_image_batch`` raises NotImplementedError unless
``fake_decoder=True`` gives a deterministic fake (dims derived from the
content hash). The Spark-side contract — schemas, batch iteration,
column pruning of the binary payload — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct for any media payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", media_type: str = "text/plain") -> DataFrame:
    """Materialize a binary payload column + metadata struct from a text
    column (testdata carries no real media; the binary-column plumbing is
    identical for image/audio bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_image_batch(pdf: pd.DataFrame, fake_decoder: bool) -> pd.DataFrame:
    """Per-batch image decode → (doc_id, width, height, n_channels).

    Real implementation would call PIL/libvips on ``payload`` bytes;
    neither ships in this container, so without ``fake_decoder`` this
    raises. The fake derives deterministic dims from payload length so
    the distributed plumbing is testable end-to-end.
    """
    if not fake_decoder:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake_decoder=True for the deterministic stub"
        )
    n = pdf["payload"].str.len()
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "width": (n % 640 + 16).astype("int32"),
            "height": (n % 480 + 16).astype("int32"),
            "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
        }
    )


def extract_image_features(df: DataFrame, fake_decoder: bool = True) -> DataFrame:
    """Distributed decode/feature-extract over the binary column via
    Arrow-batched mapInPandas. Selects only (doc_id, payload) first so
    the scan prunes every other column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake_decoder)

    return df.select("doc_id", "payload").mapInPandas(run, schema=IMAGE_FEATURES)


RESIZED_IMAGE = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def resize_image_batch(pdf: pd.DataFrame, target: int, fake_decoder: bool) -> pd.DataFrame:
    """Per-batch decode + aspect-preserving resize to fit a target box
    (the standard vision-model preprocessing step). Real implementation:
    PIL.thumbnail / cv2.resize on decoded pixels; here the geometry is
    real and the pixel work is the stubbed decode."""
    decoded = decode_image_batch(pdf, fake_decoder)
    w = decoded["width"].astype("float64")
    h = decoded["height"].astype("float64")
    scale = (target / w).combine(target / h, min).clip(upper=1.0)
    return pd.DataFrame(
        {
            "doc_id": decoded["doc_id"],
            "width": decoded["width"],
            "height": decoded["height"],
            "out_width": (w * scale).astype("int64").astype("int32"),
            "out_height": (h * scale).astype("int64").astype("int32"),
            "scale": scale,
        }
    )


def resize_images(df: DataFrame, target: int = 224, fake_decoder: bool = True) -> DataFrame:
    """Distributed decode+resize over the binary column (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resize_image_batch(pdf, target, fake_decoder)

    return df.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_IMAGE)


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def decode_audio_batch(pdf: pd.DataFrame, fake_decoder: bool) -> pd.DataFrame:
    """Per-batch audio decode → (doc_id, sample_rate, duration, samples).

    Real implementation would demux/decode with soundfile/ffmpeg —
    neither ships here, so without ``fake_decoder`` this raises. The
    fake derives duration from payload length (SQL-mirrorable, so the
    contract query is oracle-checked end-to-end)."""
    if not fake_decoder:
        raise NotImplementedError(
            "audio codecs not available in this environment; "
            "pass fake_decoder=True for the deterministic stub"
        )
    n = pdf["payload"].str.len()
    rate = 16_000
    deci = (n % 600).astype("int64")  # tenths of a second
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "sample_rate": pd.Series([rate] * len(pdf), dtype="int32"),
            "duration_s": deci.astype("float64") / 10.0,
            # integer arithmetic (deci * rate/10) — float duration*rate
            # truncates vs rounds differently across engines
            "n_samples": deci * (rate // 10),
        }
    )


def extract_audio_features(df: DataFrame, fake_decoder: bool = True) -> DataFrame:
    """Arrow-batched mapInPandas over the binary column — identical
    plumbing to image decode; only the codec differs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_audio_batch(pdf, fake_decoder)

    return df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_FEATURES)


def frame_sample_plan(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx) rows for
    frames 0, n, 2n… based on a fake frame count derived from payload
    size (real impl: container demux). Shows the explode-style fan-out
    shape a video pipeline needs (one row in → many frames out)."""
    n_frames = (F.octet_length("payload") % 300 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))
    return df.select("doc_id", F.explode(idx).alias("frame_idx"))
