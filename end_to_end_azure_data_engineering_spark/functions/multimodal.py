"""Multimodal columns — image/audio/video as opaque `binary` + typed
metadata, processed by Arrow-batched pandas iterators (`mapInPandas`).

The Spark-side plumbing here is real and tested: schema contract, batch
iterator shape, partition-preserving transforms. The actual codec work is
stubbed (this container has no image/audio libraries): `decode_image`
raises NotImplementedError unless a `decoder` is injected, and
`fake_feature_extract` is the deterministic stand-in used by tests —
byte-level stats + md5-derived features that any engine can recompute.

Scale notes: binary payloads ride the columnar format untouched (parquet
binary, no row-group bloat beyond size); feature extraction is a narrow
mapInPandas (no shuffle); Arrow transfers batches zero-copy into pandas.
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds memory per batch for
large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_sample_rate", T.IntegerType()),
        T.StructField("meta_duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, "
    "byte_entropy_proxy double, content_hash string, feat_0 double, feat_1 double"
)

# Schema when a real decoder is injected: decoded dimensions + pixel stats
# join the byte-level features.
FEATURE_SCHEMA_DECODED = (
    FEATURE_SCHEMA + ", decoded_width int, decoded_height int, mean_luma double"
)


def decode_image(payload: bytes, decoder: Callable[[bytes], object] | None = None):
    """Decode an image payload. No codec libs in this build — inject a
    ``decoder`` (e.g. PIL.Image.open on a real cluster, or the in-repo
    dependency-free ``imagecodec.decode_any`` for PPM/BMP payloads)."""
    if decoder is None:
        raise NotImplementedError(
            "image codecs not available in this environment; inject `decoder`"
        )
    return decoder(payload)


def _fake_features(payload: bytes) -> tuple[float, str, float, float]:
    """Deterministic stand-in for codec-derived features."""
    if payload is None:
        payload = b""
    digest = hashlib.md5(payload).hexdigest()
    distinct = len(set(payload))
    entropy_proxy = distinct / 256.0
    f0 = int(digest[:8], 16) / 0xFFFFFFFF
    f1 = int(digest[8:16], 16) / 0xFFFFFFFF
    return entropy_proxy, digest, f0, f1


def extract_features(
    media: DataFrame, decoder: Callable[[bytes], object] | None = None
) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA-shaped input.

    Narrow transformation: each Arrow batch maps 1:1 to an output batch;
    partitioning and ordering of the input are preserved, no shuffle.

    With ``decoder`` injected (any callable returning an object exposing
    ``width``/``height`` and optionally ``mean_luma()`` — PIL.Image fits,
    as does the in-repo ``imagecodec.decode_any``), image rows additionally
    carry real decoded dimensions and mean luma (FEATURE_SCHEMA_DECODED);
    rows the decoder rejects get nulls in the decoded columns. Without a
    decoder, output is byte-level-only (FEATURE_SCHEMA), unchanged.
    """

    def row_features(pdf: pd.DataFrame) -> dict:
        feats = pdf["payload"].map(_fake_features)
        return {
            "media_id": pdf["media_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
            "byte_entropy_proxy": feats.map(lambda t: t[0]),
            "content_hash": feats.map(lambda t: t[1]),
            "feat_0": feats.map(lambda t: t[2]),
            "feat_1": feats.map(lambda t: t[3]),
        }

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(row_features(pdf))

    def op_decoded(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decoded(payload):
            if payload is None:
                return (None, None, None)
            try:
                img = decode_image(bytes(payload), decoder)
            except Exception:
                # broad by design: decode failures are DATA problems
                # (truncated headers raise struct.error, absurd declared
                # dimensions raise before allocation, injected decoders
                # raise whatever they raise) and the contract is
                # rejected-row-gets-nulls — a malformed payload must never
                # abort the job
                return (None, None, None)
            luma = float(img.mean_luma()) if hasattr(img, "mean_luma") else None
            return (int(img.width), int(img.height), luma)

        for pdf in batches:
            cols = row_features(pdf)
            dec = pdf["payload"].map(decoded)
            cols["decoded_width"] = dec.map(lambda t: t[0])
            cols["decoded_height"] = dec.map(lambda t: t[1])
            cols["mean_luma"] = dec.map(lambda t: t[2])
            yield pd.DataFrame(cols)

    if decoder is None:
        return media.mapInPandas(op, schema=FEATURE_SCHEMA)
    return media.mapInPandas(op_decoded, schema=FEATURE_SCHEMA_DECODED)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (sequence + explode — pure Catalyst; the decode of each frame
    is the stubbed step). Demonstrates the fan-out shape without codecs."""
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms", "meta_width", "meta_height")
    )
