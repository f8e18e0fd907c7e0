"""Multimodal-plumbing query for the driver gate.

The testdata has no binary media table, so the query manufactures the
MEDIA_SCHEMA shape from documents (utf-8 payload bytes) — the point is to
exercise the real pipeline: binary column → Arrow batches → mapInPandas
feature extraction → typed output schema. The DuckDB oracle recomputes the
same md5-derived features in SQL (payloads are ascii text, so byte ops and
char ops coincide).
"""

from __future__ import annotations

import pandas as pd
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load, register, spread

_FEAT0 = "('0x' || substr(md5(text), 1, 8))::BIGINT / 4294967295.0"
_FEAT1 = "('0x' || substr(md5(text), 9, 8))::BIGINT / 4294967295.0"


@register(
    "multimodal_features",
    oracle=f"""
    SELECT doc_id AS media_id,
           'text' AS media_type,
           length(text)::BIGINT AS n_bytes,
           md5(text) AS content_hash,
           round({_FEAT0}, 6) AS feat_0,
           round({_FEAT1}, 6) AS feat_1
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction via Arrow-batched mapInPandas —
    the multimodal scale path (narrow map, no shuffle, batch-bounded
    memory). Decode itself is stubbed (functions/multimodal.py); features
    here are the deterministic md5-derived stand-ins."""
    import hashlib

    d = spread(load(spark, sf_dir, "documents"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "content_hash": digests,
                    "feat_0": digests.map(lambda h: round(int(h[:8], 16) / 0xFFFFFFFF, 6)),
                    "feat_1": digests.map(lambda h: round(int(h[8:16], 16) / 0xFFFFFFFF, 6)),
                }
            )

    return media.mapInPandas(
        op,
        schema="media_id long, media_type string, n_bytes long, "
        "content_hash string, feat_0 double, feat_1 double",
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             320 + (doc_id % 8) * 80  AS meta_width,
             240 + (doc_id % 5) * 60  AS meta_height,
             n_chars * 40             AS meta_duration_ms
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT media_id,
           unnest(generate_series(0, greatest(meta_duration_ms - 1, 0), 1000))
               AS frame_ts_ms,
           meta_width, meta_height
    FROM media
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (functions/multimodal.frame_sample_plan):
    sequence+explode fans one video row out to one row per sampled frame
    timestamp — the Catalyst-side half of frame extraction; per-frame decode
    is the stubbed codec step. Metadata is manufactured deterministically
    from documents (no binary media table in the testdata). Narrow fan-out:
    the explode multiplies rows ~duration/interval with no shuffle."""
    from ..functions.multimodal import frame_sample_plan

    d = spread(load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("media_type"),
        (F.lit(320) + (F.col("doc_id") % 8) * 80).cast("int").alias("meta_width"),
        (F.lit(240) + (F.col("doc_id") % 5) * 60).cast("int").alias("meta_height"),
        (F.col("n_chars") * 40).alias("meta_duration_ms"),
    )
    return frame_sample_plan(media, every_ms=1000)


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id,
             320 + (doc_id % 8) * 80 AS meta_width,
             240 + (doc_id % 5) * 60 AS meta_height
      FROM documents
    )
    SELECT media_id, meta_width, meta_height,
           CAST(round(meta_width * scale, 0) AS INTEGER)  AS target_width,
           CAST(round(meta_height * scale, 0) AS INTEGER) AS target_height
    FROM (SELECT *,
                 least(256.0 / greatest(meta_width, meta_height), 1.0) AS scale
          FROM media)
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing: aspect-preserving target dimensions (max side 256,
    never upscaled) computed as pure column math over the typed metadata —
    the planning half of a resize; the pixel work is the stubbed decoder
    inside mapInPandas (multimodal_features shows that path). At scale this
    is a narrow map feeding the Arrow batch resize."""
    d = spread(load(spark, sf_dir, "documents"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(320) + (F.col("doc_id") % 8) * 80).cast("int").alias("meta_width"),
        (F.lit(240) + (F.col("doc_id") % 5) * 60).cast("int").alias("meta_height"),
    )
    scale = F.least(
        F.lit(256.0) / F.greatest("meta_width", "meta_height"), F.lit(1.0)
    )
    return media.select(
        "media_id", "meta_width", "meta_height",
        F.round(F.col("meta_width") * scale, 0).cast("int").alias("target_width"),
        F.round(F.col("meta_height") * scale, 0).cast("int").alias("target_height"),
    )


_PH_BLOCKS = 8


def _phash_bit_sql(k: int) -> str:
    # block k of the (ascii) payload: start = k*(len//8)+1, width = len//8
    w = f"greatest(length(text) // {_PH_BLOCKS}, 1)"
    return (
        f"(('0x' || substr(md5(substr(text, {k} * {w} + 1, {w})), 1, 1))::INT % 2)"
    )


@register(
    "multimodal_phash_dedup",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id AS media_id,
             {" + ".join(f"({_phash_bit_sql(k)} * {1 << k})" for k in range(_PH_BLOCKS))}
                 AS phash
      FROM documents
    )
    SELECT phash,
           count(*) AS n_items,
           min(media_id) AS canonical_media_id
    FROM sigs GROUP BY phash
    """,
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash-style media dedup plumbing: a block signature over
    the binary payload (one bit per payload block, md5-derived here — a
    real pHash/dHash drops in at the same seam) computed in an Arrow
    mapInPandas stage, then signature-bucket grouping with a canonical
    min-id survivor — the image-dedup shape (signature → bucket → verify)
    at training-data scale, where the verify step inside each bucket is
    the near-dup machinery the dedup suite already provides. Payloads are
    ascii text bytes, so the oracle's char-wise replay coincides with the
    byte-wise kernel."""
    import hashlib

    d = spread(load(spark, sf_dir, "documents"))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def phash(b) -> int:
            b = bytes(b)
            w = max(len(b) // _PH_BLOCKS, 1)
            out = 0
            for k in range(_PH_BLOCKS):
                block = b[k * w : (k + 1) * w]
                bit = int(hashlib.md5(block).hexdigest()[0], 16) % 2
                out |= bit << k
            return out

        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": pdf["payload"].map(phash)}
            )

    sigs = media.mapInPandas(sig, "media_id long, phash int")
    return sigs.groupBy("phash").agg(
        F.count("*").alias("n_items"),
        F.min("media_id").alias("canonical_media_id"),
    )


_CHUNK_S = 5   # chunk length, seconds
_STRIDE_S = 4  # hop, seconds (1 s overlap)


@register(
    "multimodal_audio_chunks",
    oracle=f"""
    WITH media AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050
                             ELSE 44100 END AS meta_sample_rate,
             n_chars * 1000 AS meta_n_samples
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT media_id, meta_sample_rate,
           unnest(generate_series(0, greatest(meta_n_samples - 1, 0),
                                  {_STRIDE_S} * meta_sample_rate))
               AS start_sample,
           least(unnest(generate_series(0, greatest(meta_n_samples - 1, 0),
                                        {_STRIDE_S} * meta_sample_rate))
                 + {_CHUNK_S} * meta_sample_rate,
                 meta_n_samples) AS end_sample
    FROM media
    """,
)
def multimodal_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plan — the audio twin of frame sampling: each track
    fans out to fixed 5 s windows with a 4 s hop (1 s overlap, the standard
    ASR/feature-extraction layout), expressed as sequence+explode over the
    typed metadata (sample rate, sample count manufactured from documents —
    no binary audio in the testdata). Narrow fan-out, no shuffle; the
    per-chunk decode is the stubbed codec step behind mapInPandas, exactly
    as in multimodal_features."""
    d = spread(load(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0))
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.lit([16000, 22050, 44100]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("meta_sample_rate"),
        (F.col("n_chars") * 1000).alias("meta_n_samples"),
    )
    stride = F.lit(_STRIDE_S) * F.col("meta_sample_rate")
    chunk = F.lit(_CHUNK_S) * F.col("meta_sample_rate")
    return (
        media.withColumn(
            "start_sample",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.greatest(F.col("meta_n_samples") - 1, F.lit(0)).cast("long"),
                    stride.cast("long"),
                )
            ),
        )
        .select(
            "media_id", "meta_sample_rate", "start_sample",
            F.least(F.col("start_sample") + chunk, F.col("meta_n_samples")).alias(
                "end_sample"
            ),
        )
    )
