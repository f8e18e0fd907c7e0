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

from . import load, register

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

    d = load(spark, sf_dir, "documents")
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
