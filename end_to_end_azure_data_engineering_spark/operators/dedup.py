"""Keyed dedup operators — SURVEY §2.4 A3/A5, §2.5 W1.

``keep_latest`` is the reference's batch dedup (row_number over
partitionBy(business_key) orderBy(recency desc_nulls_last) == 1;
4_silver/silver_transactions.py:106-116). It is also the mandatory
pre-MERGE compaction (Delta MERGE forbids duplicate source matches).

Deterministic by construction: callers supply a total order (append a
unique tiebreak column). One shuffle on the key — at scale this
partitioning is reused by the downstream merge join.

``distinct_by_key`` reproduces A5 (dropDuplicates([key]); arbitrary
survivor) — kept for parity, but engine code paths use keep_latest, the
deviation SURVEY §2.4 documents for silver_fx_rates.py:67-68.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def keep_latest(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_by_recency(df: DataFrame, keys: list[str], recency_cols: list[str]) -> DataFrame:
    """W1 with the reference's desc_nulls_last recency ordering."""
    return keep_latest(df, keys, [F.col(c).desc_nulls_last() for c in recency_cols])


def distinct_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.dropDuplicates(keys)
