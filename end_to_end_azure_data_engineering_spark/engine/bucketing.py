"""Bucketed table layout — shuffle-free co-located joins (SURVEY §4).

The reference repeats the same account/customer-keyed joins every silver→
gold refresh and pays the join shuffle each time. Bucketing moves that
shuffle to WRITE time, once: both sides persisted with `bucketBy(N, key)`
hash-partition their files identically, so every subsequent equi-join on
the key sort-merges bucket-to-bucket with ZERO Exchange in the plan —
the layout upgrade that matters most at 100 TB, where a fact-fact join's
shuffle IS the job cost.

Bucketed tables live in the session catalog (`saveAsTable`; path tables
cannot carry bucket metadata). Bucket counts must match across join sides
— pick one N per key domain and reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet catalog table bucketed (and by default
    sorted) on ``key``. Sorting within buckets lets the sort-merge join
    skip its Sort as well — the scan is join-ready as stored."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
