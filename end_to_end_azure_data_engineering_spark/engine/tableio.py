"""Parquet-backed warehouse catalog.

The reference stores silver/gold as external Delta tables
(4_silver/silver_transactions.py:50-51). This build has no Delta jar, so
tables are parquet directories under a warehouse root with
write-new-then-swap semantics (atomic enough for single-writer pipelines;
on Delta the same API maps to ACID commits — noted per method).

Namespaces mirror the medallion: bronze/silver/gold/audit.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, namespace: str, table: str) -> Path:
        return self.root / namespace / table

    def exists(self, namespace: str, table: str) -> bool:
        p = self.path(namespace, table)
        return p.exists() and any(p.iterdir())

    def read(self, namespace: str, table: str) -> DataFrame:
        return self.spark.read.parquet(str(self.path(namespace, table)))

    def overwrite(self, df: DataFrame, namespace: str, table: str) -> int:
        """Write-new-then-swap (Delta: single atomic overwrite commit).

        Reads of the old data complete against already-open files; the swap
        is a directory rename. Returns rows written.
        """
        final = self.path(namespace, table)
        tmp = final.parent / f".{table}.tmp.{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(tmp))
        n = self.spark.read.parquet(str(tmp)).count()
        if final.exists():
            shutil.rmtree(final)
        tmp.rename(final)
        return n

    def append(self, df: DataFrame, namespace: str, table: str) -> None:
        """Plain append (Delta: ACID append commit)."""
        df.write.mode("append").parquet(str(self.path(namespace, table)))

    def drop(self, namespace: str, table: str) -> None:
        p = self.path(namespace, table)
        if p.exists():
            shutil.rmtree(p)
