"""Append-only load patterns — macro-ops M2 (idempotent append) and M3
(full refresh).

M2 (reference: 4_silver/silver_settlements.py:88-113): stage → LEFT ANTI
JOIN target on the business key → insert only absent keys. Re-running the
same batch is a no-op — the idempotence guarantee the reference relies on
for replayed file drops.

M3 (reference: 4_silver/silver_products.py:75-82 et al.): TRUNCATE +
INSERT SELECT ⇒ ``mode("overwrite")`` of the conformed batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def append_if_absent(target: DataFrame, batch: DataFrame, key: str) -> DataFrame:
    """Post-append table state: target ∪ (batch rows whose key is absent).

    On Delta this is `MERGE WHEN NOT MATCHED THEN INSERT`; the anti-join
    below is the identical shuffle. The key join is broadcast-eligible when
    the incoming batch is small relative to the table.
    """
    new_rows = batch.join(target.select(key), on=key, how="left_anti")
    return target.unionByName(new_rows)


def full_refresh(batch: DataFrame) -> DataFrame:
    """M3 — the new table state is exactly the conformed batch."""
    return batch
