"""SCD2 upsert (macro-op M1) — the reference's richest composite.

Reference semantics (4_silver/silver_transactions.py:123-201, two MERGEs):

  MERGE 1 (expire):  ON t.key = s.key AND t.is_current = true
                     WHEN MATCHED AND (t.c1 <> s.c1 OR ... OR t.cN <> s.cN)
                     THEN UPDATE is_current = false, audit_modifieddate = now
  MERGE 2 (insert):  ON t.key = s.key AND t.is_current = true
                     WHEN NOT MATCHED THEN INSERT (..., is_current = true,
                     audit_insertdate = now, audit_modifieddate = now)

Latent semantics we reproduce exactly: ``<>`` is **null-unsafe**, so a
NULL→value or value→NULL transition does NOT expire the current row
(SURVEY §7.3). After merge 1, changed keys have no current row, so merge 2
inserts them; unchanged matched keys keep their current row; brand-new keys
insert. History rows (`is_current = false`) are untouched.

This build has no Delta jar, so the merge is expressed as a declarative
plan producing the *new table state* (history ∪ expire-updated current ∪
inserts) which the caller overwrites atomically. On a Delta-enabled
cluster, `scd2_merge_sql` emits the identical two MERGE statements and the
operator becomes two Delta commands touching only matched files — at
100 TB that, plus hash-partitioning both sides on the key, is the scale
path; the join below is the same shuffle MERGE itself would run.

The source must be pre-deduped per key (keep_latest), matching the
reference's mandatory pre-MERGE compaction.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _any_changed(compare_cols: list[str], src_prefix: str = "_src_") -> Column:
    """Null-unsafe `<>` OR-chain: fires only when both sides non-null and
    different — literal reference semantics (silver_transactions.py:127-143)."""
    cond = F.lit(False)
    for c in compare_cols:
        cond = cond | (F.col(c) != F.col(f"{src_prefix}{c}"))
    return F.coalesce(cond, F.lit(False))


def scd2_merge(
    target: DataFrame,
    source: DataFrame,
    key: str,
    compare_cols: list[str],
    now: _dt.datetime,
) -> DataFrame:
    """Return the post-merge table state (lazy plan; caller persists).

    target: full SCD2 table (payload + is_current, audit_insertdate,
            audit_modifieddate). source: conformed batch, unique per key,
            payload columns only.
    """
    payload = [c for c in source.columns]
    ts = F.lit(now).cast("timestamp")

    hist = target.filter(~F.col("is_current"))
    cur = target.filter(F.col("is_current"))

    src = source.select(
        F.col(key).alias("_src_key"),
        *[F.col(c).alias(f"_src_{c}") for c in payload if c != key],
    )

    # one equi-join on the key serves both MERGE passes
    j = cur.join(src, cur[key] == src["_src_key"], "left")
    changed = F.col("_src_key").isNotNull() & _any_changed(
        [c for c in compare_cols if c != key]
    )

    expired = (
        j.filter(changed)
        .select(*[F.col(c) for c in target.columns])
        .withColumn("is_current", F.lit(False))
        .withColumn("audit_modifieddate", ts)
    )
    kept_current = j.filter(~changed).select(*[F.col(c) for c in target.columns])

    # keys still holding a current row after the expire pass don't re-insert
    surviving = j.filter(~changed & F.col("_src_key").isNotNull()).select(
        F.col(key).alias("_kept_key")
    )
    inserts = (
        source.join(surviving, F.col(key) == F.col("_kept_key"), "left_anti")
        .withColumn("is_current", F.lit(True))
        .withColumn("audit_insertdate", ts)
        .withColumn("audit_modifieddate", ts)
        .select(*[F.col(c) for c in target.columns])
    )

    return hist.unionByName(expired).unionByName(kept_current).unionByName(inserts)


def scd2_init(source: DataFrame, now: _dt.datetime) -> DataFrame:
    """First load: everything current."""
    ts = F.lit(now).cast("timestamp")
    return (
        source.withColumn("is_current", F.lit(True))
        .withColumn("audit_insertdate", ts)
        .withColumn("audit_modifieddate", ts)
    )


def scd2_merge_sql(
    table: str, staging_view: str, key: str, compare_cols: list[str], payload_cols: list[str]
) -> tuple[str, str]:
    """The two Delta MERGE statements for a Delta-enabled deployment —
    byte-for-byte the reference's shape (silver_transactions.py:123-201)."""
    neq = " OR ".join(f"t.{c} <> s.{c}" for c in compare_cols if c != key)
    cols = ", ".join(payload_cols + ["is_current", "audit_insertdate", "audit_modifieddate"])
    vals = ", ".join([f"s.{c}" for c in payload_cols] + ["true", "current_timestamp()", "current_timestamp()"])
    expire = f"""
        MERGE INTO {table} t USING {staging_view} s
        ON t.{key} = s.{key} AND t.is_current = true
        WHEN MATCHED AND ({neq})
        THEN UPDATE SET t.is_current = false, t.audit_modifieddate = current_timestamp()
    """
    insert = f"""
        MERGE INTO {table} t USING {staging_view} s
        ON t.{key} = s.{key} AND t.is_current = true
        WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})
    """
    return expire, insert


def scd2_snapshot_asof(table: DataFrame, ts: _dt.datetime) -> DataFrame:
    """Reconstruct the table state as of ``ts`` from SCD2 history — the
    row-validity twin of Delta time travel (``VERSION AS OF`` reads a
    storage version; this reads business validity, the query the reference's
    is_current-based silver layer supports implicitly).

    A row was in effect at ``ts`` iff it had been inserted by then
    (audit_insertdate <= ts) and had not yet been expired
    (is_current, or expired later: audit_modifieddate > ts). Pure filter —
    partition-prunable when the table is laid out by insert date."""
    t = F.lit(ts).cast("timestamp")
    return table.filter(
        (F.col("audit_insertdate") <= t)
        & (F.col("is_current") | (F.col("audit_modifieddate") > t))
    )
