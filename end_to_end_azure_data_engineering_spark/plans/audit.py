"""Audit log + watermark state store — macro-ops M4/M5.

The reference's ``audit.audit_logs`` Delta table is both run telemetry and
the incremental-load state store (1_audit/audit_ddl.sql:4-28); the last
successful watermark is read back with a filter → orderBy desc_nulls_last →
limit 1 → collect of a single scalar (1_audit/fetch_logs.py:21-35) — the
only sanctioned driver-side collect in the engine.

Audit bracketing (M5): a STARTED row before work, SUCCESS/FAILED after,
with rows_processed and error_message (1_audit/audit_start.py:76-105,
audit_end.py:53-101). The reference builds INSERT strings by hand with
manual quote-escaping; we write typed rows through the DataFrame API, which
removes its SQL-injection surface entirely.
"""

from __future__ import annotations

import datetime as _dt
import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..engine.clock import Clock, SystemClock
from ..engine.tableio import Warehouse

AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("source_system", T.StringType()),
        T.StructField("source_object", T.StringType()),
        T.StructField("run_date", T.DateType()),
        T.StructField("status", T.StringType()),  # STARTED | SUCCESS | FAILED
        T.StructField("rows_processed", T.LongType()),
        T.StructField("watermark_value", T.StringType()),
        T.StructField("start_time", T.TimestampType()),
        T.StructField("end_time", T.TimestampType()),
        T.StructField("error_message", T.StringType()),
        T.StructField("inserted_at", T.TimestampType()),
    ]
)

NAMESPACE, TABLE = "audit", "audit_logs"


@dataclass
class AuditLog:
    wh: Warehouse
    clock: Clock = None  # type: ignore[assignment]
    # Parallel stages bracket concurrently, but parquet appends to one path
    # are NOT safe concurrently: every job stages under <path>/_temporary/0,
    # and the first commit's cleanup deletes the other jobs' staging files
    # (transient FAILED rows observed in the DAG tests). Raw-parquet audit
    # therefore serializes inserts; on Delta the append is an ACID commit and
    # the lock is unnecessary.
    _write_lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def __post_init__(self):
        if self.clock is None:
            self.clock = SystemClock()
        if not self.wh.exists(NAMESPACE, TABLE):
            empty = self.wh.spark.createDataFrame([], AUDIT_SCHEMA)
            self.wh.overwrite(empty, NAMESPACE, TABLE)
        # On an MVCC warehouse every row insert is its own APPEND version;
        # bound the audit table's history inline (per-table retention, so
        # gold time travel is untouched) unless the operator already chose
        if hasattr(self.wh, "set_retention") and not (
            self.wh.path(NAMESPACE, TABLE) / ".retention"
        ).exists():
            self.wh.set_retention(NAMESPACE, TABLE, 8)

    def _insert(self, **kw) -> None:
        now = self.clock.now()
        row = {
            "source_system": kw.get("source_system"),
            "source_object": kw.get("source_object"),
            "run_date": now.date(),
            "status": kw.get("status"),
            "rows_processed": kw.get("rows_processed"),
            "watermark_value": kw.get("watermark_value"),
            "start_time": kw.get("start_time"),
            "end_time": kw.get("end_time"),
            "error_message": kw.get("error_message"),
            "inserted_at": now,
        }
        # Fast path: write the one-row parquet file driver-side (Arrow) —
        # a full Spark job per audit row cost ~0.3s × 2 rows × every
        # pipeline stage, which dominated the ingestion phase wall in the
        # end-to-end benchmark. Unique file names make concurrent inserts
        # safe without the lock; logical types match Spark's writer
        # exactly (verified mixed-file reads + watermark fetch in
        # tests/test_audit_bracketing + the pipeline bench suite).
        try:
            self._insert_arrow(row)
        except Exception:
            df = self.wh.spark.createDataFrame(
                [tuple(row[f.name] for f in AUDIT_SCHEMA)], AUDIT_SCHEMA
            )
            with self._write_lock:
                self.wh.append(df, NAMESPACE, TABLE)

    def _insert_arrow(self, row: dict) -> None:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                pa.field("source_system", pa.string()),
                pa.field("source_object", pa.string()),
                pa.field("run_date", pa.date32()),
                pa.field("status", pa.string()),
                pa.field("rows_processed", pa.int64()),
                pa.field("watermark_value", pa.string()),
                pa.field("start_time", pa.timestamp("us", tz="UTC")),
                pa.field("end_time", pa.timestamp("us", tz="UTC")),
                pa.field("error_message", pa.string()),
                pa.field("inserted_at", pa.timestamp("us", tz="UTC")),
            ]
        )
        tbl = pa.table({k: [v] for k, v in row.items()}, schema=schema)
        # insert through the warehouse's file-insert hook: the plain
        # warehouse stages under a dot-name and atomically renames into the
        # table root (an interrupted write never leaves a footerless
        # partial visible); a VersionedWarehouse publishes the file as a
        # proper APPEND version, so audit rows stay visible to its
        # version-pointer reads
        name = f"part-audit-{uuid.uuid4().hex}.parquet"
        self.wh.insert_file(
            NAMESPACE, TABLE, name, lambda tmp: pq.write_table(tbl, tmp)
        )

    def start(self, source_system: str, source_object: str) -> _dt.datetime:
        t0 = self.clock.now()
        self._insert(
            source_system=source_system, source_object=source_object,
            status="STARTED", start_time=t0,
        )
        return t0

    def success(
        self, source_system: str, source_object: str, start_time: _dt.datetime,
        rows_processed: int, watermark_value: str | None,
    ) -> None:
        self._insert(
            source_system=source_system, source_object=source_object,
            status="SUCCESS", rows_processed=rows_processed,
            watermark_value=watermark_value, start_time=start_time,
            end_time=self.clock.now(),
        )

    def failed(
        self, source_system: str, source_object: str, start_time: _dt.datetime, error: str
    ) -> None:
        self._insert(
            source_system=source_system, source_object=source_object,
            status="FAILED", start_time=start_time, end_time=self.clock.now(),
            error_message=error[:4000],
        )

    def read(self) -> DataFrame:
        return self.wh.read(NAMESPACE, TABLE)

    def compact(self, target_files: int = 8) -> int:
        """Fold the accumulated one-file-per-insert audit rows into
        ``target_files`` files. Run periodically — the Arrow fast path
        trades one tiny file per audit row for insert latency, and a
        long-lived deployment should sweep the accretion.

        Concurrency-safe by construction: the file list is SNAPSHOTTED
        first, the compacted output lands in the same directory under new
        names, and then exactly the snapshotted sources are deleted —
        inserts racing with the sweep are untouched. (A whole-directory
        overwrite would silently delete rows inserted between its listing
        and its rmtree — including SUCCESS rows carrying watermarks.)
        Crash window: after output lands, before sources are deleted ⇒
        duplicate audit rows, which the readers tolerate (watermark fetch
        takes the latest row; duplicated telemetry rows are benign) — rows
        are never lost. Returns the file count after the sweep."""
        if hasattr(self.wh, "_append_lock"):
            # MVCC warehouse: versions are immutable, so in-place file
            # surgery is wrong AND unnecessary — compaction is simply a new
            # OVERWRITE version. The append lock serializes against racing
            # row inserts (an insert publishing between our read and our
            # publish would otherwise be superseded and lost).
            with self.wh._append_lock(NAMESPACE, TABLE):
                sources = sorted(
                    str(f) for f in self.wh.data_dir(NAMESPACE, TABLE).glob("*.parquet")
                )
                if len(sources) <= target_files:
                    return len(sources)
                compacted = (
                    self.wh.spark.read.parquet(*sources)
                    .repartitionByRange(target_files, "inserted_at")
                    .sortWithinPartitions("inserted_at")
                )
                self.wh.overwrite(compacted, NAMESPACE, TABLE)
            return len(list(self.wh.data_dir(NAMESPACE, TABLE).glob("*.parquet")))
        path = self.wh.data_dir(NAMESPACE, TABLE)
        sources = sorted(str(f) for f in path.glob("*.parquet"))
        if len(sources) <= target_files:
            return len(sources)
        compacted = (
            self.wh.spark.read.parquet(*sources)
            .repartitionByRange(target_files, "inserted_at")
            .sortWithinPartitions("inserted_at")
        )
        import shutil
        import uuid as _uuid

        tmp = path.parent / f".{TABLE}.compact.{_uuid.uuid4().hex[:8]}"
        compacted.write.mode("overwrite").parquet(str(tmp))
        with self._write_lock:
            for f in tmp.glob("*.parquet"):
                os.replace(f, path / f"part-compacted-{_uuid.uuid4().hex}.parquet")
            for s in sources:
                try:
                    os.remove(s)
                except FileNotFoundError:
                    pass
        shutil.rmtree(tmp, ignore_errors=True)
        return len(list(path.glob("*.parquet")))

    def fetch_last_watermark(self, source_system: str, source_object: str) -> str:
        """O1/P6 — reference: 1_audit/fetch_logs.py:21-35. Empty string when
        no successful prior run (⇒ caller does a full scan, S6)."""
        rows = (
            self.read()
            .filter(
                (F.col("source_system") == source_system)
                & (F.col("source_object") == source_object)
                & (F.col("status") == "SUCCESS")
                & F.col("watermark_value").isNotNull()
                & (F.length(F.col("watermark_value")) > 0)
            )
            .orderBy(
                F.col("end_time").desc_nulls_last(), F.col("inserted_at").desc_nulls_last()
            )
            .select("watermark_value")
            .limit(1)
            .collect()
        )
        return rows[0][0] if rows else ""
