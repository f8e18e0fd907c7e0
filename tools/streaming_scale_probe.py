"""Streaming-sink scale probe (VERDICT r4 item 5).

`dedup_stream_sink` and `cms_stream_sink` are batch-parity-tested but the
state they maintain grows with every micro-batch — the dedup signature
store accretes one row per document ever seen, and the component forest
grows with the duplicate population. This probe drives both sinks
synchronously (the same direct-invocation mode the tests use) for N
micro-batches of M unique documents each (1% controlled near-duplicates,
same generator as tools/dedup_scale_probe.py) and records per-batch wall
latency against the standing corpus size. The question it answers: does
per-batch cost stay flat (bounded by O(batch + collisions)) or creep with
corpus size — and if it creeps, which part (signature anti-join, band
mine, component merge, table publish) owns the growth.

Usage: python tools/streaming_scale_probe.py [n_batches] [batch_docs] [sig_buckets]
       (defaults: 12 batches x 20_000 docs, unbucketed store; pass a
       bucket count to exercise the partition-local-compaction path on a
       VersionedWarehouse)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT_ROOT = Path("/tmp/end_to_end_azure_data_engineering_stream_scale")


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    sig_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else None

    import shutil

    from pyspark.sql import functions as F

    from dedup_scale_probe import synth_corpus
    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.engine.tableio import (
        VersionedWarehouse,
        Warehouse,
    )
    from end_to_end_azure_data_engineering_spark.streaming.ingest import (
        cms_stream_sink,
        dedup_stream_sink,
        topk_stream_sink,
    )

    spark = get_spark("streaming_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    # materialize the full corpus once; batches are disjoint id slices so
    # the per-batch read is a pruned parquet scan, not generation cost
    total = n_batches * batch_docs
    corpus_path = OUT_ROOT / f"docs_{total}"
    if not (corpus_path / "_SUCCESS").exists():
        synth_corpus(spark, total).withColumn(
            "batch", (F.col("doc_id") / batch_docs).cast("int")
        ).write.mode("overwrite").partitionBy("batch").parquet(str(corpus_path))
    docs = spark.read.parquet(str(corpus_path))

    shutil.rmtree(OUT_ROOT / "wh", ignore_errors=True)
    wh_cls = VersionedWarehouse if sig_buckets else Warehouse
    wh = wh_cls(spark, str(OUT_ROOT / "wh"))
    dsink = dedup_stream_sink(wh, threshold=0.5, sig_buckets=sig_buckets)
    csink = cms_stream_sink(wh, "token_sketch", "doc_id")
    tsink = topk_stream_sink(wh, "hot_docs", "doc_id", k=50)

    print(
        f"{n_batches} batches x {batch_docs} docs (total {total})"
        + (f", {sig_buckets}-bucket partitioned store" if sig_buckets else "")
    )
    print(
        f"{'batch':>5} {'corpus':>9} {'dedup_s':>8} {'cms_s':>7} "
        f"{'topk_s':>7} {'sig_rows':>9}"
    )
    rows = []
    for b in range(n_batches):
        batch = docs.filter(F.col("batch") == b).select("doc_id", "text")
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        dsink(batch, b)
        t_dedup = time.perf_counter() - t0
        t0 = time.perf_counter()
        csink(batch, b)
        t_cms = time.perf_counter() - t0
        t0 = time.perf_counter()
        tsink(batch, b)
        t_topk = time.perf_counter() - t0
        sig_rows = wh.read("silver", "dedup_signatures").count()
        corpus_size = (b + 1) * batch_docs
        rows.append((b, corpus_size, t_dedup, t_cms, t_topk, sig_rows))
        print(
            f"{b:>5} {corpus_size:>9} {t_dedup:>8.2f} {t_cms:>7.2f} "
            f"{t_topk:>7.2f} {sig_rows:>9}",
            flush=True,
        )

    # growth summary: compare steady-state tail to early steady batch
    # (batch 0 pays codegen/JIT; batch 1 is the earliest honest point)
    if n_batches >= 4:
        early = rows[1]
        late = rows[-1]
        growth = late[2] / max(early[2], 1e-9)
        corpus_growth = late[1] / early[1]
        print(
            f"\ncorpus {early[1]} -> {late[1]} ({corpus_growth:.0f}x): "
            f"dedup per-batch {early[2]:.2f}s -> {late[2]:.2f}s ({growth:.2f}x), "
            f"cms {early[3]:.2f}s -> {late[3]:.2f}s "
            f"({late[3] / max(early[3], 1e-9):.2f}x), "
            f"topk {early[4]:.2f}s -> {late[4]:.2f}s "
            f"({late[4] / max(early[4], 1e-9):.2f}x)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
