"""Hot-bucket defense probe for the streaming dedup sink (r7).

Real ingest streams carry boilerplate: the same disclaimer/template text
arrives in every batch, so the standing corpus accumulates one giant
near-duplicate cluster — and every LSH band bucket it occupies grows
linearly with time. Without a cap, the sink's batch-vs-corpus mine pays
O(batch_boilerplate x standing_boilerplate) candidates per epoch
(linear growth forever, all of them verifying at jaccard 1.0); with
SIG_HOT_BUCKET_CAP the over-cap buckets emit star candidates only, so
the per-epoch mine stays O(batch).

This probe drives dedup_stream_sink for N epochs of M docs with P%
identical boilerplate per batch, once with the shipped cap and once with
the cap disabled (monkeypatched high), and prints per-epoch wall plus
the verified-pair volume entering connected components.

Usage: python tools/hot_bucket_stream_probe.py [n_batches] [batch_docs] [pct]
       (defaults: 6 x 10_000, 10% boilerplate)
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

OUT_ROOT = Path("/tmp/end_to_end_azure_data_engineering_hot_bucket")


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    batch_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from dedup_scale_probe import synth_corpus
    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
    from end_to_end_azure_data_engineering_spark.streaming import ingest

    spark = get_spark("hot_bucket_stream_probe")
    spark.sparkContext.setLogLevel("ERROR")

    total = n_batches * batch_docs
    corpus_path = OUT_ROOT / f"docs_{total}_{pct}"
    if not (corpus_path / "_SUCCESS").exists():
        base = synth_corpus(spark, total)
        boiler_text = (
            "standard legal disclaimer boilerplate repeated verbatim in "
            "every ingest batch of the stream " * 6
        )
        docs = base.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 100 < pct, F.lit(boiler_text)
            ).otherwise(F.col("text")),
        ).withColumn("batch", (F.col("doc_id") / batch_docs).cast("int"))
        docs.write.mode("overwrite").partitionBy("batch").parquet(str(corpus_path))
    docs = spark.read.parquet(str(corpus_path))

    for label, cap in (("capped (shipped)", ingest.SIG_HOT_BUCKET_CAP),
                       ("uncapped", 1 << 40)):
        saved = ingest.SIG_HOT_BUCKET_CAP
        ingest.SIG_HOT_BUCKET_CAP = cap
        shutil.rmtree(OUT_ROOT / "wh", ignore_errors=True)
        wh = Warehouse(spark, str(OUT_ROOT / "wh"))
        sink = ingest.dedup_stream_sink(wh, threshold=0.5)
        print(f"\n== {label}: {n_batches} x {batch_docs} docs, {pct}% boilerplate")
        print(f"{'batch':>5} {'standing':>9} {'dedup_s':>8} {'state_rows':>11}")
        try:
            for b in range(n_batches):
                batch = docs.filter(F.col("batch") == b).select("doc_id", "text")
                try:
                    spark.sparkContext._jvm.System.gc()
                except Exception:
                    pass
                t0 = time.perf_counter()
                sink(batch, b)
                el = time.perf_counter() - t0
                state_rows = wh.read("silver", "dedup_components").count()
                print(
                    f"{b:>5} {(b + 1) * batch_docs:>9} {el:>8.2f} "
                    f"{state_rows:>11}",
                    flush=True,
                )
        finally:
            ingest.SIG_HOT_BUCKET_CAP = saved
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
