"""Run-to-run spread for the deep dedup decade rows (r12 verdict item 3).

SCALING.md's 30M and 100M sharded-miner rows are honest min-of-1 timed
runs; this probe anchors how much such single numbers can wobble by
re-timing the 10M sharded point N times in ONE session, canary-stamped
at both ends (the same pinned hashagg workload bench.py stamps), and
reporting every run plus min/median/max. Warm-up happens at a 10×
smaller size — code paths are size-independent once compiled, and a
full-size warm run would double the probe's cost for nothing.

Usage: python tools/dedup_spread_probe.py [n_docs] [runs] [band_passes]
       (defaults: 10_000_000 docs, 3 runs, band_passes 4)
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    band_passes = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from bench import host_canary
    from dedup_scale_probe import _DiskWatch, materialize
    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        near_dup_pairs_sharded,
    )

    spark = get_spark("dedup_spread_probe")
    spark.sparkContext.setLogLevel("ERROR")

    print(f"canary[start]: {host_canary(spark)}", flush=True)

    warm_docs = spark.read.parquet(materialize(spark, n_docs // 10))
    near_dup_pairs_sharded(
        warm_docs, "doc_id", "text", band_passes=band_passes
    ).count()
    print(f"warm-up at {n_docs // 10} done", flush=True)

    docs = spark.read.parquet(materialize(spark, n_docs))
    times, n_pairs = [], 0
    watch = _DiskWatch()
    watch.start()
    try:
        for r in range(runs):
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001 — GC nudge is best-effort
                pass
            t0 = time.perf_counter()
            n_pairs = near_dup_pairs_sharded(
                docs, "doc_id", "text", band_passes=band_passes
            ).count()
            el = time.perf_counter() - t0
            times.append(el)
            print(f"run {r + 1}/{runs}: {el:.1f} s, {n_pairs} pairs", flush=True)
    finally:
        hw = watch.stop()
    print(f"canary[end]:   {host_canary(spark)}", flush=True)
    print(
        f"docs={n_docs} B={band_passes} runs={runs}: "
        f"min {min(times):.1f} / median {statistics.median(times):.1f} / "
        f"max {max(times):.1f} s "
        f"(spread {max(times) / min(times):.3f}x), "
        f"{n_pairs} pairs, disk high-water {hw:.1f} GB"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
