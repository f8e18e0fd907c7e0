"""Medallion-pipeline scale probe (VERDICT r6 item 6).

The M1-M6 macro-ops (ingestion → silver ×11 quarantine+SCD2 merges →
gold ×7 star-schema builds, DAG-scheduled) are the reference's core unit
of work, but ``pipeline_total`` was only ever measured at the per-round
bench SF. This probe runs ``run_pipeline_benchmark`` — the exact code
path bench.py times — at sf0.1 (1×) and at the replicated synthetic sf1
(10×, built once by tools/scale_probe.py) and prints per-phase wall
clocks plus the slowest stages, answering: do the SCD2 merge and the
anti-join append scale sub-linearly in input size on fixed resources,
and which stage owns any super-linear term.

Each SF runs TWICE (fresh warehouse each time); the second run is
reported — the first pays codegen/JIT exactly like the query bench's
warm-up convention.

Usage: python tools/pipeline_scale_probe.py [sf_dir ...]
       (default: /root/testdata/sf0.1 and the cached replicated sf1)
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from scale_probe import SF1_DIR, SF10_DIR, build_sf1, build_sf10  # noqa: E402


def run_once(spark, sf_dir: str) -> dict:
    from end_to_end_azure_data_engineering_spark.plans.pipeline_bench import (
        run_pipeline_benchmark,
    )

    wh_root = tempfile.mkdtemp(prefix="pipe_scale_")
    try:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        return run_pipeline_benchmark(spark, sf_dir, wh_root)
    finally:
        shutil.rmtree(wh_root, ignore_errors=True)


def main() -> int:
    from end_to_end_azure_data_engineering_spark.engine import get_spark

    spark = get_spark("pipeline_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    sf_dirs = sys.argv[1:]
    if sf_dirs == ["--sf10"]:
        # r9 probe: one more decade (100x the bench fixture) to catch
        # super-linear terms in SCD2 merge / anti-join append that 10x hides
        build_sf1(spark)
        build_sf10(spark)
        sf_dirs = ["/root/testdata/sf0.1", SF1_DIR, SF10_DIR]
    elif not sf_dirs:
        build_sf1(spark)
        sf_dirs = ["/root/testdata/sf0.1", SF1_DIR]

    def flat_stages(res: dict) -> dict[str, float]:
        return {
            f"{phase}/{name}": t
            for phase, stages in res["stages"].items()
            for name, t in stages.items()
        }

    results = []
    for sf_dir in sf_dirs:
        run_once(spark, sf_dir)  # warm-up: codegen/JIT at this SF
        res = run_once(spark, sf_dir)
        results.append((sf_dir, res))
        stages = sorted(flat_stages(res).items(), key=lambda kv: -kv[1])[:6]
        print(f"\n== {sf_dir}: pipeline_total {res['pipeline_total']:.2f}s")
        for phase, t in res["phases"].items():
            speedup = res["parallel_speedup"].get(phase)
            print(f"   phase {phase:10s} {t:8.2f}s  overlap {speedup}")
        print("   slowest stages: " + ", ".join(f"{n}={t:.2f}s" for n, t in stages))

    for (d0, r0), (d1, r1) in zip(results, results[1:]):
        print(
            f"\n{d0} -> {d1}: pipeline_total {r0['pipeline_total']:.2f}s -> "
            f"{r1['pipeline_total']:.2f}s "
            f"({r1['pipeline_total'] / max(r0['pipeline_total'], 1e-9):.2f}x)"
        )
        common = set(r0["phases"]) & set(r1["phases"])
        for ph in sorted(common):
            print(
                f"  phase {ph:10s} {r0['phases'][ph]:7.2f}s -> {r1['phases'][ph]:7.2f}s "
                f"({r1['phases'][ph] / max(r0['phases'][ph], 1e-9):.2f}x)"
            )
        s0, s1 = flat_stages(r0), flat_stages(r1)
        shared = [n for n in s0 if n in s1 and s0[n] >= 0.05]
        worst = sorted(shared, key=lambda n: -(s1[n] / max(s0[n], 1e-9)))[:8]
        print("  worst stage ratios (stages >= 0.05s at 1x):")
        for n in worst:
            print(
                f"    {n:40s} {s0[n]:6.2f}s -> {s1[n]:6.2f}s "
                f"({s1[n] / max(s0[n], 1e-9):.2f}x)"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
