"""Scaling probe: measure headline queries at sf0.01 / sf0.1 / synthetic sf1.

sf1 is derived (once, into /tmp/end_to_end_azure_data_engineering_sf1) by replicating sf0.1 ten
times with key shifting, so join fan-outs and group cardinalities scale like
real data: orderkeys/custkeys/doc_ids/vec_ids/event_ids are offset per
replica; dimension-like tables (region/nation/customer/supplier/part) keep
their original size with customers replicated to match custkey range.

Usage: python tools/scale_probe.py [query ...]
Prints one line per (query, sf): warm execution seconds (2nd run of 2).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF1_DIR = "/tmp/end_to_end_azure_data_engineering_sf1"
SF10_DIR = "/tmp/end_to_end_azure_data_engineering_sf10"
SRC = "/root/testdata/sf0.1"
REPLICAS = 10

DEFAULT_QUERIES = [
    "pricing_summary",
    "two_hop_join",
    "window_dedup_latest",
    "sessionize_events",
    "dedup_minhash_lsh",
    "ann_lsh_topk",
]

# table -> (key columns to shift, shift amount per replica)
SHIFTS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 100_000},
    "customer": {"c_custkey": 100_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
COPY_ONLY = ["region", "nation", "supplier", "part"]


def build_scaled(spark, out_dir: str, replicas: int) -> None:
    """Replicate sf0.1 ``replicas``× with per-replica key shifting into
    ``out_dir`` (idempotent via a _READY marker). Shift steps exceed any
    key range in the source, so replicas never collide at any count."""
    from pyspark.sql import functions as F

    out = Path(out_dir)
    if (out / "_READY").exists():
        return
    out.mkdir(parents=True, exist_ok=True)
    for t in COPY_ONLY:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t, shifts in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        # replicate via a literal replica-index array + explode (no driver loop
        # over unions: one narrow fan-out map, scales to any replica count)
        rep = df.withColumn("_r", F.explode(F.lit(list(range(replicas)))))
        for col, step in shifts.items():
            rep = rep.withColumn(col, F.col(col) + F.col("_r").cast("long") * step)
        rep.drop("_r").write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    (out / "_READY").touch()


def build_sf1(spark) -> None:
    build_scaled(spark, SF1_DIR, REPLICAS)


def build_sf10(spark) -> None:
    """100× the bench fixture — the r9 pipeline probe scale (catches
    super-linear terms in SCD2 merge / anti-join append that 10× hides)."""
    build_scaled(spark, SF10_DIR, 100)


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES

    import __spark_entry__ as ent
    from end_to_end_azure_data_engineering_spark.engine import get_spark

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_sf1(spark)
    # the build leaves shuffle/broadcast blocks behind that inflate the
    # first measurements in the same session (observed 9x on the heaviest
    # query); force cleanup before timing
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass

    qs = ent.queries()
    print(f"{'query':28s} {'sf0.01':>8s} {'sf0.1':>8s} {'sf1':>8s}  ratio(1/0.1)")
    for name in names:
        times = []
        for sf_dir in ["/root/testdata/sf0.01", SRC, SF1_DIR]:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = time.perf_counter() - t0  # keep the warm (2nd) run
            times.append(best)
            # GC tick: let the ContextCleaner drop shuffle/broadcast blocks
            # so later queries aren't slowed by accumulated state (see
            # bench.py)
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        ratio = times[2] / times[1] if times[1] else float("nan")
        print(
            f"{name:28s} {times[0]:8.2f} {times[1]:8.2f} {times[2]:8.2f}  {ratio:6.1f}x"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
