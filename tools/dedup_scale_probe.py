"""Dedup scale probe on a NON-replicated corpus (VERDICT r3 item 8).

The synthetic sf1 used by scale_probe.py is built by 10-way key-shifted
replication, which makes every document a true 10-way duplicate — so the
minhash/connected-components scale-up ratios there measure OUTPUT volume
(pair count grows ~replicas² per bucket), not plan cost. This probe builds
corpora of unique documents with a controlled 1% near-duplicate rate at two
sizes 10× apart, so pair output grows linearly and the measured ratio IS
the plan cost.

Corpus construction (pure Spark expressions, no driver rows):
  - doc i's text = 50 words drawn from a 500-word vocab by xxhash64(seed, k)
    where seed = i, except 1% of docs (i % 100 == 1) use seed = i-1 and then
    replace the last word — a ~0.94-Jaccard near-duplicate of doc i-1.
  - corpora are materialized to parquet once so timing measures the dedup
    pipeline, not generation.

Measured per size (warm, 2nd of 2 runs):
  pairs  — near_dup_pairs (shingle → minhash → LSH bands → verify)
  corpus — dedup_corpus  (pairs + connected components + anti-join)

Usage: python tools/dedup_scale_probe.py [small_docs] [scale_factor]
                                         [--members pairs,corpus,...]
                                         [--runs N]
       (defaults: 50_000 docs, 10×, all four members, min-of-3)

--members / --runs exist for the DEEP decades (r10: 10M→100M docs),
where a full min-of-3 four-member sweep would cost half a day on
local[32]: scope to the core members and fewer timed runs, and say so
next to the recorded numbers. Codegen/JIT warm-up still happens before
any timed run (the smaller size's runs warm the code paths; each
member also gets one untimed run at the small size).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

OUT_ROOT = Path("/tmp/end_to_end_azure_data_engineering_dedup_scale")

N_WORDS = 50
VOCAB = [f"w{j:03d}" for j in range(500)]
DUP_PCT = 1  # i % 100 == 1 → near-dup of i-1


def synth_corpus(spark, n_docs: int):
    from pyspark.sql import functions as F

    i = F.col("id")
    is_dup = i % 100 == DUP_PCT
    seed = F.when(is_dup, i - 1).otherwise(i)
    vocab = F.lit(VOCAB)
    pick = lambda s, k: F.element_at(vocab, (F.pmod(F.xxhash64(s, k), len(VOCAB)) + 1).cast("int"))
    words = F.transform(F.sequence(F.lit(1), F.lit(N_WORDS)), lambda k: pick(seed, k))
    # perturb the duplicate: swap the last word for one keyed on the doc's
    # own id, keeping shingle-Jaccard ≈ (n_shingles-3)/n_shingles ≈ 0.94
    words = F.when(
        is_dup,
        F.concat(F.slice(words, 1, N_WORDS - 1), F.array(pick(i, F.lit(0)))),
    ).otherwise(words)
    return spark.range(n_docs).select(
        i.alias("doc_id"), F.array_join(words, " ").alias("text")
    )


def materialize(spark, n_docs: int) -> str:
    path = OUT_ROOT / f"docs_{n_docs}"
    if not (path / "_SUCCESS").exists():
        synth_corpus(spark, n_docs).write.mode("overwrite").parquet(str(path))
    return str(path)


class _DiskWatch:
    """Max filesystem usage (GB) sampled while a member runs — the
    sharded miner's contract is a bounded disk high-water mark, so the
    probe records it next to the time (r11 verdict item 2)."""

    def __init__(self, path: str = "/", interval: float = 2.0):
        import threading

        self._path, self._interval = path, interval
        self._stop = threading.Event()
        self._max_used = 0
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import shutil as _sh

        while not self._stop.is_set():
            try:
                self._max_used = max(self._max_used, _sh.disk_usage(self._path).used)
            except OSError:
                pass
            self._stop.wait(self._interval)

    def start(self):
        self._thread.start()

    def stop(self) -> float:
        self._stop.set()
        self._thread.join(5.0)
        return self._max_used / 1e9


def timed(spark, fn, runs: int = 3) -> tuple[float, int]:
    # JVM GC first: released checkpoint/broadcast blocks from prior runs
    # otherwise linger and add run-to-run variance (the round-1 bench
    # outlier mechanism)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    last_n = 0
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        last_n = fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best, last_n


def main() -> int:
    argv = list(sys.argv[1:])
    members = {"pairs", "corpus", "containment", "incremental"}
    runs = 3
    if "--members" in argv:
        i = argv.index("--members")
        members = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i : i + 2]
    band_passes = 4
    if "--band-passes" in argv:
        i = argv.index("--band-passes")
        band_passes = int(argv[i + 1])
        del argv[i : i + 2]
    small = int(argv[0]) if len(argv) > 0 else 50_000
    factor = int(argv[1]) if len(argv) > 1 else 10
    sizes = [small, small * factor]

    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        containment_pairs,
        dedup_corpus,
        near_dup_pairs,
        near_dup_pairs_against,
        near_dup_pairs_sharded,
    )

    spark = get_spark("dedup_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for si, n in enumerate(sizes):
        path = materialize(spark, n)
        docs = spark.read.parquet(path)
        # untimed pipeline warm-up so codegen/JIT cost lands outside the
        # measurement; at the deep decades ONLY the small size pays it
        # (code paths are size-independent once compiled). EVERY selected
        # member warms up (r10 review: only dedup_corpus did, so
        # '--members containment --runs 1' reported the 50-80x cold
        # first-run outlier this warm-up exists to exclude)
        if si == 0 or runs > 1:
            if "corpus" in members or "pairs" in members:
                dedup_corpus(docs, "doc_id", "text").count()
            if "sharded" in members:
                near_dup_pairs_sharded(
                    docs, "doc_id", "text", band_passes=band_passes
                ).count()
            if "containment" in members:
                containment_pairs(docs, "doc_id", "text", 0.5).count()
            if "incremental" in members:
                near_dup_pairs_against(
                    docs.filter(F.col("doc_id") % 10 == 0),
                    docs, "doc_id", "text",
                ).count()
        r = {"n": n}
        if "pairs" in members:
            r["t_pairs"], r["n_pairs"] = timed(
                spark, lambda: near_dup_pairs(docs, "doc_id", "text").count(), runs
            )
        if "sharded" in members:
            # the disk-budget miner (r12): same pairs as near_dup_pairs,
            # banded in disjoint passes — record the disk high-water mark
            # alongside the time, since bounded scratch is its whole point
            watch = _DiskWatch()
            watch.start()
            try:
                r["t_shard"], r["n_shard"] = timed(
                    spark,
                    lambda: near_dup_pairs_sharded(
                        docs, "doc_id", "text", band_passes=band_passes
                    ).count(),
                    runs,
                )
            finally:
                r["disk_hw_gb"] = watch.stop()
        if "corpus" in members:
            r["t_corpus"], r["n_surv"] = timed(
                spark, lambda: dedup_corpus(docs, "doc_id", "text").count(), runs
            )
        if "containment" in members:
            r["t_cont"], r["n_cont"] = timed(
                spark,
                lambda: containment_pairs(docs, "doc_id", "text", 0.5).count(),
                runs,
            )
        if "incremental" in members:
            batch = docs.filter(F.col("doc_id") % 10 == 0)  # a 10% ingest batch
            r["t_incr"], r["n_incr"] = timed(
                spark,
                lambda: near_dup_pairs_against(batch, docs, "doc_id", "text").count(),
                runs,
            )
        rows.append(r)
        if "disk_hw_gb" in r:
            print(f"  [sharded disk high-water: {r['disk_hw_gb']:.1f} GB used]")
        print(
            f"docs={n:>10d}  "
            + "".join(
                f"{lbl}: {r[t]:7.2f}s ({r.get(c, '-')})   "
                for lbl, t, c in (
                    ("pairs", "t_pairs", "n_pairs"),
                    (f"sharded(B={band_passes})", "t_shard", "n_shard"),
                    ("dedup_corpus", "t_corpus", "n_surv"),
                    ("containment", "t_cont", "n_cont"),
                    ("incremental(10% batch)", "t_incr", "n_incr"),
                )
                if t in r
            ),
            flush=True,
        )

    a, b = rows[0], rows[-1]
    parts = []
    for lbl, t in (
        ("pairs", "t_pairs"),
        ("sharded", "t_shard"),
        ("dedup_corpus", "t_corpus"),
        ("containment", "t_cont"),
        ("incremental", "t_incr"),
    ):
        if t in a and t in b:
            parts.append(f"{lbl} {b[t] / a[t]:.1f}x")
    if "n_pairs" in a and "n_pairs" in b:
        parts.append(f"(pair output {b['n_pairs'] / max(a['n_pairs'], 1):.1f}x)")
    print(f"\n{factor}x data -> " + ", ".join(parts) + f"  [min-of-{runs}]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
