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
       (defaults: 50_000 docs, 10×)
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


def timed(spark, fn) -> tuple[float, int]:
    # JVM GC first: released checkpoint/broadcast blocks from prior runs
    # otherwise linger and add run-to-run variance (the round-1 bench
    # outlier mechanism)
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    last_n = 0
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        last_n = fn()
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best, last_n


def main() -> int:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    sizes = [small, small * factor]

    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        containment_pairs,
        dedup_corpus,
        near_dup_pairs,
        near_dup_pairs_against,
    )

    spark = get_spark("dedup_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for n in sizes:
        path = materialize(spark, n)
        docs = spark.read.parquet(path)
        # untimed full-pipeline warm-up at THIS size so codegen/JIT cost
        # lands outside the measurement at both sizes equally
        dedup_corpus(docs, "doc_id", "text").count()
        t_pairs, n_pairs = timed(spark, lambda: near_dup_pairs(docs, "doc_id", "text").count())
        t_corpus, n_surv = timed(spark, lambda: dedup_corpus(docs, "doc_id", "text").count())
        t_cont, n_cont = timed(
            spark, lambda: containment_pairs(docs, "doc_id", "text", 0.5).count()
        )
        batch = docs.filter(F.col("doc_id") % 10 == 0)  # a 10% ingest batch
        t_incr, n_incr = timed(
            spark,
            lambda: near_dup_pairs_against(batch, docs, "doc_id", "text").count(),
        )
        rows.append((n, t_pairs, n_pairs, t_corpus, n_surv, t_cont, t_incr))
        print(
            f"docs={n:>8d}  pairs: {t_pairs:6.2f}s ({n_pairs} found)   "
            f"dedup_corpus: {t_corpus:6.2f}s ({n_surv} survivors)   "
            f"containment: {t_cont:6.2f}s ({n_cont})   "
            f"incremental(10% batch): {t_incr:6.2f}s ({n_incr})",
            flush=True,
        )

    (n0, tp0, np0, tc0, _, tco0, ti0), (n1, tp1, np1, tc1, _, tco1, ti1) = (
        rows[0],
        rows[-1],
    )
    print(
        f"\n{factor}x data -> pairs {tp1 / tp0:.1f}x time ({np1 / max(np0, 1):.1f}x output), "
        f"dedup_corpus {tc1 / tc0:.1f}x, containment {tco1 / tco0:.1f}x, "
        f"incremental {ti1 / ti0:.1f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
