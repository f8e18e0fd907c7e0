"""IVF nprobe knob probe (r9 verdict item 6, run round 10).

`ann_ivf_topk` is the most expensive bench query; its 100 TB story is
"a probe touches nprobe cells ≈ nprobe/K of the corpus". This probe
pins that constant factor empirically: sweep nprobe over the K=16-cell
index at a fixture decade above bench SF and record, per setting,

  candidates — scored (probe, vector) pairs, the real work driver;
              must track Σ|probed cells| ≈ nprobe/K × corpus × probes
  time       — warm min-of-2 full materialization
  recall@3   — overlap with the brute-force cosine top-3 ground truth
              (the quality the extra cells buy)

Usage: python tools/ivf_nprobe_probe.py [sf_dir] [nprobe ...]
       (defaults: /tmp/end_to_end_azure_data_engineering_sf10, nprobe 1 2 4 8 16; nprobe=K is
       exhaustive — recall must be 1.0 there by construction, a
       built-in correctness check on the probe itself)

       python tools/ivf_nprobe_probe.py --recall [sf_dir] [nprobe ...]
       runs section [C] only: the recall-vs-nprobe curve on UNIQUE
       vectors. The replicated fixture's recall is trivially 1.0 at
       every nprobe (each probe's true top-k are its own exact
       duplicates, and identical vectors share a cell — the [A] caveat),
       so [C] derives a same-size unique corpus by perturbing every
       vector with deterministic per-(vec_id, dim) hash noise at two
       scales anchored to the BASE corpus's median nearest-neighbor
       distance: 0.5×NN (near-dup regime survives; neighbors rarely
       cross cell borders) and 2×NN (neighbors genuinely contested
       across cells). Candidates still track nprobe/K × corpus; recall
       is measured against the brute-force cosine top-k over the SAME
       perturbed corpus and must be exactly 1.0 at nprobe=K.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

K_CELLS = 16  # ann_ivf_topk's codebook size (vec_id < 16 seed sample)
TOPK = 3
_NOISE_SEED = 0xC0FFEE  # fixed: the unique corpus is reproducible run-to-run


#: driver-side cap for the NN-anchor matrix (4096² float64 ≈ 134 MB)
_NN_CAP = 4096


def _base_nn_median(spark, sf_dir: str) -> float:
    """Median nearest-neighbor euclidean distance over the fixture's
    DISTINCT vectors. r10 ADVICE: the previous 'vec_id < 2000' literal
    encoded ONE fixture's replica-0 size — on any other corpus the
    anchor silently included exact replicas (NN distance 0) or covered
    only part of the base, skewing the eps scales. Deduplicating the
    vectors themselves needs no knowledge of the replication scheme:
    exact copies collapse, and the pairwise-distinct set is exactly what
    an NN anchor means. Above _NN_CAP distinct vectors a deterministic
    hash-thinned subset keeps the driver-side matrix bounded (stated in
    the output header via the [C] corpus line)."""
    import numpy as np
    from pyspark.sql import functions as F

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("embedding")
        .distinct()
    )
    n = e.count()
    if n < 2:
        raise SystemExit(f"{sf_dir}: {n} distinct vectors — no NN anchor")
    if n > _NN_CAP:
        # keep ~_NN_CAP rows: deterministic per-vector hash, no RNG state
        stride = -(-n // _NN_CAP)  # ceil
        e = e.filter(F.pmod(F.xxhash64("embedding"), F.lit(stride)) == 0)
        print(f"  (NN anchor thinned: {n} distinct vectors -> ~{_NN_CAP})")
    rows = e.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sq = (x * x).sum(axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.fill_diagonal(d2, np.inf)
    return float(np.sqrt(np.median(d2.min(axis=1).clip(min=0.0))))


def _build_unique(spark, sf_dir: str, eps: float, tag: str) -> str:
    """Derive a same-size UNIQUE-vector corpus: every element shifted by
    eps × uniform[-1, 1] noise keyed on (vec_id, dim, seed) — fully
    deterministic, JVM-side (one transform map, no Python UDF). Returns
    a directory `load()` can read (embeddings.parquet only — the IVF
    plans touch nothing else). Idempotent via _SUCCESS; the cache path
    carries the SOURCE fixture name and the eps value (r10 review: a
    tag-only key silently reused another fixture's perturbed corpus
    while the header reported stats computed from the new sf_dir)."""
    from pyspark.sql import functions as F

    out = Path(
        f"/tmp/end_to_end_azure_data_engineering_ivf_unique_{Path(sf_dir).name}_{tag}_eps{eps:.5f}"
    )
    dest = out / "embeddings.parquet"
    if not (dest / "_SUCCESS").exists():
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        pert = e.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (
                    x.cast("double")
                    + F.lit(eps)
                    * (
                        (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i, F.lit(_NOISE_SEED)),
                                F.lit(2001),
                            )
                            - F.lit(1000)
                        ).cast("double")
                        / F.lit(1000.0)
                    )
                ).cast("float"),
            ),
        )
        pert.write.mode("overwrite").parquet(str(dest))
    return str(out)


def _probe_frame(e):
    """The 20 staged probe vectors (same filter/columns as the query)."""
    from pyspark.sql import functions as F

    return e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"),
        F.col("_e_v").alias("_p_v"),
        F.col("_e_n").alias("_p_n"),
    )


def _brute_truth(spark, sf_dir: str, topk: int = TOPK) -> set:
    """Brute-force cosine top-k ground truth for the 20 probes over the
    corpus at ``sf_dir`` — one untimed pass, same cosine and
    (cos desc, vec_id asc) tiebreak as the query. Shared by [A] and [C]
    (r10 review: two hand-synced copies drifted apart structurally)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from end_to_end_azure_data_engineering_spark.functions import similarity as V
    from end_to_end_azure_data_engineering_spark.queries import load

    e = V.staged(load(spark, sf_dir, "embeddings"), "embedding", "_e")
    probes = _probe_frame(e)
    w = W.partitionBy("probe_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return {
        (r["probe_id"], r["vec_id"])
        for r in (
            e.crossJoin(F.broadcast(probes))
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "vec_id",
                V.cosine_pre("_p_v", "_p_n", "_e_v", "_e_n").alias("cos"),
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= topk)
            .collect()
        )
    }


def _materialized_index(spark, sf_dir: str, k_cells: int = K_CELLS,
                        centroids=None, tag: str = "seed"):
    """The IVF index materialized ONCE as the 100 TB layout (the assign
    frame written cell-partitioned to disk), keyed by the corpus
    directory name, the codebook size AND the codebook tag (seed vs
    refined) so no two configurations share a cache entry."""
    from end_to_end_azure_data_engineering_spark.queries.similarity_ops import (
        ivf_index_frames,
    )

    idx_path = (
        Path("/tmp/end_to_end_azure_data_engineering_ivf_index")
        / f"{Path(sf_dir).name}_k{k_cells}_{tag}"
    )
    assign, _ = ivf_index_frames(
        spark, sf_dir, nprobe=1, k_cells=k_cells, centroids=centroids
    )
    if not (idx_path / "_SUCCESS").exists():
        assign.write.mode("overwrite").partitionBy("cid").parquet(str(idx_path))
    return spark.read.parquet(str(idx_path))


def _refined_codebook(spark, sf_dir: str, k_cells: int, n_iter: int):
    """The seed codebook tightened by ``n_iter`` Lloyd iterations over
    the SAME corpus the index will serve (operators/kmeans.kmeans_refine
    — the production path the engine exposes; section [E] measures what
    the refinement buys in recall-per-candidate)."""
    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.operators.kmeans import (
        kmeans_refine,
    )
    from end_to_end_azure_data_engineering_spark.queries import load

    e = load(spark, sf_dir, "embeddings")
    seed = [
        [float(x) for x in r.embedding]
        for r in sorted(
            e.filter(F.col("vec_id") < k_cells)
            .select("vec_id", "embedding")
            .collect(),
            key=lambda r: r.vec_id,
        )
    ]
    return kmeans_refine(e, "embedding", seed, n_iter=n_iter)


#: perturbation regimes for the unique-vector recall sweep
_SCALES = {"halfnn": 0.5, "2xnn": 2.0}


def _recall_sweep(
    spark,
    sf_dir: str,
    nprobes: list[int],
    k_cells: int = K_CELLS,
    scales: tuple[str, ...] = ("halfnn", "2xnn"),
    refine: int = 0,
) -> int:
    """Section [C]: recall-vs-nprobe on unique vectors (see module doc).
    With ``--kcells`` this doubles as section [D] (r10 verdict item 4):
    the same sweep at a production-shaped codebook (K=1024) pins the
    claim that per-probe cost stays ≈ nprobe/K × corpus when K reaches
    the thousands — candidates must track that ratio and recall must
    still hit 1.0 at the exhaustive setting."""
    import math

    from end_to_end_azure_data_engineering_spark.queries import load
    from end_to_end_azure_data_engineering_spark.queries.similarity_ops import (
        ivf_index_frames,
        ivf_probe_topk,
    )

    d_nn = _base_nn_median(spark, sf_dir)
    dim = len(
        load(spark, sf_dir, "embeddings").select("embedding").first()["embedding"]
    )
    n_vecs = load(spark, sf_dir, "embeddings").count()
    print(
        f"[C] recall on UNIQUE vectors: corpus={n_vecs}, dim={dim}, "
        f"K={k_cells}, base NN median distance={d_nn:.4f}"
    )
    for tag in scales:
        mult = _SCALES[tag]
        # perturbation-vector norm target p = mult × d_nn; per-dim
        # uniform[-1,1] noise has E[norm²] = eps²·dim/3 ⇒ eps = p·√(3/dim)
        eps = mult * d_nn * math.sqrt(3.0 / dim)
        udir = _build_unique(spark, sf_dir, eps, tag)
        cents = None
        cb_tag = "seed"
        if refine:
            # [E]: the SAME sweep on a Lloyd-refined codebook — recall
            # deltas vs the seed rows are the value of the refinement
            cents = _refined_codebook(spark, udir, k_cells, refine)
            cb_tag = f"lloyd{refine}"
        index = _materialized_index(spark, udir, k_cells, cents, cb_tag)
        truth = _brute_truth(spark, udir)
        print(
            f"  perturbation {mult}×NN (eps={eps:.5f}, corpus {udir}, "
            f"codebook {cb_tag}):"
        )
        for np_ in nprobes:
            _, probe_cells = ivf_index_frames(
                spark, udir, nprobe=np_, k_cells=k_cells, centroids=cents
            )
            got = {
                (r["probe_id"], r["vec_id"])
                for r in ivf_probe_topk(index, probe_cells, topk=TOPK).collect()
            }
            cand = ivf_probe_topk(index, probe_cells, topk=10**9).count()
            recall = len(got & truth) / max(len(truth), 1)
            frac = cand / max(n_vecs * 20, 1)  # of corpus × probes
            print(
                f"    nprobe={np_:>4d}  candidates={cand:>9d} "
                f"({frac:.5f} of corpus×probes; nprobe/K={np_ / k_cells:.5f})  "
                f"recall@{TOPK}={recall:.3f}",
                flush=True,
            )
    return 0


def main() -> int:
    argv = list(sys.argv[1:])
    k_cells = K_CELLS
    if "--kcells" in argv:
        i = argv.index("--kcells")
        k_cells = int(argv[i + 1])
        del argv[i : i + 2]
    scales = tuple(_SCALES)
    if "--scales" in argv:
        i = argv.index("--scales")
        requested = [s for s in argv[i + 1].split(",") if s]
        # r11 ADVICE: silently dropping unknown names let a typo like
        # '--scales halfn' run an EMPTY sweep that printed the header
        # and exited 0, looking like a passing run
        unknown = [s for s in requested if s not in _SCALES]
        if unknown or not requested:
            raise SystemExit(
                f"unknown scale name(s) {unknown or ['<empty>']}; "
                f"valid: {sorted(_SCALES)}"
            )
        scales = tuple(requested)
        del argv[i : i + 2]
    refine = 0
    if "--refine" in argv:
        i = argv.index("--refine")
        refine = int(argv[i + 1])
        del argv[i : i + 2]
    recall_only = "--recall" in argv
    args = [a for a in argv if a != "--recall"]
    sf_dir = args[0] if args else "/tmp/end_to_end_azure_data_engineering_sf10"
    nprobes = [int(a) for a in args[1:]] or (
        [1, 2, 4, 8, 16] if k_cells == K_CELLS else
        # shifted-right default at big K: same nprobe/K coverage ratios
        [max(1, k_cells * f // 16) for f in (1, 2, 4, 8, 16)]
    )
    if recall_only:
        from end_to_end_azure_data_engineering_spark.engine import get_spark

        spark = get_spark("ivf_nprobe_probe")
        spark.sparkContext.setLogLevel("ERROR")
        return _recall_sweep(spark, sf_dir, nprobes, k_cells, scales, refine)

    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.engine import get_spark
    from end_to_end_azure_data_engineering_spark.queries import load
    from end_to_end_azure_data_engineering_spark.queries.similarity_ops import (
        ivf_index_frames,
        ivf_probe_topk,
        ivf_topk_plan,
    )

    spark = get_spark("ivf_nprobe_probe")
    spark.sparkContext.setLogLevel("ERROR")

    n_vecs = load(spark, sf_dir, "embeddings").count()
    # brute-force ground truth for the 20 probes (one pass, untimed) and
    # the IVF index materialized ONCE — the 100 TB layout: the assign
    # frame written cell-partitioned to disk. Per-query cost is then the
    # PROBE-SIDE read path: prune to the probed cells, score, top-k.
    truth = _brute_truth(spark, sf_dir)
    index = _materialized_index(spark, sf_dir, k_cells)

    print(f"corpus={n_vecs} vectors, K={k_cells} cells, top-{TOPK}, 20 probes")
    print("\n[A] full query (fresh plan each run: build + assignment + probe)")
    base_t = base_c = None
    rows_by_np = {}
    for np_ in nprobes:
        ivf_topk_plan(spark, sf_dir, nprobe=np_, topk=TOPK, k_cells=k_cells).write.format(
            "noop"
        ).mode("overwrite").save()  # warm-up at this nprobe
        best = None
        for _ in range(2):
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            rows = ivf_topk_plan(spark, sf_dir, nprobe=np_, topk=TOPK, k_cells=k_cells).collect()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        rows_by_np[np_] = rows
        got = {(r["probe_id"], r["vec_id"]) for r in rows}
        recall = len(got & truth) / max(len(truth), 1)
        # candidate volume: Σ over probes of their probed cells' sizes
        # (the scored-join row count BEFORE the top-k) — untimed pass
        cand = ivf_topk_plan(spark, sf_dir, nprobe=np_, topk=10**9, k_cells=k_cells).count()
        if base_t is None:
            base_t, base_c = best, cand
        print(
            f"nprobe={np_:>2d}  candidates={cand:>9d} ({cand / max(base_c,1):4.1f}x)  "
            f"time={best:6.2f}s ({best / base_t:4.2f}x)  recall@{TOPK}={recall:.3f}",
            flush=True,
        )

    print("\n[B] probe-side read path over the materialized cell-partitioned index")
    base_t = None
    for np_ in nprobes:
        _, probe_cells = ivf_index_frames(
            spark, sf_dir, nprobe=np_, k_cells=k_cells
        )
        # static cell pruning: the probed cells are ≤ 20×nprobe ids known
        # at plan time — exactly the partition-pruned read at 100 TB
        cids = sorted({r["cid"] for r in probe_cells.select("cid").collect()})
        pruned = index.filter(F.col("cid").isin(cids))
        df = ivf_probe_topk(pruned, probe_cells, topk=TOPK)
        df.write.format("noop").mode("overwrite").save()  # warm-up
        best = None
        for _ in range(2):
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            t0 = time.perf_counter()
            rows = df.collect()
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        got = {(r["probe_id"], r["vec_id"]) for r in rows}
        agree = got == {
            (r["probe_id"], r["vec_id"]) for r in rows_by_np[np_]
        }
        if base_t is None:
            base_t = best
        print(
            f"nprobe={np_:>2d}  cells={len(cids):>2d}  time={best:6.2f}s "
            f"({best / base_t:4.2f}x)  matches-full-query={agree}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
