"""Arrow-vectorized similarity kernels — the sanctioned Python fast path.

The engine's default similarity kernels are JVM-side expressions
(functions/similarity.py): zero serialization, oracle-exact, the right
default. This module is the OTHER legitimate regime the brief's UDF policy
allows: when a numeric kernel outgrows what codegen'd scalar expressions do
well (huge probe batches, wide matrices, future GPU offload), a
`mapInPandas` stage moves each partition across Arrow once and runs the
whole batch as one BLAS matmul in numpy — batch-bounded memory, no per-row
Python.

Numerics caveat, stated precisely: numpy accumulates dot products in a
different order (pairwise/SIMD) than the expression fold, so scores can
differ in the last ulp and equal-score ties may swap. That is why
`cosine_topk_arrow` backs NO oracle query — `tests/test_similarity_arrow.py`
asserts parity against the expression form with an explicit tolerance
instead. Use the expression kernels wherever bit-reproducibility is part of
the contract.

EXCEPTION — the BIT-EXACT assignment kernels (r13 optimization round):
`assign_sq_l2_arrow` and `assign_cosine_cid_arrow` accumulate dim-by-dim in
an explicit Python loop over vectorized per-dim numpy ops, so every
(row, cell) reduction performs IEEE-754 double adds in EXACTLY the order of
the expression fold ``(((0+t1)+t2)+…)`` — multiplication, addition, division
and sqrt are all correctly-rounded deterministic IEEE ops, so the scores are
bit-identical to the interpreted zip_with/aggregate form, ties included
(asserted over full fixtures in tests/test_similarity_arrow.py and by the
unchanged oracle hashes of kmeans_lloyd_3iter / ann_ivf_topk /
ann_ivf_refined_topk). These exist because the HOF lambdas evaluate
INTERPRETED (~100 µs/row/dot at d=64, guide §4): the K-cell codebook ranking
was the dominant executor cost of every kmeans/IVF query (measured 0.35 s
per pass over 2 k rows at sf0.1 vs ~0.02 s here), while the unrolled codegen
alternative blows up the optimizer (see ivf_index_frames' NOTE). The batch
shape is exactly guide §4.2: Spark distributes, numpy does the K×d math.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DecimalType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def assign_sq_l2_arrow(
    df: DataFrame, vec_col: str, centroids: list[list[float]], out_col: str = "cell"
) -> DataFrame:
    """Append the 0-based argmin-squared-L2 centroid index — BIT-IDENTICAL
    to operators/kmeans.nearest_cell (see module docstring): per-dim
    ``acc += (x_d - c_d)²`` in ascending dim order reproduces the
    aggregate/zip_with fold add-for-add; ``np.argmin`` returns the FIRST
    minimum, matching the struct(dist, cell) ascending tie-break. All
    other columns pass through the Arrow batch unchanged.

    Clean-input precondition (r13 ADVICE): vectors must be non-null,
    equal-length and NaN-free. ``np.stack`` raises on null/ragged input;
    a NaN-bearing vector or centroid would silently diverge (np.argmin
    selects the first NaN score, Spark's struct ordering sorts NaN last).
    Every call site feeds staged, non-null fixed-dim embeddings."""
    C = np.asarray(centroids, dtype=np.float64)
    # a NEW StructType: DataFrame.schema is cached on the frame and
    # StructType.add mutates in place — appending to it would corrupt
    # the input frame's own schema
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )
    cols = df.columns

    # the closure must be SELF-CONTAINED (numpy/pandas only): a reference
    # to anything in this package would make cloudpickle serialize it by
    # module path, and the driver harness's Python workers do not have the
    # repo on their import path (the multimodal query's inline op set this
    # pattern). float32 → float64 below is exact, so the stack equals
    # Spark's as_double / per-element CAST for any stored element type.
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            acc = np.zeros((X.shape[0], C.shape[0]))
            for j in range(C.shape[1]):
                diff = X[:, j : j + 1] - C[None, :, j]
                acc += diff * diff
            out = pdf[cols].copy()
            out[out_col] = np.argmin(acc, axis=1).astype(np.int32)
            yield out

    return df.mapInPandas(run, schema)


def assign_cosine_cid_arrow(
    df: DataFrame,
    vec_col: str,
    norm_col: str,
    cent_vecs: list[list[float]],
    cent_norms: list[float],
    cent_ids: list[int],
    out_col: str = "cid",
) -> DataFrame:
    """Append the id of the max-cosine centroid — BIT-IDENTICAL to
    ivf_index_frames' ``array_min(cells)["cid"]`` ranking: the dot is the
    same ascending-dim fold, the denominator uses the frame's OWN staged
    norm column times the caller's precomputed centroid norms (the same
    Python floats the expression form inlines), and ``argmin`` over
    ``neg_cos`` with first-wins ties equals the struct(neg_cos, cid)
    ascending order because ``cent_ids`` is ascending in both codebook
    forms (seed sample sorted by vec_id; refined = range(K)) — enforced
    with a ValueError at the call site (ivf_index_frames).

    Clean-input precondition (r13 ADVICE): same as assign_sq_l2_arrow —
    non-null, equal-length, NaN-free vectors and centroids; NaN would
    silently diverge from the struct-ordering form (which sorts NaN
    last), and null/ragged input fails in ``np.stack``."""
    C = np.asarray(cent_vecs, dtype=np.float64)
    cn = np.asarray(cent_norms, dtype=np.float64)
    ids = np.asarray(cent_ids, dtype=np.int32)
    # a NEW StructType: DataFrame.schema is cached on the frame and
    # StructType.add mutates in place — appending to it would corrupt
    # the input frame's own schema
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, IntegerType())]
    )
    cols = df.columns

    # self-contained closure — see assign_sq_l2_arrow on why no package
    # reference may cross the pickle boundary
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            en = pdf[norm_col].to_numpy(dtype=np.float64)
            acc = np.zeros((X.shape[0], C.shape[0]))
            for j in range(C.shape[1]):
                acc += X[:, j : j + 1] * C[None, :, j]
            neg = -(acc / np.maximum(en[:, None] * cn[None, :], 1e-12))
            out = pdf[cols].copy()
            out[out_col] = ids[np.argmin(neg, axis=1)]
            yield out

    return df.mapInPandas(run, schema)


def int_gram_partials_arrow(df: DataFrame, qarr_col: str) -> DataFrame:
    """Per-partition partial Gram matrix over INTEGER-quantized vectors:
    one ``Xᵀ @ X`` int64 matmul per Arrow batch, emitting (i, j, m_part)
    rows (1-based dims, ≤ d² rows per batch). Integer sums are exact in
    ANY order, and numpy int64 wraps two's-complement exactly like the
    JVM long sum it replaces, so ``groupBy(i, j).sum(m_part)`` downstream
    equals the exploded self-join + sum bit-for-bit at any magnitude.
    This is the map-side-combine Gram shape (d² partials per partition,
    never n·d² join rows through a shuffle) — the classic distributed
    PCA layout, and ~40× less executor CPU than the join form measured
    on embedding_top_eigen_power (19 s → <0.5 s CPU at sf0.1).

    Clean-input precondition (r13 ADVICE): the quantized arrays must be
    non-null and equal-length — ``np.stack`` raises on null/ragged input
    that the old posexplode self-join silently dropped; the caller's
    quantization stage (transform over staged embeddings) never emits
    such rows."""
    schema = StructType(
        [
            StructField("i", IntegerType()),
            StructField("j", IntegerType()),
            StructField("m_part", LongType()),
        ]
    )

    # self-contained closure (numpy/pandas only) — see assign_sq_l2_arrow
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[qarr_col].to_numpy()).astype(np.int64, copy=False)
            g = X.T @ X
            gram = g if gram is None else gram + g
        if gram is None:
            return
        d = gram.shape[0]
        ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel().astype(np.int32),
                "j": jj.ravel().astype(np.int32),
                "m_part": gram.ravel(),
            }
        )

    return df.mapInPandas(run, schema)


def lloyd_decimal_partials_arrow(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """FUSED Lloyd iteration map stage (r14, VERDICT item 1): the
    bit-exact squared-L2 assignment (assign_sq_l2_arrow's fold, inlined —
    the closure must stay self-contained) PLUS the per-(cell, dim) member
    count and DECIMAL(28,12) partial sum, in ONE Arrow pass. Emits at most
    K x d rows per partition: (cell, dim, n_part, s_part) where ``s_part``
    is the EXACT sum of ``cast(x AS DECIMAL(28,12))`` over the partition's
    members of that cell — so the downstream
    ``groupBy(cell, dim).agg(sum(n_part), round(cast(sum(s_part) as
    double) / sum(n_part), 6) + 0.0)`` equals the old posexplode + JVM
    decimal aggregate BIT-FOR-BIT: decimal addition is exact and
    order-free, ``sum`` over DECIMAL(28,12) and over these DECIMAL(38,12)
    partials both carry type DECIMAL(38,12), and the division/round
    expression is unchanged.

    The double→decimal(28,12) HALF_UP cast is replicated exactly. Spark's
    ``Decimal(double)`` goes through ``Double.toString`` — the shortest
    round-trip decimal representation, the same VALUE CPython's ``repr``
    produces — then ``setScale(12, HALF_UP)``. The kernel quantizes each
    element to a scaled int (×1e12): a vectorized nearest-integer pass
    covers elements provably far from a .5 boundary at that scale (the
    float64 product's error is bounded by |x|·1e12·2⁻⁵², well inside the
    per-element window max(1e-9, |x·1e12|·2⁻⁵⁰)), and ambiguous elements
    (~0.1 % on float32-derived doubles; everything above 2⁵⁰ scaled) fall
    back to ``Decimal(repr(x)).quantize(1e-12, HALF_UP)`` — proven equal
    to Spark's own cast over full fixtures AND planted .5-boundary /
    ±ulp-neighborhood values in tests/test_similarity_arrow.py. Partition
    sums accumulate as exact Python ints (no overflow at any magnitude);
    a per-batch int64 fast path is used only when provably overflow-free.

    Clean-input precondition (same as the r13 kernels, stated per r13
    ADVICE): vectors must be non-null, equal-length and NaN-free —
    ``np.stack`` raises on ragged input and the NaN guard below raises
    loudly instead of silently diverging from the expression fold.
    """
    C = np.asarray(centroids, dtype=np.float64)
    K, D = C.shape
    schema = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("dim", IntegerType()),
            StructField("n_part", LongType()),
            StructField("s_part", DecimalType(38, 12)),
        ]
    )

    # self-contained closure — numpy/pandas/decimal only (see
    # assign_sq_l2_arrow on why no package reference may cross pickle)
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from decimal import ROUND_HALF_UP, Decimal

        e12 = Decimal(1).scaleb(-12)

        def exact_q(x: float) -> int:
            return int(
                Decimal(repr(float(x)))
                .quantize(e12, rounding=ROUND_HALF_UP)
                .scaleb(12)
            )

        counts = np.zeros(K, dtype=np.int64)
        sums = [[0] * D for _ in range(K)]  # exact Python ints
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64, copy=False)
            if np.isnan(X).any():
                raise ValueError(
                    "lloyd_decimal_partials_arrow: NaN in input vectors — "
                    "bit-parity with the expression fold is undefined"
                )
            # --- assignment: IDENTICAL fold to assign_sq_l2_arrow ---
            acc = np.zeros((X.shape[0], K))
            for j in range(D):
                diff = X[:, j : j + 1] - C[None, :, j]
                acc += diff * diff
            cells = np.argmin(acc, axis=1)
            # --- exact scaled-int quantization of every element ---
            flat = X.ravel()
            scaled = flat * 1e12
            absf = np.abs(scaled)
            frac = absf - np.floor(absf)
            win = np.maximum(1e-9, absf * 2.0**-50)
            amb = (
                (np.abs(frac - 0.5) <= win)
                | (absf > 2.0**50)
                | ~np.isfinite(scaled)
            )
            # HALF_UP == round-half-away-from-zero; unambiguous elements
            # have a unique nearest integer, so plain nearest is exact
            q = (np.sign(scaled) * np.floor(absf + 0.5)).astype(np.int64)
            for i in np.nonzero(amb)[0]:
                q[i] = exact_q(float(flat[i]))
            Q = q.reshape(X.shape)
            counts += np.bincount(cells, minlength=K)
            if Q.size and int(np.abs(Q).max()) * X.shape[0] < 2**62:
                # provably overflow-free: int64 scatter-add per batch,
                # folded into the exact Python-int partition totals
                bacc = np.zeros((K, D), dtype=np.int64)
                np.add.at(bacc, cells, Q)
                for c in np.unique(cells):
                    row = bacc[c]
                    sc = sums[c]
                    for d in range(D):
                        sc[d] += int(row[d])
            else:  # astronomically large elements: exact row-by-row
                for r in range(X.shape[0]):
                    sc = sums[cells[r]]
                    qr = Q[r]
                    for d in range(D):
                        sc[d] += int(qr[d])
        if not counts.any():
            return
        cells_out: list[int] = []
        dims_out: list[int] = []
        n_out: list[int] = []
        s_out: list = []
        for c in range(K):
            if counts[c] == 0:
                continue
            for d in range(D):
                cells_out.append(c)
                dims_out.append(d)
                n_out.append(int(counts[c]))
                s_out.append(Decimal(sums[c][d]).scaleb(-12))
        yield pd.DataFrame(
            {
                "cell": np.asarray(cells_out, dtype=np.int32),
                "dim": np.asarray(dims_out, dtype=np.int32),
                "n_part": np.asarray(n_out, dtype=np.int64),
                "s_part": s_out,
            }
        )

    return df.mapInPandas(run, schema)


def cosine_topk_arrow(
    candidates: DataFrame,
    vec_col: str,
    id_col: str,
    probes: list[tuple[int, list[float]]],
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors per probe via one matmul per Arrow batch.

    `probes` is a driver-side list of (probe_id, vector) — the bounded
    query batch, closure-captured like a broadcast. Each partition emits
    its LOCAL top-k per probe (k·|probes| rows, a combiner), and one
    window pass reduces to the global top-k — identical reduce shape to
    the expression form, so the shuffle stays proportional to
    |probes|·k·partitions, never the corpus.
    """
    pids = [int(p) for p, _ in probes]
    pmat = np.asarray([v for _, v in probes], dtype=np.float64)  # P×d
    pnorm = np.linalg.norm(pmat, axis=1)
    pnorm[pnorm == 0.0] = 1e-12

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)  # N×d
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0.0] = 1e-12
            cos = (cmat @ pmat.T) / np.outer(cnorm, pnorm)  # N×P
            out_pid, out_id, out_cos = [], [], []
            for j, pid in enumerate(pids):
                col = cos[:, j]
                mask = ids != pid  # exclude self
                col, cids = col[mask], ids[mask]
                if len(cids) == 0:
                    continue
                top = min(k, len(cids))
                # partial select then exact order: O(N + k log k) per probe
                idx = np.argpartition(-col, top - 1)[:top]
                order = np.lexsort((cids[idx], -col[idx]))
                sel = idx[order]
                out_pid.extend([pid] * len(sel))
                out_id.extend(cids[sel].tolist())
                out_cos.extend(col[sel].tolist())
            yield pd.DataFrame(
                {"probe_id": out_pid, "cand_id": out_id, "cos": out_cos}
            )

    local = candidates.select(id_col, vec_col).mapInPandas(
        score_batches, "probe_id long, cand_id long, cos double"
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("probe_id").orderBy(F.col("cos").desc(), F.col("cand_id").asc())
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("probe_id", F.col("cand_id").alias("vec_id"), "cos", "rk")
    )
