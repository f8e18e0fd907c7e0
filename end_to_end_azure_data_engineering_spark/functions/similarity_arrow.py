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
differ in the last ulp and equal-score ties may swap. That is why this path
backs NO oracle query — `tests/test_similarity_arrow.py` asserts parity
against the expression form with an explicit tolerance instead. Use the
expression kernels wherever bit-reproducibility is part of the contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
