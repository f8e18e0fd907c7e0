"""Keyed dedup operators — SURVEY §2.4 A3/A5, §2.5 W1.

``keep_latest`` is the reference's batch dedup (row_number over
partitionBy(business_key) orderBy(recency desc_nulls_last) == 1;
4_silver/silver_transactions.py:106-116). It is also the mandatory
pre-MERGE compaction (Delta MERGE forbids duplicate source matches).

Deterministic by construction: callers supply a total order (append a
unique tiebreak column). One shuffle on the key — at scale this
partitioning is reused by the downstream merge join.

``distinct_by_key`` reproduces A5 (dropDuplicates([key]); arbitrary
survivor) — kept for parity, but engine code paths use keep_latest, the
deviation SURVEY §2.4 documents for silver_fx_rates.py:67-68.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W
from ..engine.pin import pin as _pin


def keep_latest(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_by_recency(df: DataFrame, keys: list[str], recency_cols: list[str]) -> DataFrame:
    """W1 with the reference's desc_nulls_last recency ordering."""
    return keep_latest(df, keys, [F.col(c).desc_nulls_last() for c in recency_cols])


def distinct_by_key(df: DataFrame, keys: list[str]) -> DataFrame:
    return df.dropDuplicates(keys)


def connected_components(
    edges, src: str = "src", dst: str = "dst", max_iter: int = 20
):
    """Connected components by min-label propagation with pointer doubling.

    Every node starts labeled with itself; each round adopts the minimum of
    (its label, its neighbors' labels, its label's label). The
    label-of-label hop halves the remaining distance to the component
    minimum each round, so convergence is O(log diameter) rounds instead of
    O(diameter) — a path of 1M nodes settles in ~20 rounds, not 1M. This is
    the property that makes the operator survive 100 TB corpora whose
    near-dup graphs contain long chains.

    The dedup-clustering step after near-dup pair generation: pairs →
    components → canonical doc = component min. Each round is two shuffles
    on the node key; `localCheckpoint` truncates lineage so plans stay O(1)
    per round (at cluster scale, use reliable checkpointing instead).

    Convergence is detected by an unchanged sum of xxhash64(label) — one
    cheap aggregation per round, correct for ANY node id type (the previous
    raw label-sum returned NULL for string/UUID ids and silently broke
    after one round; min-propagation only ever shrinks labels, so any
    change perturbs the hash multiset). Raises RuntimeError if labels are
    still changing after ``max_iter`` rounds rather than returning
    partially-propagated (wrong) labels.
    """
    from pyspark.sql import functions as F

    # Every localCheckpoint pins blocks in the executor block manager for
    # the session's lifetime; an iterative operator that never frees them
    # degrades every LATER query in a long-lived session (GC pressure +
    # storage eviction). Snapshot the persistent-RDD set on entry and free
    # everything this call created — except the final labels, which back
    # the returned DataFrame — before returning.
    sc = edges.sparkSession.sparkContext

    def _persistent_ids() -> set:
        try:
            return set(sc._jsc.getPersistentRDDs().keys())
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            return set()

    before_ids = _persistent_ids()

    # materialize the edge list once — the upstream pair generation (minhash
    # banding or any near-dup join) must not be recomputed every round
    bidir = (
        edges.select(F.col(src).alias("_n"), F.col(dst).alias("_m"))
        .unionByName(edges.select(F.col(dst).alias("_n"), F.col(src).alias("_m")))
        .transform(_pin)
    )
    labels = (
        bidir.select(F.col("_n").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .transform(_pin)
    )
    hash_sum = labels.agg(F.sum(F.xxhash64("label").cast("decimal(38,0)"))).first()[0]
    converged = False
    for rnd in range(max_iter):
        # min label among neighbors
        nbr = bidir.join(
            labels.withColumnRenamed("node", "_m"), "_m"
        ).select(F.col("_n").alias("node"), "label")
        parts = labels.unionByName(nbr)
        if rnd > 0:
            # pointer doubling: adopt the label of your label (labels are
            # always node ids, so the lookup is total). Skipped in round 1
            # where labels are the identity and the hop is a no-op join.
            hop = labels.join(
                labels.select(
                    F.col("node").alias("label"), F.col("label").alias("_lol")
                ),
                "label",
            ).select("node", F.col("_lol").alias("label"))
            parts = parts.unionByName(hop)
        labels = (
            parts.groupBy("node")
            .agg(F.min("label").alias("label"))
            .transform(_pin)
        )
        new_sum = labels.agg(F.sum(F.xxhash64("label").cast("decimal(38,0)"))).first()[0]
        if new_sum == hash_sum:
            converged = True
            break
        hash_sum = new_sum
    # free every checkpoint this call created except the newest (the final
    # labels — lineage is truncated, so its blocks must survive until the
    # caller consumes the result)
    try:
        ours = sorted(_persistent_ids() - before_ids)
        jmap = sc._jsc.getPersistentRDDs()
        for rid in ours[:-1]:
            rdd = jmap.get(rid)
            if rdd is not None:
                rdd.unpersist()
    except Exception:  # noqa: BLE001 — cleanup is best-effort
        pass
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "labels would be partially propagated — raise max_iter"
        )
    return labels
