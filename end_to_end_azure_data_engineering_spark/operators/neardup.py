"""Near-duplicate detection + corpus dedup as a reusable operator API.

The query layer (queries/dedup_ops.py) exposes these same pipelines for the
driver's oracle gate; this module is the surface an engine user calls:

    pairs  = near_dup_pairs(docs, "doc_id", "text", threshold=0.8)
    labels = assign_components(pairs)
    clean  = dedup_corpus(docs, "doc_id", "text", threshold=0.8)

Scale shape (same as the verified queries): shingle/minhash are per-row
maps; candidate generation shuffles on the LSH band key only (collision-
bound, never corpus²); verification joins run on doc_id; clustering is
min-label propagation with checkpointed lineage; the final dedup is a
left-semi join on the canonical survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import sketches as S
from .dedup import connected_components


def near_dup_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Verified near-duplicate pairs (id_a < id_b, exact shingle-Jaccard ≥
    threshold) via MinHash+LSH banding. Columns: id_a, id_b, jaccard.

    EAGER: calling this runs the full shingle/LSH job immediately (the
    returned frame is a ``localCheckpoint`` of the verified pairs, not a
    lazy plan) — the price of releasing the corpus-sized shingle cache
    deterministically instead of leaking it per call. The checkpointed
    pair blocks (collision-bound, small) live until the returned DataFrame
    is garbage-collected; callers holding many pair frames long-term should
    ``unpersist()`` each when done with it.
    """
    scored, sh = _candidate_pairs_with_shingles(docs, id_col, text_col)
    jac = S.jaccard(F.col("sh_a"), F.col("sh_b"))
    pairs = (
        scored
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
        # materialize the (collision-bound, small) verified pairs, then
        # RELEASE the corpus-sized shingle cache deterministically: leaving
        # it persisted leaked one corpus of shingle arrays per call, and the
        # accumulated block-manager pressure progressively slowed every
        # later query in a long-lived session (2.5x run-to-run variance on
        # the downstream connected-components measured before this fix).
        .localCheckpoint()
    )
    sh.unpersist()
    return pairs


def near_dup_pairs_against(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Verified near-dup pairs with AT LEAST ONE endpoint in ``batch``
    (columns id_a < id_b, jaccard) — the incremental-ingest mining path:
    candidate generation joins the BATCH's band rows against the corpus's
    band rows, so the pair space explored is O(batch x collisions), never
    corpus x corpus, and old-old pairs are never re-examined. In
    production the corpus-side shingle/band frame is the standing
    signatures table maintained by ingestion; this self-contained form
    recomputes it from ``corpus`` (one pass). ``batch`` rows must also be
    present in ``corpus`` (so batch-batch pairs verify). Same
    eager/unpersist contract as near_dup_pairs."""
    sh = (
        S.staged_word_shingles(
            corpus.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")),
            "_text",
        )
        .drop("_text")
        .persist()
    )
    mh = sh.select("_id", S.minhash_signature(F.col("sh")).alias("mh"))
    bands = mh.select("_id", F.explode(S.band_signatures(F.col("mh"))).alias("band"))
    batch_ids = batch.select(F.col(id_col).alias("_id")).distinct()
    bands_batch = bands.join(batch_ids, "_id")
    cands = (
        bands_batch.select(F.col("_id").alias("bid"), "band")
        .join(bands.select(F.col("_id").alias("cid"), "band"), "band")
        .filter(F.col("bid") != F.col("cid"))
        .select(
            F.least("bid", "cid").alias("id_a"),
            F.greatest("bid", "cid").alias("id_b"),
        )
        .distinct()
    )
    jac = S.jaccard(F.col("sh_a"), F.col("sh_b"))
    pairs = (
        cands.join(sh.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .filter(jac >= threshold)
        .select("id_a", "id_b", jac.alias("jaccard"))
        .localCheckpoint()
    )
    sh.unpersist()
    return pairs


def _candidate_pairs_with_shingles(docs, id_col, text_col):
    """LSH candidate pairs joined back to both shingle arrays. Returns
    (candidates with sh_a/sh_b, the persisted shingle frame) — the caller
    scores/filters, then MUST unpersist the shingle frame after
    materializing (see near_dup_pairs)."""
    sh = (
        S.staged_word_shingles(
            docs.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")),
            "_text",
        )
        .drop("_text")
        .persist()
    )
    mh = sh.select("_id", S.minhash_signature(F.col("sh")).alias("mh"))
    bands = mh.select("_id", F.explode(S.band_signatures(F.col("mh"))).alias("band"))
    cands = (
        bands.select(F.col("_id").alias("id_a"), "band")
        .join(bands.select(F.col("_id").alias("id_b"), "band"), "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    scored = cands.join(
        sh.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a"
    ).join(sh.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    return scored, sh


def containment_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs scored by ASYMMETRIC containment (|A∩B|/|A| and
    |A∩B|/|B|), kept when either direction ≥ threshold — catches a short
    document quoted inside a long one, which Jaccard dilutes below any
    usable threshold. Candidates come from the same minhash-LSH banding as
    near_dup_pairs (collision-bound, never corpus²); note the standard
    caveat that Jaccard-tuned bands under-recall extreme small-in-large
    pairs — a dedicated containment index (prefix filtering) is the
    specialist alternative at 100 TB. Same eager/unpersist contract as
    near_dup_pairs."""
    scored, sh = _candidate_pairs_with_shingles(docs, id_col, text_col)
    c_ab = S.containment(F.col("sh_a"), F.col("sh_b"))
    c_ba = S.containment(F.col("sh_b"), F.col("sh_a"))
    pairs = (
        scored.withColumn("c_ab", c_ab)
        .withColumn("c_ba", c_ba)
        .filter((F.col("c_ab") >= threshold) | (F.col("c_ba") >= threshold))
        .select("id_a", "id_b", "c_ab", "c_ba")
        .localCheckpoint()
    )
    sh.unpersist()
    return pairs


def assign_components(pairs: DataFrame) -> DataFrame:
    """Cluster verified pairs into components. Columns: node, label
    (label = min id in the component = the canonical survivor)."""
    return connected_components(pairs, "id_a", "id_b")


def dedup_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Return docs minus non-canonical near-duplicates: for every duplicate
    cluster the min-id doc survives; docs in no cluster pass through.
    One anti-join against the (small) non-survivor set."""
    pairs = near_dup_pairs(docs, id_col, text_col, threshold)
    comp = assign_components(pairs)
    losers = comp.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
