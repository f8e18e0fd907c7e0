"""Training-data pipeline composition ops — the corpus-preparation steps a
large-scale pretraining pipeline runs AFTER per-doc analysis: packing
documents into fixed-token-budget training sequences, a staged quality
filter funnel, incremental-batch dedup against an existing corpus, and
embedding sanity stats.

All pure Catalyst expressions; oracles generated from the same constants
as the Spark code (functions/text.py, functions/sketches.py,
functions/similarity.py) so the two sides cannot drift. Every output
column is integer or a per-row-deterministic scalar (min/max selection
over identical floats) — hash-stable by construction across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import similarity as V
from ..functions import text as X
from . import load, register, spread

#: documents per packing shard. Sequences never cross a shard boundary, so
#: every (source, shard) group is a BOUNDED window partition — the window
#: cumsum stays parallel at any corpus size (an unsharded per-source cumsum
#: would funnel each source through one task at 100 TB).
PACK_SHARD = 256
#: token budget per packed training sequence (concat-and-chunk semantics:
#: a sequence is the docs whose cumulative start offset falls in one
#: budget-sized chunk of the shard's token stream).
PACK_BUDGET = 128


@register(
    "sequence_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, doc_id // {PACK_SHARD} AS shard,
             {X.TOKEN_COUNT_SQL('text')} AS tok
      FROM documents
    ),
    offs AS (
      SELECT source, shard, tok,
             CAST(sum(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - tok AS BIGINT)
                 AS start_off
      FROM toks
    )
    SELECT source, shard, start_off // {PACK_BUDGET} AS seq_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS seq_tokens
    FROM offs
    GROUP BY source, shard, seq_id
    """,
)
def sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    within each (source, shard) the token streams of doc_id-ordered docs are
    concatenated and cut into PACK_BUDGET-token sequences; a doc belongs to
    the sequence its first token lands in. Deterministic integer math — no
    RNG, stable under re-partitioning — and the shard key bounds every
    window partition, so the cumsum never serializes a whole source through
    one task. Output: per-sequence doc count and token mass (fill/overflow
    diagnostics)."""
    d = spread(load(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id",
        "source",
        F.expr(f"doc_id div {PACK_SHARD}").alias("shard"),
        X.token_count("text").alias("tok"),
    )
    w = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = toks.withColumn("start_off", F.sum("tok").over(w) - F.col("tok"))
    return (
        offs.withColumn("seq_id", F.expr(f"start_off div {PACK_BUDGET}"))
        .groupBy("source", "shard", "seq_id")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("seq_tokens"))
    )


# funnel thresholds — shared between Spark expressions and the oracle SQL
MIN_TOKENS = 10
MAX_PUNCT_RATIO = 0.30
MIN_STOPWORD_RATIO = 0.03


@register(
    "quality_filter_funnel",
    oracle=f"""
    WITH scored AS (
      SELECT source,
             {X.TOKEN_COUNT_SQL('text')} >= {MIN_TOKENS} AS ok_len,
             {X.PUNCT_RATIO_SQL('text')} <= {MAX_PUNCT_RATIO} AS ok_punct,
             {X.STOPWORD_RATIO_SQL('text')} >= {MIN_STOPWORD_RATIO} AS ok_stop,
             {X.LANG_ID_SQL('text')} = lang AS ok_lang
      FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN ok_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
           CAST(sum(CASE WHEN ok_len AND ok_punct THEN 1 ELSE 0 END) AS BIGINT)
               AS n_punct,
           CAST(sum(CASE WHEN ok_len AND ok_punct AND ok_stop
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_stop,
           CAST(sum(CASE WHEN ok_len AND ok_punct AND ok_stop AND ok_lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_survive
    FROM scored
    GROUP BY source
    """,
)
def quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-filter survival funnel: per source, how many docs
    survive each cumulative stage (length → punctuation → stopword density
    → lang-id agreement with the tagged lang). One narrow map + one small
    agg keyed on source — the per-stage counts a pipeline operator watches
    to see WHICH filter is eating the corpus. Ratios are used only inside
    comparisons; every output is a count."""
    d = spread(load(spark, sf_dir, "documents"))
    ok_len = X.token_count("text") >= MIN_TOKENS
    ok_punct = X.punct_ratio("text") <= MAX_PUNCT_RATIO
    ok_stop = X.stopword_ratio("text") >= MIN_STOPWORD_RATIO
    ok_lang = X.lang_id("text") == F.col("lang")

    def cnt(cond) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    s1 = ok_len
    s2 = s1 & ok_punct
    s3 = s2 & ok_stop
    s4 = s3 & ok_lang
    return (
        d.select("source", s1.alias("s1"), s2.alias("s2"), s3.alias("s3"), s4.alias("s4"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            cnt(F.col("s1")).alias("n_len"),
            cnt(F.col("s2")).alias("n_punct"),
            cnt(F.col("s3")).alias("n_stop"),
            cnt(F.col("s4")).alias("n_survive"),
        )
    )


#: every 4th doc_id plays the "newly ingested batch"; the rest are the
#: standing corpus the batch is deduped against.
BATCH_MOD = 4


@register(
    "corpus_incremental_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, {X.FINGERPRINT_SQL('text')} AS fp
      FROM documents
    ),
    batch AS (
      SELECT doc_id, source, fp,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fp WHERE doc_id % {BATCH_MOD} = 0
    ),
    corpus AS (
      SELECT DISTINCT fp FROM fp WHERE doc_id % {BATCH_MOD} <> 0
    ),
    flagged AS (
      SELECT b.source,
             CASE WHEN b.rn > 1 THEN 'self_dup'
                  WHEN c.fp IS NOT NULL THEN 'corpus_dup'
                  ELSE 'new' END AS status
      FROM batch b LEFT JOIN corpus c USING (fp)
    )
    SELECT source,
           count(*) AS n_batch,
           CAST(sum(CASE WHEN status = 'self_dup' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_self_dup,
           CAST(sum(CASE WHEN status = 'corpus_dup' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corpus_dup,
           CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new
    FROM flagged
    GROUP BY source
    """,
)
def corpus_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest exact dedup: a new batch is deduped (a) within
    itself — first doc_id per content fingerprint wins — and (b) against
    the standing corpus's fingerprint set, and classified new / self-dup /
    corpus-dup per source. The corpus side is reduced to DISTINCT
    fingerprints before the join, so the shuffle carries 16-byte keys, not
    documents, and the join keys on the fingerprint — uniform by
    construction, no skew. This is the nightly-crawl-vs-lake dedup shape;
    at 100 TB the corpus fingerprint set is a bucketed table and this join
    is shuffle-free."""
    d = spread(load(spark, sf_dir, "documents"))
    fp = d.select("doc_id", "source", X.fingerprint("text").alias("fp"))
    is_batch = F.col("doc_id") % BATCH_MOD == 0
    batch = fp.filter(is_batch).withColumn(
        "rn",
        F.row_number().over(W.partitionBy("fp").orderBy("doc_id")),
    )
    corpus = fp.filter(~is_batch).select("fp").distinct()
    flagged = batch.join(
        corpus.withColumn("_in_corpus", F.lit(True)), "fp", "left"
    ).select(
        "source",
        F.when(F.col("rn") > 1, "self_dup")
        .when(F.col("_in_corpus"), "corpus_dup")
        .otherwise("new")
        .alias("status"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_batch"),
        F.sum(F.when(F.col("status") == "self_dup", 1).otherwise(0)).alias("n_self_dup"),
        F.sum(F.when(F.col("status") == "corpus_dup", 1).otherwise(0)).alias(
            "n_corpus_dup"
        ),
        F.sum(F.when(F.col("status") == "new", 1).otherwise(0)).alias("n_new"),
    )


@register(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label,
           count(*) AS n_vecs,
           round(min(sqrt({V.DOT_SQL('embedding', 'embedding')})), 6)
               AS min_norm,
           round(max(sqrt({V.DOT_SQL('embedding', 'embedding')})), 6)
               AS max_norm,
           CAST(sum(CASE WHEN sqrt({V.DOT_SQL('embedding', 'embedding')}) < 1e-6
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity screen: per label, L2-norm extremes and the count of
    degenerate (near-zero) vectors — the cheap check that catches a broken
    embedding job before ANN indexing spends a cluster on it. The unrolled
    fixed-dim dot (see functions/similarity.py) keeps the norm inside
    whole-stage codegen; min/max are selection (order-independent), so the
    floats hash identically cross-engine."""
    e = spread(load(spark, sf_dir, "embeddings"))
    nrm = F.sqrt(V.dot("embedding", "embedding", V.EMB_DIM))
    return (
        e.select("label", nrm.alias("_n"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.min("_n"), 6).alias("min_norm"),
            F.round(F.max("_n"), 6).alias("max_norm"),
            F.sum(F.when(F.col("_n") < 1e-6, 1).otherwise(0)).alias("n_degenerate"),
        )
    )
