"""Property tests for the training-pipeline composition ops (sequence
packing, filter funnel, incremental corpus dedup) — semantics the DuckDB
oracle hash can't state directly (invariants, not values)."""

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.queries import training_ops as T

SF = "/root/testdata/sf0.001"


def test_sequence_pack_conservation(spark):
    """Every doc lands in exactly one sequence: packed token mass equals
    the corpus token mass, packed doc count equals the corpus doc count."""
    from end_to_end_azure_data_engineering_spark.functions import text as X
    from end_to_end_azure_data_engineering_spark.queries import load

    packed = T.sequence_pack(spark, SF).agg(
        F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("toks")
    ).first()
    d = load(spark, SF, "documents")
    raw = d.agg(
        F.count("*").alias("docs"),
        F.sum(X.token_count("text")).alias("toks"),
    ).first()
    assert packed.docs == raw.docs
    assert packed.toks == raw.toks


def test_sequence_pack_chunk_boundaries(spark):
    """A sequence's id equals its first doc's start-offset chunk: seq_ids
    within a (source, shard) are dense-ish and non-negative, and no doc
    count is zero."""
    rows = T.sequence_pack(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.seq_id >= 0
        assert r.n_docs >= 1
        assert r.seq_tokens >= 1


def test_funnel_is_monotone(spark):
    """Cumulative stages can only shrink the surviving set."""
    for r in T.quality_filter_funnel(spark, SF).collect():
        assert r.n_total >= r.n_len >= r.n_punct >= r.n_stop >= r.n_survive >= 0


def test_incremental_dedup_partitions_batch(spark):
    """new + self_dup + corpus_dup exactly partition the batch."""
    rows = T.corpus_incremental_dedup(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.n_self_dup + r.n_corpus_dup + r.n_new == r.n_batch


def test_embedding_norm_stats_bounds(spark):
    for r in T.embedding_norm_stats(spark, SF).collect():
        assert r.n_vecs >= 1
        assert 0.0 <= r.min_norm <= r.max_norm
        assert 0 <= r.n_degenerate <= r.n_vecs
