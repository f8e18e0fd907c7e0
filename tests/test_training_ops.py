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


def test_mixture_plan_invariants(spark):
    """Sampling respects the plan: sampled ⊆ corpus, a fully-taken source
    (rate 100) keeps everything, and targets sum to ≤ the budget."""
    rows = T.corpus_mixture_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.rate_pct <= 100
        assert 0 <= r.n_sampled_docs <= r.n_docs
        assert 0 <= r.sampled_tokens <= r.total_tokens
        assert r.target_tokens >= 0
        if r.rate_pct == 100:
            assert r.n_sampled_docs == r.n_docs
            assert r.sampled_tokens == r.total_tokens
    # floor division can only under-shoot the budget
    assert sum(r.target_tokens for r in rows) <= T.MIX_BUDGET_TOKENS


def test_mixture_plan_deterministic(spark):
    """Hash sampling is RNG-free: two runs agree row-for-row."""
    a = sorted(map(tuple, T.corpus_mixture_plan(spark, SF).collect()))
    b = sorted(map(tuple, T.corpus_mixture_plan(spark, SF).collect()))
    assert a == b


def test_cross_source_overlap_symmetric_and_bounded(spark):
    """Each unordered pair appears once (a < b) and the shared-fp count
    can't exceed either side's distinct-prefix count."""
    from end_to_end_azure_data_engineering_spark.queries import load

    rows = T.cross_source_overlap(spark, SF).collect()
    per_source = {
        r.source: r.n
        for r in load(spark, SF, "documents")
        .select("source", F.md5(F.array_join(F.slice(
            __import__("end_to_end_azure_data_engineering_spark.functions.text", fromlist=["tokens"]).tokens("text"),
            1, T.OVERLAP_PREFIX), " ")).alias("fp"))
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    seen = set()
    for r in rows:
        assert r.source_a < r.source_b
        assert (r.source_a, r.source_b) not in seen
        seen.add((r.source_a, r.source_b))
        assert 1 <= r.n_shared_fps <= min(per_source[r.source_a], per_source[r.source_b])


def test_token_length_histogram_partitions_corpus(spark):
    """Buckets partition the corpus: doc counts and token mass reconcile
    with the raw per-source totals."""
    from end_to_end_azure_data_engineering_spark.functions import text as X
    from end_to_end_azure_data_engineering_spark.queries import load

    hist = {
        (r.source, r.len_bucket): r
        for r in T.token_length_histogram(spark, SF).collect()
    }
    raw = load(spark, SF, "documents").groupBy("source").agg(
        F.count("*").alias("docs"), F.sum(X.token_count("text")).alias("toks")
    ).collect()
    for s in raw:
        rows = [v for (src, _), v in hist.items() if src == s.source]
        assert sum(r.n_docs for r in rows) == s.docs
        assert sum(r.bucket_tokens for r in rows) == s.toks
