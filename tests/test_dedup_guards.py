"""The all-pairs ground-truth evals must fail fast past their documented
cap instead of launching a quadratic self-join (VERDICT r3 item 2: the
bound has to live in code, not in a docstring)."""

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.queries import dedup_ops
from end_to_end_azure_data_engineering_spark.queries.dedup_ops import (
    assert_bounded_slice,
)

SF_DIR = "/root/testdata/sf0.001"


def test_guard_passes_at_cap(spark):
    df = spark.range(10)
    # == cap is allowed; the helper returns the frame unchanged
    assert assert_bounded_slice(df, "t", cap=10) is df


def test_guard_trips_past_cap(spark):
    df = spark.range(11)
    with pytest.raises(ValueError, match="quadratic.*capped at 10"):
        assert_bounded_slice(df, "t", cap=10)


def test_guard_cost_is_o_cap_not_o_corpus(spark):
    # A frame far larger than the cap still fails fast: limit(cap+1)
    # short-circuits, so the guard never scans the full corpus.
    df = spark.range(10_000_000)
    with pytest.raises(ValueError):
        assert_bounded_slice(df, "t", cap=100)


@pytest.mark.parametrize(
    "query",
    [
        dedup_ops.dedup_simhash_pairs,
        dedup_ops.dedup_ngram_jaccard,
        dedup_ops.lsh_recall_eval,
    ],
)
def test_eval_queries_wired_to_guard(spark, query, monkeypatch):
    # With the module cap forced below the sf0.001 'de' slice (71 rows),
    # each guarded query must refuse to run — proving the guard sits in
    # the real code path, not just in the helper.
    monkeypatch.setattr(dedup_ops, "EXACT_EVAL_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="capped at 10"):
        query(spark, SF_DIR).collect()


def test_eval_queries_still_run_under_cap(spark):
    # Default cap (50k) comfortably admits the sf0.001 slice; results flow.
    out = dedup_ops.dedup_simhash_pairs(spark, SF_DIR)
    assert out.columns == ["doc_a", "doc_b", "hamming"]
    assert out.count() >= 0


def _cached_rdd_ids(spark) -> set[int]:
    return {i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()}


def test_release_checkpoints_returns_block_count_to_baseline(spark):
    """r4 verdict item 7: repeated near_dup_pairs calls retain
    checkpointed pair blocks until driver GC. release_checkpoints must
    free them deterministically — every block the test created is gone
    after release. Asserted on the ids of OUR blocks, not the global
    storage-info count: Spark's async ContextCleaner (and other fixtures'
    lingering cached RDDs) can move the global count between reads,
    making an exact-equality baseline order-dependent (r5 advice)."""
    import time

    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        near_dup_pairs,
        release_checkpoints,
    )
    from end_to_end_azure_data_engineering_spark.queries import load

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    before = _cached_rdd_ids(spark)
    frames = []
    for _ in range(3):
        p = near_dup_pairs(docs, "doc_id", "text", threshold=0.2)
        assert p.count() > 0
        frames.append(p)
    created = _cached_rdd_ids(spark) - before
    assert created  # the leak the helper exists to fix
    for p in frames:
        release_checkpoints(p)
    deadline = time.time() + 30.0
    while _cached_rdd_ids(spark) & created and time.time() < deadline:
        time.sleep(0.2)
    assert not (_cached_rdd_ids(spark) & created)


def test_release_checkpoints_sees_through_derived_plans(spark):
    """The helper must find the LogicalRDD leaf under projections/filters
    added on top of the checkpointed frame (callers rarely hold the raw
    checkpoint handle)."""
    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        release_checkpoints,
    )

    import time

    before = _cached_rdd_ids(spark)
    ck = spark.range(1000).selectExpr("id", "id * 2 AS y").localCheckpoint()
    assert ck.count() == 1000
    derived = ck.filter(F.col("y") > 10).select("id")
    created = _cached_rdd_ids(spark) - before
    assert created
    release_checkpoints(derived)
    deadline = time.time() + 30.0
    while _cached_rdd_ids(spark) & created and time.time() < deadline:
        time.sleep(0.2)
    assert not (_cached_rdd_ids(spark) & created)
