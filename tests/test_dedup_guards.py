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
