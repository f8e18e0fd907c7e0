"""Plan-regression guards — the PLANS.md design rules as executable tests.

Builds the physical plan of EVERY registered query at sf0.001 and asserts
the scale invariants hold:

  1. no CartesianProduct anywhere;
  2. BroadcastNestedLoopJoin only where a bounded build side justifies it
     (explicit allowlist — the exhaustive ground-truth evals, the banded
     range join, and broadcast 1-row scalar aggregates);
  3. no row-at-a-time Python UDFs (BatchEvalPython) in any plan — the
     zero-UDF rule; Arrow-batched mapInPandas is the one sanctioned
     Python path (multimodal decode);
  4. no single-partition window outside the two documented bounded curves.

A new query that violates a rule fails HERE with its name, instead of
surfacing as a mystery regression in a future round's bench tail.
"""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as ent

SF_DIR = "/root/testdata/sf0.001"

# BNLJ is legitimate only where the docstring pins a bounded side:
BNLJ_ALLOWED = {
    "ann_bruteforce_topk",      # exhaustive by spec (the recall baseline)
    "hard_negative_mining",     # same broadcast 5-probe exhaustive scan
    "dedup_simhash_pairs",      # guarded all-pairs ground truth (capped)
    "dedup_ngram_jaccard",      # guarded all-pairs ground truth (capped)
    "lsh_recall_eval",          # consumes the exhaustive baseline above
    "range_join_price_bands",   # theta join against a 9-row band table
    "embedding_quantization_stats",  # broadcast scalar-aggregate crossjoin
    "temperature_mixture_weights",   # broadcast 1-row total crossjoin
    "forecast_revenue_change",       # broadcast scalar aggregates
    "top_supplier_revenue",          # broadcast scalar max (the r3 fix)
    "corpus_mixture_plan",           # broadcast 1-row weight normalizer
    "funnel_conversion",             # three broadcast 1-row stage counts
    "vocab_coverage",                # broadcast corpus-total scalar
    "vocab_growth_curve",            # broadcast 1-row max-doc-id scalar
    "bigram_lift",                   # broadcast 1-row corpus-totals scalar
    "cross_source_overlap",          # broadcast per-source totals (~20 rows)
    "promo_revenue_pct",             # broadcast scalar ratio denominator
    "lsh_bucket_stats",              # broadcast 1-row corpus total
    "minhash_band_candidates",       # broadcast 1-row candidate total
    "important_part_value",          # broadcast scalar threshold subquery
    "priority_share_drift",          # broadcast 1-row grand-total scalar
    "revenue_pareto_curve",          # broadcast 1-row revenue total
    "ab_assignment_lift",            # two 1-row arm frames crossjoined
    "referential_integrity_audit",   # three 1-row audit counts crossjoined
    "label_balance_weights",         # broadcast 1-row total/k scalars
    "embedding_top_eigen_power",     # broadcast 1-row Rayleigh/max scalars
    "scalar_subquery_below_avg",     # broadcast scalar average
    "not_exists_rich_inactive",      # broadcast scalar avg-balance crossjoin
    "tfidf_top_terms",               # broadcast scalar corpus doc count
    "fuzzy_name_match",              # broadcast bounded dim, ±1 length band
    "rfm_segmentation",              # broadcast 9-scalar quartile boundaries
    "embedding_coverage_audit",      # broadcast 1-row orphan-count crossjoin
    "divergence_top_terms",          # two broadcast 1-row split totals
}

# the documented bounded global-window curves (PLANS.md inventory):
# cumulative_distinct_users runs over one row per DAY; vocab_coverage and
# tfidf_top_terms rank/accumulate over the (vocabulary-bound) term frame
GLOBAL_WINDOW_ALLOWED = {
    "cumulative_distinct_users",
    "vocab_coverage",
    "tfidf_top_terms",
    "vocab_growth_curve",  # cumsum over the 10-row decile frame only
    "zipf_rank_freq",      # rank over the vocabulary-bound frequency frame
    "revenue_mom_growth",  # lag over one row per calendar month
    "user_activity_gini",      # rank over one row per user (reduction)
    "orders_backlog_timeline",  # running sum over one row per day
    "revenue_pareto_curve",     # ntile over the 2k-row part reduction
    "daily_revenue_trend",      # centered MA over one row per day
    "peak_concurrent_sessions",  # running sum over one row per minute
}


@pytest.fixture(scope="module")
def plans(spark):
    from end_to_end_azure_data_engineering_spark.queries.lazy_stages import (
        lazy_stages,
    )

    out = {}
    # the lazy twins of eagerly-checkpointed mining stages run through the
    # SAME rule set: without them the audited plan of e.g.
    # minhash_containment_pairs is just a checkpoint scan and the banding
    # hot path sits outside this fence (r4 verdict item 2)
    for name, fn in {**ent.queries(), **lazy_stages()}.items():
        # executedPlan (unexecuted: the AQE initial plan) — NOT sparkPlan,
        # which is pre-EnsureRequirements and contains no Exchange nodes,
        # silently blinding the single-partition-window guard
        out[name] = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not offenders, offenders


def test_bnlj_only_where_bounded(plans):
    offenders = [
        n for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert not offenders, offenders


def test_no_row_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_global_windows_only_documented(plans):
    offenders = [
        n for n, p in plans.items()
        if re.search(r"Exchange SinglePartition", p)
        and "Window" in p
        and n not in GLOBAL_WINDOW_ALLOWED
    ]
    assert not offenders, offenders


def test_no_inferred_hof_generate_filters(plans):
    """InferFiltersFromGenerate + filter pushdown can inline an expensive
    higher-order-function array expression into a `size(...) > 0` Filter
    below the explode — silently re-evaluating the whole HOF once more per
    input row (measured ~2-4x on ngram_novelty / kmeans before switching
    those to explode_outer). Guard: no Filter condition may both call a
    lambda and test size(...) > 0."""
    offenders = [
        n for n, p in plans.items()
        if re.search(r"Filter .*size\([^\n]*lambdafunction[^\n]*> 0", p)
    ]
    assert not offenders, offenders


def test_eager_stage_plans_expose_real_mining_work(plans):
    """The lazy twins must show the actual mining joins/exchanges that the
    eager localCheckpoint hides from the query's own plan — if a stage
    plan collapses to a scan (0 joins), the fence has gone blind again."""
    stage_names = [n for n in plans if ":" in n]
    assert stage_names, "lazy_stages registry is empty"
    for n in stage_names:
        p = plans[n]
        assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p), (
            f"{n}: no join in the stage plan — audit is blind"
        )
    # the LSH band exchange (or its broadcast form at tiny SF) must appear
    # in every minhash-banding stage
    for n in (
        "dedup_minhash_lsh:mine",
        "minhash_containment_pairs:mine",
        "incremental_components_merge:mine",
    ):
        assert "band" in plans[n], f"{n}: band join not visible"
