"""End-to-end curation funnel (operators/curation.py): monotone survival,
determinism, and stage semantics on the real documents table plus planted
duplicates."""

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.operators.curation import CurationReport, curate_corpus
from end_to_end_azure_data_engineering_spark.queries import load

SF = "/root/testdata/sf0.001"


def test_funnel_monotone_and_deterministic(spark):
    d = load(spark, SF, "documents")
    r1, r2 = CurationReport(), CurationReport()
    out1 = curate_corpus(d, sample_pct=60, near_dup_threshold=0.5, report=r1)
    out2 = curate_corpus(d, sample_pct=60, near_dup_threshold=0.5, report=r2)

    counts = [n for _, n in r1.stages]
    assert counts == sorted(counts, reverse=True)  # funnel only shrinks
    assert r1.stages == r2.stages  # deterministic accounting
    assert sorted(r.doc_id for r in out1.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )
    assert r1.stages[0][0] == "input" and r1.stages[-1][0] == "sample_60pct"


def test_planted_duplicates_removed(spark):
    base = load(spark, SF, "documents").limit(50)
    twins = base.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    planted = base.unionByName(twins)
    report = CurationReport()
    out = curate_corpus(planted, near_dup_threshold=0.9, report=report)
    kept = {r.doc_id for r in out.select("doc_id").collect()}
    # exact dedup keeps the min-id copy of every twin pair
    assert all(k < 1_000_000 for k in kept)
    stages = report.as_dict()
    assert stages["exact_dedup"] <= stages["quality"] // 2


def test_near_dup_pairs_against_equals_filtered_full_mine(spark):
    """Batch-vs-corpus mining returns exactly the full-mine pairs that
    touch the batch — the incremental path loses nothing and adds
    nothing."""
    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.operators.neardup import (
        near_dup_pairs,
        near_dup_pairs_against,
    )
    from end_to_end_azure_data_engineering_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    full = near_dup_pairs(docs, "doc_id", "text", threshold=0.2)
    expected = {
        (r.id_a, r.id_b)
        for r in full.filter(
            (F.col("id_a") % 4 == 0) | (F.col("id_b") % 4 == 0)
        ).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in near_dup_pairs_against(
            batch, docs, "doc_id", "text", threshold=0.2
        ).collect()
    }
    assert got == expected and expected  # non-trivial fixture
