"""End-to-end pipeline benchmark coverage (VERDICT r3 item 5).

Runs the full pl_master-equivalent — ingestion → silver ×11 → gold ×7
through the DagRunner — on TPC-H-derived banking bronze at sf0.001, and
asserts (a) every stage lands, (b) the audit-derived per-stage breakdown is
complete, and (c) the scheduler measurably overlapped the 22 independent
ingestion stages (parallel_speedup > 1), which is the evidence the DAG
runner's 10-wide ForEach actually runs stages concurrently rather than
serializing them.
"""

from __future__ import annotations

import pytest

from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
from end_to_end_azure_data_engineering_spark.plans.pipeline_bench import (
    run_pipeline_benchmark,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bench_result(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bench_wh"))
    result = run_pipeline_benchmark(spark, SF_DIR, root)
    return result, Warehouse(spark, root)


def test_all_stages_complete(bench_result):
    result, _ = bench_result
    # 9 per-bank entities × 2 feeds + 2 single feeds
    assert len(result["stages"]["ingestion"]) == 20
    assert len(result["stages"]["silver"]) == 11
    assert len(result["stages"]["gold"]) == 7
    assert result["pipeline_total"] > 0
    assert result["pipeline_total"] == pytest.approx(
        sum(result["phases"].values()), abs=0.01
    )


def test_ingestion_parallelism_overlaps(bench_result):
    """22 independent full loads through a 10-wide pool must overlap: the
    sum of audited stage walls has to exceed the phase wall."""
    result, _ = bench_result
    assert result["parallel_speedup"]["ingestion"] > 1.3
    # gold: 4 dims run in parallel before the 3 facts
    assert result["parallel_speedup"]["gold"] > 1.0


def test_warehouse_contents_scale_with_sf(bench_result, spark):
    _, wh = bench_result
    # orders at sf0.001 = 1500 → every order becomes one transaction;
    # SCD2 keeps all current
    txn = wh.read("silver", "transactions")
    assert txn.filter("is_current").count() == 1500
    # 150 customers split across the two banks by key parity
    cust = wh.read("silver", "customers")
    assert cust.filter("is_current").count() == 150
    # gold facts carry current AND non-quarantined rows only (current_valid)
    fact = wh.read("gold", "fact_transaction")
    clean = txn.filter("is_current AND NOT is_quarantined").count()
    assert fact.count() == clean > 0


def test_quarantine_rules_fired_at_scale(bench_result):
    """The derived bronze injects dirty rows (IN/OUT direction, bad
    currency, null amounts) — the silver quarantine flags must be set, not
    dropped."""
    result, wh = bench_result
    txn = wh.read("silver", "transactions")
    n_quarantined = txn.filter("is_quarantined AND is_current").count()
    assert n_quarantined > 300  # ≥30% direction-vocabulary violations alone
    assert txn.filter("NOT is_quarantined AND is_current").count() > 0
