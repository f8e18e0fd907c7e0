"""Skew-resilience evidence for the gold fact-side joins (VERDICT r3 item 6).

The fact_transaction build joins the (large, possibly skewed) transaction
frame to the accounts dim. Two defenses exist, and this file demonstrates
both against a deliberately skewed fixture — one account_key holding ~30%
of all transactions:

1. **Broadcast immunity** (the shipped path, `plans/gold.py:83`): the dim
   side is broadcast, so there is NO shuffle on account_key at all — a hot
   key cannot concentrate in one reducer because rows never move. Asserted
   from the executed plan: BroadcastHashJoin present, zero exchanges on the
   probe side's join key, and the hot key's rows survive intact.

2. **AQE skew-split** (the path a 100 TB accounts dim would take once it
   outgrows broadcast): the same join shape without the broadcast hint,
   with thresholds scaled down to fixture size, must show Spark's runtime
   skew mitigation (`skew=true` on the sort-merge join) splitting the hot
   partition. This is the engine-level guarantee VERDICT r3 asked to see
   exercised rather than assumed from `spark.sql.adaptive.skewJoin.enabled`.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
from end_to_end_azure_data_engineering_spark.plans.gold import (
    build_fact_dispute,
    build_fact_settlement,
    build_fact_transaction,
)

N_TXN = 60_000
HOT_FRACTION = 0.3
N_ACCT = 2_000
N_SETTLE = 30_000
N_DISPUTE = 20_000


def _skewed_silver(spark, root: str) -> Warehouse:
    """silver.transactions with ~30% of rows on ACC0000000000; accounts dim
    with one row per account."""
    wh = Warehouse(spark, root)
    i = F.col("id")
    hot = i % 10 < int(HOT_FRACTION * 10)  # 3 of every 10 rows → hot key
    acct_num = F.when(hot, F.lit(0)).otherwise(i % N_ACCT)
    txn = spark.range(N_TXN).select(
        F.concat(F.lit("TXN"), F.lpad(i.cast("string"), 12, "0")).alias("transaction_key"),
        F.concat(F.lit("TXN"), F.lpad(i.cast("string"), 12, "0")).alias("transaction_id"),
        F.concat(F.lit("ACC"), F.lpad(acct_num.cast("string"), 10, "0")).alias("account_key"),
        F.concat(F.lit("ACC"), F.lpad(acct_num.cast("string"), 10, "0")).alias("account_id"),
        F.lit(None).cast("string").alias("merchant_key"),
        F.lit(None).cast("string").alias("merchant_id"),
        F.lit(None).cast("string").alias("counterparty_key"),
        F.lit(None).cast("string").alias("counterparty_id"),
        F.lit(dt.datetime(2024, 1, 1)).alias("booking_ts"),
        F.lit(dt.datetime(2024, 1, 2)).alias("value_ts"),
        (i % 997).cast("double").alias("amount"),
        F.lit("EUR").alias("currency"),
        F.lit("DEBIT").alias("direction"),
        F.lit("POS").alias("channel"),
        F.lit("PAYMENT").alias("txn_type"),
        F.lit("BOOKED").alias("status"),
        F.lit("bank_a").alias("source_system"),
        F.lit(True).alias("is_current"),
        F.lit(False).alias("is_quarantined"),
        # incompressible padding so the skewed partition's shuffle bytes
        # exceed the (scaled-down) AQE threshold in the no-broadcast test —
        # a constant pad compresses to nothing and defeats skew detection
        F.concat(F.sha2(i.cast("string"), 256), F.sha2((i + 1).cast("string"), 256)).alias("_pad"),
    )
    acct = spark.range(N_ACCT).select(
        F.concat(F.lit("ACC"), F.lpad(i.cast("string"), 10, "0")).alias("account_key"),
        F.concat(F.lit("CUST"), F.lpad(i.cast("string"), 9, "0")).alias("customer_key"),
        F.lit(True).alias("is_current"),
        F.lit(False).alias("is_quarantined"),
    )
    # settlements/disputes: ~30% of rows reference ONE hot transaction —
    # skew lands on the transaction_key shuffle of the two-hop join
    # (VERDICT r4 item 8: fact_settlement/fact_dispute share _two_hop's
    # machinery but had no skew evidence)
    hot_s = i % 10 < int(HOT_FRACTION * 10)
    txn_num = F.when(hot_s, F.lit(0)).otherwise(i % N_TXN)
    tkey = F.concat(F.lit("TXN"), F.lpad(txn_num.cast("string"), 12, "0"))
    settle = spark.range(N_SETTLE).select(
        F.concat(F.lit("SET"), F.lpad(i.cast("string"), 12, "0")).alias("settlement_key"),
        F.concat(F.lit("SET"), F.lpad(i.cast("string"), 12, "0")).alias("settlement_id"),
        tkey.alias("transaction_key"),
        tkey.alias("transaction_id"),
        F.lit(dt.date(2024, 1, 3)).alias("settlement_date"),
        (i % 991).cast("double").alias("settled_amount"),
        F.lit("EUR").alias("currency"),
        F.lit(1.0).alias("fx_rate_used"),
        F.lit(0.5).alias("fees"),
        F.lit("SETTLED").alias("settlement_status"),
        F.lit("bank_a").alias("source_system"),
        F.lit(False).alias("is_quarantined"),
        F.concat(F.sha2(i.cast("string"), 256), F.sha2((i + 2).cast("string"), 256)).alias("_pad"),
    )
    disp = spark.range(N_DISPUTE).select(
        F.concat(F.lit("DSP"), F.lpad(i.cast("string"), 12, "0")).alias("dispute_key"),
        F.concat(F.lit("DSP"), F.lpad(i.cast("string"), 12, "0")).alias("dispute_id"),
        tkey.alias("transaction_key"),
        tkey.alias("transaction_id"),
        F.lit("FRAUD").alias("reason"),
        F.lit("OPEN").alias("outcome"),
        F.lit(dt.date(2024, 1, 4)).alias("opened_date"),
        F.lit(None).cast("date").alias("resolved_date"),
        F.lit("bank_a").alias("source_system"),
        F.lit(True).alias("is_current"),
        F.lit(False).alias("is_quarantined"),
        F.concat(F.sha2(i.cast("string"), 256), F.sha2((i + 3).cast("string"), 256)).alias("_pad"),
    )
    wh.overwrite(txn, "silver", "transactions")
    wh.overwrite(acct, "silver", "accounts")
    wh.overwrite(settle, "silver", "settlements")
    wh.overwrite(disp, "silver", "disputes")
    return wh


@pytest.fixture(scope="module")
def skewed_wh(spark, tmp_path_factory):
    return _skewed_silver(spark, str(tmp_path_factory.mktemp("skew_wh")))


def _executed_plan(df) -> str:
    # collect() drives THIS DataFrame's QueryExecution to completion so the
    # adaptive plan finalizes (a noop write would execute a cloned plan and
    # leave this one isFinalPlan=false)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan


def test_fact_join_broadcasts_dim_no_shuffle_on_key(skewed_wh):
    """The shipped fact build: dim broadcast ⇒ the hot account_key never
    shuffles, so key skew cannot stall a reducer."""
    fact = build_fact_transaction(skewed_wh, dt.datetime(2024, 6, 1))
    plan = _executed_plan(fact)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # probe side flows scan→project→join without an exchange on account_key
    # (the only exchange allowed is the broadcast build side)
    import re

    shuffle_exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert not any("account_key" in e for e in shuffle_exchanges), shuffle_exchanges
    # correctness: every transaction row lands, hot key intact
    assert fact.count() == N_TXN
    hot = fact.filter(F.col("fk_account_key") == "ACC0000000000").count()
    assert hot == int(N_TXN * HOT_FRACTION)


@pytest.mark.parametrize(
    "builder, n_rows, hot_col",
    [
        (build_fact_settlement, N_SETTLE, "fk_transaction_key"),
        (build_fact_dispute, N_DISPUTE, "fk_transaction_key"),
    ],
    ids=["fact_settlement", "fact_dispute"],
)
def test_two_hop_fact_builds_broadcast_accounts_and_survive_hot_key(
    skewed_wh, builder, n_rows, hot_col
):
    """The two-hop builds (VERDICT r4 item 8): the accounts hop is
    broadcast (no exchange on the account key — same immunity as
    fact_transaction), the transaction hop may shuffle on transaction_key
    (large-large), and a hot transaction referenced by 30% of the fact
    rows survives intact."""
    import re

    fact = builder(skewed_wh, dt.datetime(2024, 6, 1))
    plan = _executed_plan(fact)
    assert "BroadcastHashJoin" in plan  # the accounts hop
    shuffle_exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert not any("account_key" in e for e in shuffle_exchanges), shuffle_exchanges
    assert fact.count() == n_rows
    hot = fact.filter(F.col(hot_col) == "TXN000000000000").count()
    assert hot == int(n_rows * HOT_FRACTION)


def _with_skew_confs(spark, fn):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        return fn()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_splits_skewed_partition_when_dim_too_big_to_broadcast(skewed_wh, spark):
    """The large-dim path: same join, no broadcast hint, thresholds scaled
    to fixture size — AQE must mark the sort-merge join skew=true and split
    the hot partition instead of leaving 30% of the data in one task."""

    def run():
        txn = skewed_wh.read("silver", "transactions")
        acct = skewed_wh.read("silver", "accounts")
        joined = txn.join(acct, "account_key").select("transaction_key", "customer_key", "_pad")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "skew=true" in plan, plan[:2000]
        assert joined.count() == N_TXN

    _with_skew_confs(spark, run)


@pytest.mark.parametrize(
    "table, n_rows",
    [("settlements", N_SETTLE), ("disputes", N_DISPUTE)],
    ids=["settlement_hop", "dispute_hop"],
)
def test_aqe_splits_skewed_transaction_hop(skewed_wh, spark, table, n_rows):
    """The two-hop joins' transaction_key shuffle under a hot transaction
    (VERDICT r4 item 8): with broadcast off and thresholds scaled down,
    AQE must split the hot transaction_key partition (skew=true) in the
    settlements/disputes → transactions join — the exact join
    _two_hop runs when both sides outgrow broadcast."""

    def run():
        fact = skewed_wh.read("silver", table)
        txn = skewed_wh.read("silver", "transactions").select(
            "transaction_key", F.col("account_key").alias("_t_account_key")
        )
        joined = fact.join(txn, "transaction_key", "left").select(
            fact.columns[0], "_t_account_key", "_pad"
        )
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "skew=true" in plan, plan[:2000]
        assert joined.count() == n_rows

    _with_skew_confs(spark, run)
