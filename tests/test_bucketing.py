"""Bucketed co-located join evidence (SURVEY §4 layout upgrade).

Writes orders and customer bucketed on the customer key and proves the
equi-join then runs bucket-to-bucket: ZERO Exchange in the executed plan,
against two shuffle exchanges for the identical join over plain parquet.
Broadcast is disabled for the duration so the comparison isolates the
bucketing effect (otherwise the small dim would broadcast either way).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.engine.bucketing import write_bucketed

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def no_broadcast(spark):
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    if saved_aqe is None:
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    else:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", saved_aqe)


def _final_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _join(orders, cust):
    return orders.join(cust, orders.o_custkey == cust.c_custkey).groupBy(
        "c_mktsegment"
    ).agg(
        F.count("*").alias("n"),
        # decimal accumulation: exact, so both plans' different summation
        # orders produce identical totals
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )


def test_bucketed_join_eliminates_shuffle(spark, no_broadcast):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    write_bucketed(orders, "b_orders", "o_custkey", buckets=N_BUCKETS)
    write_bucketed(cust, "b_customer", "c_custkey", buckets=N_BUCKETS)
    try:
        plain = _final_plan(_join(orders, cust))
        bucketed = _final_plan(_join(spark.table("b_orders"), spark.table("b_customer")))

        # plain parquet: both join inputs shuffle on the key
        assert plain.count("Exchange hashpartitioning") >= 2
        # bucketed: the join itself needs NO exchange — the only remaining
        # exchange belongs to the downstream groupBy(c_mktsegment)
        join_section = bucketed.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in bucketed
        assert "Exchange" not in join_section
        # and the bucketed scans advertise their layout
        assert "SelectedBucketsCount" in bucketed or "Bucketed: true" in bucketed

        # same results either way
        a = {tuple(r) for r in _join(orders, cust).collect()}
        b = {
            tuple(r)
            for r in _join(spark.table("b_orders"), spark.table("b_customer")).collect()
        }
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
