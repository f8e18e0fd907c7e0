"""Warehouse layout tests — the two 100 TB storage levers: hive-partitioned
writes (partition pruning at the scan) and bucketed tables (co-located
equi-joins with no Exchange). Assertions read the formatted physical plan,
the same evidence surface as tools/plan_audit.py.
"""

import re

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    return Warehouse(spark, str(tmp_path_factory.mktemp("layout_wh")))


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_partitioned_write_prunes(spark, wh):
    ev = spark.createDataFrame(
        [(i, ["click", "view", "purchase"][i % 3], float(i)) for i in range(300)],
        "event_id long, event_type string, value double",
    )
    n = wh.overwrite(ev, "bronze", "events_part", partition_by=["event_type"])
    assert n == 300
    # one directory per partition value on disk
    dirs = {p.name for p in wh.path("bronze", "events_part").iterdir() if p.is_dir()}
    assert dirs == {"event_type=click", "event_type=view", "event_type=purchase"}

    df = wh.read("bronze", "events_part").filter(F.col("event_type") == "click")
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "click" in m.group(1), plan
    assert df.count() == 100


def test_bucketed_join_has_no_exchange(spark, wh):
    left = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(1000)], "k long, id long, v double"
    )
    right = spark.createDataFrame(
        [(i % 50, f"n{i}") for i in range(500)], "k long, name string"
    )
    wh.overwrite_bucketed(left, "silver", "fact_a", ["k"], 8)
    wh.overwrite_bucketed(right, "silver", "fact_b", ["k"], 8)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = wh.read_bucketed("silver", "fact_a").join(
            wh.read_bucketed("silver", "fact_b"), "k"
        )
        plan = _plan(j)
        # SortMergeJoin with the shuffle prepaid at write: no Exchange nodes
        assert "SortMergeJoin" in plan, plan
        assert not re.search(r"^\(\d+\) Exchange\s*$", plan, re.MULTILINE), plan
        assert j.count() == 1000 * 10
        # bucketed group-by on the bucket key also plans without Exchange
        agg = wh.read_bucketed("silver", "fact_a").groupBy("k").agg(F.sum("v"))
        assert not re.search(r"^\(\d+\) Exchange\s*$", _plan(agg), re.MULTILINE)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
