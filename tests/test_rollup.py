"""Incremental rollup maintenance (operators/rollup.py): merged
partial-aggregate state must equal a full rebuild, for any batch split, and
the HLL distinct path (not oracle-checkable — sketch state is
engine-specific binary) must union correctly and land near the exact
count."""

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.operators.rollup import (
    merge_rollups,
    read_rollup,
    rollup_batch,
)
from end_to_end_azure_data_engineering_spark.queries import load

SF = "/root/testdata/sf0.001"


def _full(spark):
    ev = load(spark, SF, "events")
    return rollup_batch(
        ev, keys=["event_type"], sum_cols=["value"], minmax_cols=["value"],
        distinct_cols=["user_id"],
    )


def _incremental(spark, mod):
    ev = load(spark, SF, "events")
    parts = [
        rollup_batch(
            ev.filter(F.col("event_id") % mod == i),
            keys=["event_type"], sum_cols=["value"], minmax_cols=["value"],
            distinct_cols=["user_id"],
        )
        for i in range(mod)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merge_rollups(merged, p, keys=["event_type"])
    return merged


def _readable(df):
    rows = read_rollup(df, avg_of=["value"]).collect()
    return {
        r.event_type: (
            r.n_rows,
            round(r.sum_value, 6),
            r.min_value,
            r.max_value,
            round(r.avg_value, 9),
            r.n_distinct_user_id,
        )
        for r in rows
    }


def test_merge_equals_full_rebuild(spark):
    """Exact statistics survive any re-association: 2-way and 5-way
    incremental folds both reproduce the one-pass rollup, including the
    HLL estimate (sketch union is deterministic for fixed input)."""
    full = _readable(_full(spark))
    assert full  # non-trivial fixture
    assert _readable(_incremental(spark, 2)) == full
    assert _readable(_incremental(spark, 5)) == full


def test_hll_estimate_near_exact(spark):
    """The sketch path is an estimate with bounded error (default lgk=12
    keeps rsd well under 5% at this cardinality)."""
    ev = load(spark, SF, "events")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {k: v[5] for k, v in _readable(_full(spark)).items()}
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n)


def test_merge_rejects_schema_drift(spark):
    import pytest

    a = _full(spark)
    with pytest.raises(ValueError):
        merge_rollups(a, a.drop("n_rows"), keys=["event_type"])


def test_rollup_stream_sink_matches_batch(spark, tmp_path):
    """Feeding the events table through the foreachBatch rollup sink in
    micro-batches converges to the same readable state as one batch pass."""
    from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
    from end_to_end_azure_data_engineering_spark.streaming.ingest import rollup_stream_sink

    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = rollup_stream_sink(
        wh, "event_totals", keys=["event_type"],
        sum_cols=["value"], minmax_cols=["value"], distinct_cols=["user_id"],
    )
    ev = load(spark, SF, "events")
    for i in range(3):  # three micro-batches
        sink(ev.filter(F.col("event_id") % 3 == i), i)

    streamed = _readable(wh.read("gold", "event_totals"))
    assert streamed == _readable(_full(spark))


def test_rollup_stream_sink_replay_safe(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied
    micro-batch (same epoch id, e.g. failure retry or restart from
    checkpoint mid-epoch) must be a no-op, not a double-count."""
    from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
    from end_to_end_azure_data_engineering_spark.streaming.ingest import rollup_stream_sink

    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = rollup_stream_sink(
        wh, "event_totals", keys=["event_type"],
        sum_cols=["value"], minmax_cols=["value"], distinct_cols=["user_id"],
    )
    ev = load(spark, SF, "events")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    sink(batches[1], 1)  # replay of the last epoch
    sink(batches[0], 0)  # stale replay from further back
    sink(batches[2], 2)
    sink(batches[2], 2)  # replay again

    streamed = _readable(wh.read("gold", "event_totals"))
    assert streamed == _readable(_full(spark))


def test_cms_stream_sink_matches_batch_and_replays_safely(spark, tmp_path):
    """The continuously-maintained count-min sketch equals a one-shot batch
    build (merge = counter addition), and epoch replays are no-ops."""
    from pyspark.sql import functions as F2

    from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
    from end_to_end_azure_data_engineering_spark.functions import sketches as S
    from end_to_end_azure_data_engineering_spark.streaming.ingest import cms_stream_sink

    wh = Warehouse(spark, str(tmp_path / "wh"))
    sink = cms_stream_sink(wh, "user_freq_cms", key_col="user_id")
    ev = load(spark, SF, "events")
    batches = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    sink(batches[0], 0)
    sink(batches[1], 1)
    sink(batches[1], 1)  # replay
    sink(batches[2], 2)
    sink(batches[0], 0)  # stale replay

    streamed = {
        (r.j, r.b): r.c
        for r in wh.read("gold", "user_freq_cms").drop("_epoch").collect()
    }
    oneshot = {
        (r.j, r.b): r.c
        for r in ev.select(
            F2.explode(S.cms_entries(F.col("user_id").cast("string"))).alias("e")
        )
        .groupBy("e.j", "e.b")
        .agg(F2.count("*").alias("c"))
        .collect()
    }
    assert streamed == oneshot
