"""Runtime bloom-filter join pruning — the scale feature that protects the
shuffle when a selective dim filter can't broadcast.

At 100 TB a fact⋈dim join whose dim side is filtered but too big to
broadcast becomes a full-fact shuffle; Spark's runtime bloom filter
(spark.sql.optimizer.runtime.bloomFilter.enabled, on by default in the
engine sessions) builds a bloom filter from the filtered creation side and
semi-prunes the fact scan BEFORE the exchange. These tests pin (a) that
the injection actually fires on the engine's session/config, and (b) that
the pruned plan returns identical results. The size thresholds are forced
down because the test corpus is tiny; production relies on the defaults
(creation side <= 10 MB scan / application side >= 10 GB)."""

from pyspark.sql import functions as F


def _joined(spark, sf="/root/testdata/sf0.01"):
    li = spark.read.parquet(f"{sf}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey")
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
    )


from contextlib import contextmanager


@contextmanager
def _forced_smj_bloom(spark):
    """Force SMJ + bloom injection, RESTORING the session's configured
    values afterward — conf.unset would drop to Spark's 10 MB default,
    not the engine session's 64 MB, leaking a smaller broadcast threshold
    into every later test of the session-scoped fixture."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    ]
    prior = {k: spark.conf.get(k) for k in keys}
    spark.conf.set(keys[0], "-1")
    spark.conf.set(keys[1], "0")
    try:
        yield
    finally:
        for k, v in prior.items():
            spark.conf.set(k, v)


def test_bloom_filter_injected_under_smj(spark):
    with _forced_smj_bloom(spark):
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan      # built on the filtered dim side
        assert "might_contain" in plan         # applied to the fact scan side


def test_bloom_pruned_results_identical(spark):
    baseline = _joined(spark).first()
    with _forced_smj_bloom(spark):
        pruned = _joined(spark).first()
    assert (pruned.n, pruned.s) == (baseline.n, baseline.s)
