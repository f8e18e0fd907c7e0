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


def test_bloom_filter_injected_under_smj(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        plan = _joined(spark)._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan      # built on the filtered dim side
        assert "might_contain" in plan         # applied to the fact scan side
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_bloom_pruned_results_identical(spark):
    baseline = _joined(spark).first()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        pruned = _joined(spark).first()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
    assert (pruned.n, pruned.s) == (baseline.n, baseline.s)
