"""Lloyd's refinement (operators/kmeans.py): the objective must not
increase, assignments must partition the corpus, and the loop must be a
bounded number of corpus passes (no per-row collects)."""

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.functions import similarity as V
from end_to_end_azure_data_engineering_spark.operators.kmeans import (
    kmeans_refine,
    nearest_cell,
    sse,
)
from end_to_end_azure_data_engineering_spark.queries import load

SF = "/root/testdata/sf0.001"


def _seed_centroids(spark, k=8):
    rows = sorted(
        load(spark, SF, "embeddings").filter(F.col("vec_id") < k).collect(),
        key=lambda r: r.vec_id,
    )
    return [[float(x) for x in r.embedding] for r in rows]


def test_lloyd_objective_non_increasing(spark):
    e = load(spark, SF, "embeddings")
    init = _seed_centroids(spark)
    before = sse(e, "embedding", init)
    refined = kmeans_refine(e, "embedding", init, n_iter=2)
    after = sse(e, "embedding", refined)
    assert after <= before * (1 + 1e-9)
    assert after < before  # seed sample is not a fixed point on this data
    assert len(refined) == len(init) and len(refined[0]) == len(init[0])


def test_assignment_partitions_corpus(spark):
    e = load(spark, SF, "embeddings")
    refined = kmeans_refine(e, "embedding", _seed_centroids(spark), n_iter=1)
    staged = e.select("vec_id", V.as_double(F.col("embedding")).alias("_v"))
    cells = staged.select(
        "vec_id", nearest_cell(F.col("_v"), refined).alias("cell")
    )
    n_total = e.count()
    agg = cells.agg(
        F.count("*").alias("n"),
        F.min("cell").alias("lo"),
        F.max("cell").alias("hi"),
    ).first()
    assert agg.n == n_total
    assert 0 <= agg.lo and agg.hi <= len(refined) - 1


def test_empty_cells_keep_previous_centroid(spark):
    # two far-apart duplicate groups + 4 seeds: at least 2 seeds capture
    # nothing after the first assignment and must survive unchanged
    data = [([10.0, 0.0],), ([10.1, 0.0],), ([-10.0, 0.0],), ([-10.2, 0.0],)]
    df = spark.createDataFrame(data, "embedding array<double>")
    init = [[10.0, 0.0], [-10.0, 0.0], [500.0, 500.0], [-500.0, -500.0]]
    refined = kmeans_refine(df, "embedding", init, n_iter=2)
    assert refined[2] == [500.0, 500.0]
    assert refined[3] == [-500.0, -500.0]
    # captured cells moved to their points' means
    assert abs(refined[0][0] - 10.05) < 1e-9
    assert abs(refined[1][0] - (-10.1)) < 1e-9
