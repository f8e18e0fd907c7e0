"""Arrow fast-path cosine top-k (functions/similarity_arrow.py) must agree
with the expression-kernel query `ann_bruteforce_topk` — same neighbor sets,
scores within float tolerance (numpy's pairwise accumulation differs from
the expression fold in the last ulp, which is why this path backs no
oracle)."""

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.functions.similarity_arrow import cosine_topk_arrow
from end_to_end_azure_data_engineering_spark.queries import load
from end_to_end_azure_data_engineering_spark.queries.similarity_ops import ann_bruteforce_topk

SF = "/root/testdata/sf0.001"


def test_arrow_topk_matches_expression_kernel(spark):
    expr = {
        (r.probe_id, r.rk): (r.vec_id, r.cosine)
        for r in ann_bruteforce_topk(spark, SF).collect()
    }

    e = load(spark, SF, "embeddings")
    probes = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 5).collect()
    ]
    arrow = {
        (r.probe_id, r.rk): (r.vec_id, r.cos)
        for r in cosine_topk_arrow(e, "embedding", "vec_id", probes, k=5).collect()
    }

    assert set(arrow) == set(expr)
    for key, (vid_e, cos_e) in expr.items():
        vid_a, cos_a = arrow[key]
        # the expression query rounds to 6 places; numpy's full-precision
        # score must agree within that quantum (plus a boundary ulp)
        assert abs(cos_a - cos_e) < 1.5e-6
        if vid_a != vid_e:
            assert abs(cos_a - cos_e) < 1.5e-6  # a genuine near-tie swap


def test_arrow_topk_excludes_self_and_bounds_k(spark):
    e = load(spark, SF, "embeddings")
    probes = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in e.filter(F.col("vec_id") < 3).collect()
    ]
    rows = cosine_topk_arrow(e, "embedding", "vec_id", probes, k=7).collect()
    per_probe = {}
    for r in rows:
        assert r.vec_id != r.probe_id
        per_probe.setdefault(r.probe_id, []).append(r.rk)
    for pid, rks in per_probe.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 7
