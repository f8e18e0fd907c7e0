"""Embedding similarity — cosine/dot over `array<float>` columns, native
HOF implementation (zip_with + aggregate), no UDFs.

Scale paths:
- brute-force top-k = broadcast(probes) × candidates, window top-k — right
  whenever |probes| is small (the common "query batch" shape);
- LSH-bucketed ANN = sign-pattern bucket key (axis-aligned random
  hyperplanes), shuffle on bucket, top-k within bucket — candidate set per
  probe shrinks ~2^bits; the idiomatic 100 TB layout (bucket-partitioned).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def DOT_SQL(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def COSINE_SQL(a: str, b: str) -> str:
    # explicit dot/sqrt form (not list_cosine_similarity) so the float→double
    # summation order matches Spark's aggregate() exactly
    d = DOT_SQL(a, b)
    na = f"sqrt({DOT_SQL(a, a)})"
    nb = f"sqrt({DOT_SQL(b, b)})"
    return f"{d} / greatest({na} * {nb}, 1e-12)"


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """LSH bucket key: sign pattern of the first `bits` dimensions.
    Axis-aligned hyperplane LSH — deterministic and engine-portable."""
    parts = [
        F.when(F.element_at(vec, i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def SIGN_BUCKET_SQL(vec: str, bits: int = 8) -> str:
    parts = " || ".join(
        f"CASE WHEN {vec}[{i + 1}] > 0 THEN '1' ELSE '0' END" for i in range(bits)
    )
    return f"({parts})"


def staged(df, vec_col: str, prefix: str):
    """Materialize the double-cast vector and its L2 norm as real columns.

    HOF lambdas are interpreted (no whole-stage codegen) and Spark does not
    CSE subtrees into or across them, so `cosine(a, b)` as one expression
    re-casts and re-norms both vectors for every pair. Staging `<p>_v`
    (double array) and `<p>_n` (norm) once per row makes a scored pair cost
    exactly one dot product. Use with `cosine_pre`.
    """
    v = as_double(F.col(vec_col))
    return df.withColumn(f"{prefix}_v", v).withColumn(
        f"{prefix}_n", F.sqrt(dot(F.col(f"{prefix}_v"), F.col(f"{prefix}_v")))
    )


def cosine_pre(av: Column, an: Column, bv: Column, bn: Column) -> Column:
    """Cosine from pre-staged (vector, norm) pairs — one dot per pair."""
    return dot(av, bv) / F.greatest(an * bn, F.lit(1e-12))
