"""Embedding similarity — cosine/dot over `array<float>` columns, pure
expression implementation, no UDFs.

The dot product comes in two forms:
- fixed-dimension UNROLLED (`dot(a, b, dim=64)`): a flat left-associated
  sum of `element_at(a,i)*element_at(b,i)` terms. Higher-order-function
  lambdas (zip_with/aggregate) are evaluated INTERPRETED in Spark —
  ~100µs/row at d=64, which dominates any embedding scan — while the
  unrolled tree stays inside whole-stage codegen (per-row cost ~100×
  lower; plan-compile cost is fixed, amortized at scale). The summation
  order is identical to the fold (((0+x1)+x2)+…), so results are
  bit-identical to the HOF form and to DuckDB's list_dot_product.
- HOF fallback (`dot(a, b)`) for unknown/ragged dimensionality.

Scale paths:
- brute-force top-k = broadcast(probes) × candidates, window top-k — right
  whenever |probes| is small (the common "query batch" shape);
- LSH-bucketed ANN = sign-pattern bucket key (axis-aligned random
  hyperplanes), shuffle on bucket, top-k within bucket — candidate set per
  probe shrinks ~2^bits; the idiomatic 100 TB layout (bucket-partitioned).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dimensionality of the testdata `embeddings.embedding` column; callers
#: with a different corpus pass their own `dim` explicitly.
EMB_DIM = 64

#: upper bound for LITERAL-codebook operators (IVF cell assignment,
#: k-means refinement): the codebook rides the plan as a driver-side
#: literal plus a bounded K x d collect, which is the 0-shuffle fast
#: path — but past a few thousand cells the literal expression tree
#: itself becomes the driver bottleneck (analysis/codegen blow-up of
#: the same kind measured in ivf_index_frames' docstring: ~2000-node
#: trees cost 60-200 s per run). Beyond this, a codebook belongs in a
#: broadcast-joined FRAME, not a literal — raise rather than let a
#: knob turn the collect into a driver OOM (r11 verdict item 6).
MAX_LITERAL_CODEBOOK = 4096


def check_codebook_k(k: int) -> None:
    """Refuse literal-codebook sizes past MAX_LITERAL_CODEBOOK."""
    if k > MAX_LITERAL_CODEBOOK:
        raise ValueError(
            f"codebook of {k} cells exceeds the literal-codebook bound "
            f"({MAX_LITERAL_CODEBOOK}): at this size the driver-side "
            "literal tree and K x d collect are the bottleneck — use a "
            "broadcast-joined centroid frame instead"
        )


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def lit_double_array(xs) -> Column:
    """``F.lit(list_of_floats)`` as ONE parsed SQL expression.

    Same driver-cost class as ``dot``'s unrolled form: ``F.lit`` walks the
    list element-by-element through py4j. ``repr(float)`` is the shortest
    round-trip decimal string and Spark's double literal parses through
    ``Double.parseDouble`` (correctly rounded), so every element comes
    back BIT-IDENTICAL to the ``F.lit`` form — pinned by
    tests/test_similarity_arrow.py::test_lit_double_helpers_match_f_lit.
    Finite values only (codebooks/norms never carry NaN/Inf; the SQL
    literal grammar has no spelling for them) — raises otherwise."""
    vals = [float(x) for x in xs]
    if any(math.isnan(v) or math.isinf(v) for v in vals):
        raise ValueError("lit_double_array: non-finite element")
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """``F.lit(nested_list_of_floats)`` as ONE parsed SQL expression —
    measured 0.577 s for a 16x64 codebook via ``F.lit`` (py4j element
    walk, the dominant plan-build cost of every IVF query) vs ~4 ms
    parsed. See lit_double_array for the exactness argument."""
    inner = []
    for r in rows:
        vals = [float(x) for x in r]
        if any(math.isnan(v) or math.isinf(v) for v in vals):
            raise ValueError("lit_double_matrix: non-finite element")
        inner.append("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
    return F.expr("array(" + ",".join(inner) + ")")


def dot(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    """Dot product of two array columns cast to double.

    With `dim` and string column names, emits the unrolled codegen form as
    ONE parsed SQL expression — building the 64-term tree through py4j
    Column arithmetic costs ~1.2s of driver round-trips per expression;
    `F.expr` parses the same tree JVM-side in ~4ms. SQL `+` is left-
    associative, so the summation order (((0+t1)+t2)+…) is bit-identical
    to the HOF fold and to DuckDB's list_dot_product. Arrays shorter than
    `dim` raise under ANSI mode — loud, not silently wrong.

    Column inputs (or dim=None) fall back to the interpreted HOF fold,
    which handles ragged arrays and lambda-bound vectors.
    """
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        terms = " + ".join(
            f"(CAST(element_at({a},{i}) AS DOUBLE)"
            f" * CAST(element_at({b},{i}) AS DOUBLE))"
            for i in range(1, dim + 1)
        )
        return F.expr(f"0.0D + {terms}")
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def DOT_SQL(a: str, b: str) -> str:
    return f"list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"


def norm(a: Column | str, dim: int | None = None) -> Column:
    return F.sqrt(dot(a, a, dim))


def cosine(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    return dot(a, b, dim) / F.greatest(
        norm(a, dim) * norm(b, dim), F.lit(1e-12)
    )


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


def staged(df, vec_col: str, prefix: str, dim: int | None = EMB_DIM):
    """Stage the raw vector and its L2 norm as real columns.

    `cosine(a, b)` as one expression re-norms both vectors for every pair;
    staging `<p>_n` once per row makes a scored pair cost exactly one dot
    product. `<p>_v` stays the RAW (float) array — the unrolled dot casts
    per element, so no double-array copy is materialized and the shuffled/
    broadcast payload is half the size. Use with `cosine_pre`.
    """
    return df.withColumn(f"{prefix}_v", F.col(vec_col)).withColumn(
        f"{prefix}_n", F.sqrt(dot(vec_col, vec_col, dim))
    )


def cosine_pre(
    av: str, an: str, bv: str, bn: str, dim: int | None = EMB_DIM
) -> Column:
    """Cosine from pre-staged (vector, norm) column names — one dot per
    pair, unrolled (see `dot`)."""
    return dot(av, bv, dim) / F.greatest(
        F.col(an) * F.col(bn), F.lit(1e-12)
    )
