"""Similarity sketches — MinHash (+LSH banding) and SimHash.

Scale design (the 100 TB path):
- shingle → minhash signature is a per-row map (narrow, no shuffle);
- LSH banding explodes each doc into `BANDS` rows and shuffles on the
  (band, signature) bucket key — candidate generation is a hash-partitioned
  group-by, never an O(n²) cross join;
- exact Jaccard verification runs only inside buckets.

Portability: all hashing is md5-based (identical hex in Spark/DuckDB),
folded to 32 bits via hex→BIGINT, then K universal-hash permutations
h_i(x) = (a_i*x + b_i) mod P with constants small enough that a_i*x stays
< 2^52 (no 64-bit overflow in either engine). Every helper has a `*_SQL`
twin generated from the same constants.

No UDFs anywhere — transform/aggregate/filter higher-order functions keep
the whole sketch inside Catalyst codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared constants -----------------------------------------------------------

P = 2147483647  # 2^31 - 1 (Mersenne prime)
K = 16          # minhash permutations
BANDS = 4       # LSH bands of ROWS each
ROWS = K // BANDS

# deterministic (a, b) pairs: a in [1, 2^20), b in [0, P) — generated once
# from a fixed LCG so both engines inline the same literals.
def _lcg_pairs(k: int) -> list[tuple[int, int]]:
    state, out = 123456789, []
    for _ in range(k):
        state = (1103515245 * state + 12345) % (2**31)
        a = (state % ((1 << 20) - 1)) + 1
        state = (1103515245 * state + 12345) % (2**31)
        b = state % P
        out.append((a, b))
    return out


AB = _lcg_pairs(K)

SIMHASH_BITS = 32


# shingling ------------------------------------------------------------------

def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles (joined by single space) of normalized text.
    Expressed with sequence+transform HOFs — no explode, stays one row.

    NOTE: if `col` is a complex expression, every lambda invocation
    re-evaluates it (Spark does not CSE into HOF lambdas — measured 11×
    slower); prefer `staged_word_shingles` which materializes the token
    array as a column first."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    return _shingles_of(toks, n)


def _shingles_of(toks: Column, n: int) -> Column:
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def staged_word_shingles(df, text_col: str, out_col: str = "sh", n: int = 3):
    """Two-step shingling: tokens land in a real column, so the transform
    lambda reads an attribute instead of recomputing split+regexp per
    shingle. Same result as word_shingles, ~11× faster on real corpora."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        df.withColumn("_toks", toks)
        .withColumn(out_col, _shingles_of(F.col("_toks"), n))
        .drop("_toks")
    )


def WORD_SHINGLES_SQL(col: str, n: int = 3) -> str:
    toks = f"string_split(regexp_replace(lower(trim({col})), '\\s+', ' ', 'g'), ' ')"
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks}) - {n - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' ')))"
    )


# portable 32-bit string hash ------------------------------------------------

def hash32(col: Column) -> Column:
    """First 8 hex chars of md5 → BIGINT (0 .. 2^32-1). Portable."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def HASH32_SQL(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


# minhash --------------------------------------------------------------------

def minhash_signature(shingles: Column) -> Column:
    """Array of K minhash values over the shingle set.

    Single pass: one fold over the shingle hashes, updating all K mins per
    element via zip_with — Spark does not CSE repeated HOF subtrees, so the
    naive K×array_min(transform(...)) form re-hashes every shingle K times
    (measured ~6× slower at 5k docs)."""
    a_arr = F.array(*[F.lit(a) for a, _ in AB])
    b_arr = F.array(*[F.lit(b) for _, b in AB])
    init = F.array_repeat(F.lit(P).cast("bigint"), K)
    hashes = F.transform(shingles, lambda s: hash32(s))
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (h * a + b) % P),
            lambda m, v: F.least(m, v),
        ),
    )


def MINHASH_SIGNATURE_SQL(shingles_expr: str) -> str:
    hashes = f"list_transform({shingles_expr}, s -> {HASH32_SQL('s')})"
    mins = ", ".join(
        f"list_min(list_transform({hashes}, h -> (h * {a} + {b}) % {P}))"
        for a, b in AB
    )
    return f"[{mins}]"


def band_signature(minhash_col: Column, i: int) -> Column:
    """Band ``i``'s LSH bucket key '<band>-<r1>-<r2>-...'."""
    return F.concat_ws(
        "-",
        F.lit(str(i)),
        *[
            F.element_at(minhash_col, i * ROWS + j + 1).cast("string")
            for j in range(ROWS)
        ],
    )


def band_signatures(minhash_col: Column) -> Column:
    """Array of BANDS strings '<band>:<r1>-<r2>-...' — the LSH bucket keys."""
    return F.array(*[band_signature(minhash_col, i) for i in range(BANDS)])


def band_signatures_subset(minhash_col: Column, indices: tuple[int, ...]) -> Column:
    """Bucket keys for a SUBSET of the bands — the unit of the sharded
    miner's disjoint passes (operators/neardup.near_dup_pairs_sharded):
    pass p explodes only its own bands, so at most |subset|/BANDS of the
    band rows and their shuffle files exist at once."""
    return F.array(*[band_signature(minhash_col, i) for i in indices])


def BAND_SIGNATURES_SQL(mh: str) -> str:
    bands = ", ".join(
        "concat_ws('-', '" + str(i) + "', " +
        ", ".join(f"CAST({mh}[{i * ROWS + j + 1}] AS VARCHAR)" for j in range(ROWS)) + ")"
        for i in range(BANDS)
    )
    return f"[{bands}]"


# jaccard --------------------------------------------------------------------

def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return inter / F.greatest(union, F.lit(1))


def JACCARD_SQL(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    return f"{inter} / greatest(len({a}) + len({b}) - {inter}, 1)"


def containment(a: Column, b: Column) -> Column:
    """Exact containment of A in B: |A∩B| / |A| — the asymmetric companion
    to Jaccard, high when a small doc is quoted inside a large one even
    though their Jaccard is low."""
    inter = F.size(F.array_intersect(a, b))
    return inter / F.greatest(F.size(a), F.lit(1))


def CONTAINMENT_SQL(a: str, b: str) -> str:
    inter = f"len(list_intersect({a}, {b}))"
    return f"{inter} / greatest(len({a}), 1)"


# simhash --------------------------------------------------------------------

def simhash(col: str | Column) -> Column:
    """SIMHASH_BITS-bit SimHash over whitespace tokens: per bit, sum +1/-1
    across token hashes; bit set where the sum is positive."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.split(F.trim(c), r"\s+"))
    hashes = F.transform(toks, lambda t: hash32(t))
    masks = F.array(*[F.lit(1 << i).cast("bigint") for i in range(SIMHASH_BITS)])
    # single fold: per token, vote +1/-1 on every bit at once (see
    # minhash_signature on why the per-bit aggregate form is slow)
    sums = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) > 0, 1).otherwise(-1)),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(sums, masks, lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def SIMHASH_SQL(col: str) -> str:
    toks = f"list_distinct(string_split_regex(trim({col}), '\\s+'))"
    hashes = f"list_transform({toks}, t -> {HASH32_SQL('t')})"
    parts = [
        f"CASE WHEN list_sum(list_transform({hashes}, "
        f"h -> CASE WHEN (h & {1 << i}) > 0 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i in range(SIMHASH_BITS)
    ]
    return "(" + " + ".join(parts) + ")::BIGINT"


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two SIMHASH_BITS-bit signatures (popcount of
    xor via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def HAMMING32_SQL(a: str, b: str) -> str:
    return f"bit_count(xor({a}::BIGINT, {b}::BIGINT))"


# count-min sketch -----------------------------------------------------------
#
# Mergeable frequency sketch: D independent md5-salted hash rows x W counter
# buckets. The sketch of a corpus is the elementwise SUM of per-partition
# (or per-micro-batch) sketches — a groupBy (row, bucket) count with map-side
# partial aggregation, so building it over 100 TB shuffles only D*W bounded
# counter rows, never the keys. Point estimate = min over rows of the key's
# bucket counter (always >= true count; error <= N/W with prob 1-2^-D).

CMS_D = 4     # hash rows
CMS_W = 1024  # buckets per row


def cms_bucket(col: Column, j: int) -> Column:
    """Bucket index of `col` in sketch row j (portable md5-salted hash)."""
    return hash32(F.concat(F.lit(f"cms{j}:"), col)) % CMS_W


def CMS_BUCKET_SQL(expr: str, j: "int | str") -> str:
    """DuckDB twin; `j` may be an int literal or a SQL expression (e.g. the
    generate_series column when building all rows at once)."""
    salt = (
        f"'cms{j}:'" if isinstance(j, int)
        else f"('cms' || CAST({j} AS VARCHAR) || ':')"
    )
    return f"({HASH32_SQL(f'{salt} || {expr}')} % {CMS_W})"


def cms_entries(col: Column) -> Column:
    """Array of (row j, bucket) structs for one key — explode and count to
    build the sketch; join against it to probe."""
    return F.array(
        *[
            F.struct(F.lit(j).alias("j"), cms_bucket(col, j).alias("b"))
            for j in range(CMS_D)
        ]
    )
