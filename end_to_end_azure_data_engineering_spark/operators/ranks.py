"""Distributed exact per-group ranking — the scalable replacement for
window ntile / percent_rank / cume_dist over LOW-cardinality partition
keys.

A plain ``Window.partitionBy(segment).orderBy(v)`` hash-partitions on the
group key alone: with G groups the whole frame sorts on G tasks, so a
5-segment ntile over 1.5B customers is five 300M-row single-task sorts —
the quiet scale-killer the ``Exchange SinglePartition`` plan fence cannot
see (the exchange is a hash exchange, just a degenerate one). The rank
family the reference never needed (its windows key on business ids,
4_silver/silver_transactions.py:106-116) but our §2.5 distribution
queries do.

``sharded_row_number`` computes the SAME exact global row_number per
group with every shuffle and sort keyed on ``(group, range-bucket)``:

1. per-group order-preserving bucket boundaries via ``percentile_approx``
   (a proper partial aggregate — produces one G-row frame carrying the
   boundary array and the exact per-group count);
2. each row's bucket = number of boundaries strictly below its sort
   value (the boundaries ride the join as B-1 plain columns so the
   count compiles in whole-stage codegen; value ties share a bucket,
   so bucketing is order-consistent with the caller's total order);
3. per-(group, bucket) counts roll into cumulative per-bucket offsets —
   a window over the ≤``num_buckets``-row-per-group counts frame, a
   bounded reduction the low-cardinality-window fence allowlists;
4. ``row_number`` within (group, bucket) + offset = exact global rank,
   sorted on G×B tasks instead of G.

Exactness does NOT depend on the boundary values: any boundary set
yields identical ranks (buckets only shard the sort), so
``percentile_approx``'s approximation error — and any run-to-run merge
nondeterminism — is invisible in the output. The unchanged
ntile/percent_rank/cume_dist DuckDB oracles hash-verify the closed
forms downstream:

    ntile(k)     = floor((rn-1)*k/n) + 1           [unique ordering]
    percent_rank = (rn-1)/(n-1)   (0.0 when n = 1)
    cume_dist    = rn/n

All three closed forms require the caller to pass a TOTAL order (append
a unique tiebreaker): with ties ``rank() != row_number`` and the closed
forms would drift from the SQL rank functions.

At 100 TB: ``num_buckets`` is the sort-shard knob — per-task sort frames
shrink by B×, chosen like ``spark.sql.shuffle.partitions`` (B ≈
cluster-cores / G). The boundary aggregate and both joins stay keyed;
the offsets frame is G×B rows, which AQE broadcasts on its own (no
explicit hint — the bounded-broadcast fence applies).

Skew caveat: rows TIED on the bucketing value cannot be split across
buckets (order consistency forbids it), so the per-task bound is
``max(n_g/B, heaviest duplicate value count)``. For the quality-score /
balance / price frames here ties are a vanishing fraction; a frame
dominated by one value (e.g. ranking a boolean) would need a
higher-resolution first sort key, which is a caller decision — the
closed forms are unaffected either way.
"""

from __future__ import annotations

import operator
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = ["sharded_row_number"]

_BNDS, _BUCKET, _BCNT, _BOFF, _LRN = "_bnds", "_rbucket", "_bcnt", "_boff", "_lrn"


def sharded_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    *,
    rn: str = "rn",
    n: str = "n_g",
    num_buckets: int | None = None,
    materialize: bool = False,
) -> DataFrame:
    """Exact per-group ``row_number`` (1-based, ordered by ``order_cols``
    ascending) without a per-group single-task sort. Empty ``group_cols``
    = GLOBAL total order (rank over the whole frame, sorted on
    ``num_buckets`` tasks — the scalable form of ``W.orderBy(...)``).

    ``order_cols`` must be a total order (unique tiebreaker last) and its
    FIRST column must be numeric and non-null — it is the range-bucketing
    value. Adds ``rn`` (exact global rank within the group) and ``n``
    (exact group row count); all intermediate columns are dropped.

    The construction evaluates ``df`` three times (boundary aggregate,
    bucket counts, final rank). When the input is a bare column-pruned
    scan that is three cheap parallel scans; when it is an expensive
    join/aggregate, pass ``materialize=True`` to localCheckpoint the
    input once (profiled at synthetic sf10: the customer_spend_deciles
    spend aggregate alone is ~8.5 s warm, so recomputing it 3× dwarfs
    the ~5.7 s of rank stages — the lazy twin in queries/lazy_stages.py
    keeps the checkpointed upstream visible to the plan audit, the same
    discipline as the mining stages)."""
    if num_buckets is None:
        # the sort-shard knob defaults to the session's parallelism (like
        # shuffle.partitions): more executors ⇒ finer shards ⇒ smaller
        # per-task sort frames, with no semantic effect at any value
        num_buckets = max(32, df.sparkSession.sparkContext.defaultParallelism)
    if materialize:
        df = df.localCheckpoint()
    val = F.col(order_cols[0]).cast("double")
    fracs = F.array(
        *[F.lit(i / num_buckets) for i in range(1, num_buckets)]
    )
    aggs = (
        F.percentile_approx(val, fracs, F.lit(10_000)).alias(_BNDS),
        F.count("*").alias(n),
    )
    # empty group_cols = GLOBAL total order: the boundary frame is ONE row
    # and rides an explicit one-row broadcast crossJoin (a constant join
    # key would constant-fold into a keyless BNLJ); everything downstream
    # keys on the bucket column, so the data frame still shuffles only on
    # the ~num_buckets bucket keys, never to a single partition.
    bounds = df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
    # Bucket assignment = #boundaries strictly below the sort value. The
    # obvious array-HOF form (aggregate over the per-group boundary
    # array) is interpreted per element — profiled at 20 s PER PASS over
    # 10M rows, dwarfing the 1.2 s boundary aggregate and even the
    # single-task sort it replaces. Unpacking the array into B-1 plain
    # columns on the (G-row, AQE-broadcast) join side turns the count
    # into a chain of scalar comparisons that whole-stage codegen
    # compiles: measured 20 s → <1 s per pass, fully lazy, any G.
    bcols = [f"_b{i}" for i in range(num_buckets - 1)]
    bounds_wide = bounds.select(
        *group_cols,
        n,
        *[F.col(_BNDS)[i].alias(c) for i, c in enumerate(bcols)],
    )
    bucket_chain = reduce(
        operator.add,
        [(val > F.col(c)).cast("int") for c in bcols],
    )
    joined = (
        df.join(bounds_wide, group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds_wide))
    )
    bucketed = joined.withColumn(_BUCKET, bucket_chain).drop(*bcols)

    counts = bucketed.groupBy(*group_cols, _BUCKET).agg(
        F.count("*").alias(_BCNT)
    )
    # cumulative offset of all lower buckets: a window over the bounded
    # (≤num_buckets rows per group) counts frame — never the data frame
    w_off = (
        W.partitionBy(*group_cols)
        .orderBy(_BUCKET)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *group_cols,
        _BUCKET,
        F.coalesce(F.sum(_BCNT).over(w_off), F.lit(0)).alias(_BOFF),
    )

    w_local = W.partitionBy(*group_cols, _BUCKET).orderBy(*order_cols)
    return (
        bucketed.join(offsets, [*group_cols, _BUCKET])
        .withColumn(_LRN, F.row_number().over(w_local))
        .withColumn(rn, (F.col(_BOFF) + F.col(_LRN)).cast("bigint"))
        .drop(_BUCKET, _BOFF, _LRN)
    )


def ntile_expr(rn_col: str, n_col: str, k: int):
    """Exact ``ntile(k)`` from a total-order row_number. SQL ntile sizing
    is FRONT-LOADED: with q = n div k and r = n mod k, the first r
    buckets hold q+1 rows and the rest hold q (one row each, buckets
    1..n, when n < k). The tempting closed form ``floor((rn-1)k/n)+1``
    spreads the remainder evenly instead (n=10, k=4 gives sizes 3,2,3,2
    — SQL says 3,3,2,2), so the piecewise form is required; it is
    hash-verified against the DuckDB ``ntile()`` oracles."""
    rn, n = F.col(rn_col), F.col(n_col)
    q = F.floor(n / k)
    r = n % k
    cutoff = r * (q + 1)
    return (
        F.when(q == 0, rn)
        .when(rn <= cutoff, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - cutoff) / q) + 1)
    ).cast("int")


def percent_rank_expr(rn_col: str, n_col: str):
    """``percent_rank`` under a total order: (rn-1)/(n-1), 0.0 for the
    single-row group (SQL defines 0, Spark's int 0/0 would be NULL)."""
    return F.when(F.col(n_col) == 1, F.lit(0.0)).otherwise(
        (F.col(rn_col) - 1) / (F.col(n_col) - 1)
    )


def cume_dist_expr(rn_col: str, n_col: str):
    """``cume_dist`` under a total order: rn/n (no ties ⇒ the ≤-count is
    the row_number itself)."""
    return F.col(rn_col) / F.col(n_col)


def with_tie_ranks(
    ranked: DataFrame,
    group_cols: list[str],
    tie_cols: list[str],
    *,
    rn: str = "rn",
    rank: str = "rank",
    dense_rank: str = "dense_rank",
) -> DataFrame:
    """Tie-aware ``rank()`` / ``dense_rank()`` on top of a
    ``sharded_row_number`` result — completing the SQL rank-function
    family without any coarser shuffle than the ranking itself.

    ``tie_cols`` are the ORDER columns WITHOUT the unique tiebreaker
    (rows equal on them are SQL ties). Within one (group, tie-value)
    class the row_numbers are consecutive, so:

        rank       = min(rn) over the tie class
        dense_rank = how many distinct tie classes have min(rn) ≤ mine
                     = rank of the tie class itself, computed by ranking
                       the (bounded-per-value) class frame

    The class aggregation shuffles on (group, tie_cols) — cardinality ≥
    the data's distinct sort values, never the G-partition shuffle this
    module exists to remove. The class frame can itself be
    data-sized (mostly-unique orderings ⇒ one class per row), so its
    dense-rank numbering recurses through ``sharded_row_number`` on the
    class min-rn (a unique numeric total order by construction) rather
    than a per-group window."""
    classes = ranked.groupBy(*group_cols, *tie_cols).agg(
        F.min(rn).alias(rank)
    )
    classes = sharded_row_number(
        classes, group_cols, [rank], rn=dense_rank, n="_n_classes"
    ).drop("_n_classes")
    return ranked.join(classes, [*group_cols, *tie_cols])
