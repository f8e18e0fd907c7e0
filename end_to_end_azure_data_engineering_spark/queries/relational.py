"""Relational operator queries over the driver testdata.

One named query per operator family in SURVEY.md §2, expressed with the
idiomatic DataFrame API (Catalyst plans: pushdown, pruning, broadcast joins,
partial aggregation all apply). Every computed column is aliased identically
in the Spark code and the DuckDB oracle so value-hashes line up.

Reference parity notes cite file:line into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from . import load, register

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (aggregation surface, §2.4).
# The reference's gold layer stops at star-schema facts and leaves rollups to
# BI; this is the canonical downstream rollup. Filter pushes to parquet scan;
# partial hash-agg map-side; two-column group key keeps the shuffle tiny.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# P1 — typed projection / conform (reference: silver_transactions.py:73-87:
# select with per-column cast+alias, fixed order, incl. the decimal→double
# downcast). Column pruning reaches the scan (ReadSchema shows 4 cols).
# ---------------------------------------------------------------------------


@register(
    "conform_typed_projection",
    oracle="""
    SELECT CAST(o_orderkey AS VARCHAR)   AS order_id,
           CAST(o_custkey AS VARCHAR)    AS customer_id,
           CAST(o_totalprice AS DOUBLE)  AS total_amount,
           CAST(o_orderdate AS DATE)     AS order_date
    FROM orders
    """,
)
def conform_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_custkey").cast("string").alias("customer_id"),
        F.col("o_totalprice").cast("double").alias("total_amount"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


# ---------------------------------------------------------------------------
# P2/P3/P9 + §1.4 — surrogate keys: deterministic `<natural_id>-<source>`
# concat (silver_transactions.py:88-93), NULL-preserving via when/otherwise,
# source_system injected as a literal (silver_transactions.py:59).
# ---------------------------------------------------------------------------


@register(
    "surrogate_keys",
    oracle="""
    SELECT CAST(c_custkey AS VARCHAR) AS customer_id,
           'bank_a' AS source_system,
           concat_ws('-', CAST(c_custkey AS VARCHAR), 'bank_a') AS customer_key,
           CASE WHEN c_acctbal < 0 THEN NULL
                ELSE concat_ws('-', CAST(c_custkey AS VARCHAR), 'bank_a')
           END AS solvent_customer_key
    FROM customer
    """,
)
def surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cid = F.col("c_custkey").cast("string")
    key = F.concat_ws("-", cid, F.lit("bank_a"))
    return c.select(
        cid.alias("customer_id"),
        F.lit("bank_a").alias("source_system"),
        key.alias("customer_key"),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("string"))
        .otherwise(key)
        .alias("solvent_customer_key"),
    )


# ---------------------------------------------------------------------------
# §2.2 quarantine catalog — P7 null checks, P8 set membership, P11 numeric
# range, P12 length/blank. Flag, never drop (silver_transactions.py:94-102).
# ---------------------------------------------------------------------------


@register(
    "quarantine_flags",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           (o_orderkey IS NULL
            OR length(trim(o_orderpriority)) = 0
            OR o_orderstatus NOT IN ('O', 'F', 'P')
            OR o_totalprice IS NULL
            OR o_totalprice < 0) AS is_quarantined
    FROM orders
    """,
)
def quarantine_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    flag = (
        F.col("o_orderkey").isNull()
        | (F.length(F.trim(F.col("o_orderpriority"))) == 0)
        | ~F.col("o_orderstatus").isin("O", "F", "P")
        | F.col("o_totalprice").isNull()
        | (F.col("o_totalprice") < 0)
    )
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice", flag.alias("is_quarantined"))


# ---------------------------------------------------------------------------
# W1/P4 — row_number keep-latest-per-key dedup
# (silver_transactions.py:106-116). Deterministic: unique key tiebreak.
# Single shuffle on the partition key; at 100 TB this is the canonical
# "compact replays" step and shares partitioning with the downstream merge.
# ---------------------------------------------------------------------------


@register(
    "window_dedup_latest",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC NULLS LAST
             ) AS _rn
      FROM orders
    ) WHERE _rn = 1
    """,
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc_nulls_last(), F.col("o_orderkey").desc_nulls_last()
    )
    return (
        o.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# U1 — unionByName with allowMissingColumns (silver_transactions.py:67):
# two banks' schemas harmonized; missing columns null-filled.
# ---------------------------------------------------------------------------


@register(
    "union_by_name",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS DOUBLE) AS acctbal
    FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bank_a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_mktsegment", F.col("c_acctbal").alias("acctbal")
    )
    # bank_b lacks the balance column entirely; different column order on purpose
    bank_b = c.filter(F.col("c_mktsegment") != "BUILDING").select(
        "c_name", "c_custkey", "c_mktsegment"
    )
    return bank_a.unionByName(bank_b, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# J1 — left join onto a filtered dimension, filter in the ON clause so
# non-matches keep the fact row with NULL attributes
# (fact_transaction.py:87-90). Dim side is broadcast (tiny at any SF ratio).
# ---------------------------------------------------------------------------


@register(
    "join_filtered_dim",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name AS customer_name,
           c.c_mktsegment AS customer_segment
    FROM orders o
    LEFT JOIN customer c
      ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0
    """,
)
def join_filtered_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("customer_segment"),
    )


# ---------------------------------------------------------------------------
# J2 — two-hop left join chain (fact_dispute.py:74-82: dispute→txn→account).
# lineitem→orders→customer inherits customer attributes onto line items.
# ---------------------------------------------------------------------------


@register(
    "two_hop_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
           o.o_orderdate, c.c_name AS customer_name
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_linenumber = 1
    """,
)
def two_hop_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            "o_orderdate",
            F.col("c_name").alias("customer_name"),
        )
    )


# ---------------------------------------------------------------------------
# J3 — left anti join: insert-if-absent idempotence
# (silver_settlements.py:94-113). Customers that placed no orders.
# ---------------------------------------------------------------------------


@register(
    "anti_join_absent",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# Semi join — EXISTS complement of J3 (engine extension per SURVEY §2.3).
@register(
    "semi_join_present",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def semi_join_present(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# A1 — global MAX watermark capture (catch_new_watermark_value.py:29-40).
# ---------------------------------------------------------------------------


@register(
    "watermark_max",
    oracle="""
    SELECT CAST(CAST(max(ts) AS TIMESTAMP) AS VARCHAR) AS max_wm,
           count(*) AS rows_processed
    FROM events
    """,
)
def watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.max("ts").cast("string").alias("max_wm"),
        F.count("*").alias("rows_processed"),
    )


# ---------------------------------------------------------------------------
# S6/M4 — incremental read with watermark predicate pushdown
# (pl_sql_copy_bronze.json:632: `wm_col > '<last_wm>'`, empty ⇒ full scan).
# The filter reaches the parquet scan as a pushed predicate.
# ---------------------------------------------------------------------------


@register(
    "incremental_watermark_read",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
    """,
)
def incremental_watermark_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


# ---------------------------------------------------------------------------
# O1/O3 — global top-k with null-ordering control (fetch_logs.py:29-33:
# orderBy desc_nulls_last → limit → TakeOrderedAndProject, no full sort).
# Unique tiebreak makes the selected set deterministic.
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey DESC NULLS LAST
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").desc_nulls_last())
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# A5 — distinct-by-key (dropDuplicates survivor is arbitrary in Spark, so the
# hash-checked surface uses full-row DISTINCT; the deterministic keyed variant
# is window_dedup_latest above — same deviation SURVEY §2.4 documents for
# silver_fx_rates.py:67-68).
# ---------------------------------------------------------------------------


@register(
    "distinct_projection",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# §2.4 extension — grouped aggregation surface the driver exercises:
# sum/avg/min/max/count/countDistinct (+ conditional agg). Partial hash agg
# map-side; one shuffle on the group key.
# ---------------------------------------------------------------------------


@register(
    "grouped_agg_rich",
    oracle="""
    SELECT c_mktsegment,
           count(*)                                          AS n_orders,
           count(DISTINCT o.o_custkey)                       AS n_customers,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_revenue,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_order_value,
           min(o.o_totalprice)                               AS min_order,
           max(o.o_totalprice)                               AS max_order,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_finished
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c_mktsegment
    """,
)
def grouped_agg_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Money aggregates run on DECIMAL(18,2), not DOUBLE: decimal sums are
    # exact and order-independent, so the result is stable no matter how
    # Catalyst splits the partial aggregation (round 1 shipped a last-ulp
    # hash mismatch vs the oracle when summing doubles). The FINAL outputs
    # are DOUBLE/BIGINT, not DECIMAL/HUGEINT: the driver's value hash is
    # dtype-sensitive (DuckDB DECIMAL and HUGEINT surface as float64/object
    # in pandas, mismatching Spark's Decimal/int64 even for equal values —
    # round 2's failure mechanism). One exact-decimal→double cast and an
    # IEEE double division are bit-deterministic on both engines.
    o = load(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("price_dec").cast("double").alias("total_revenue"),
            (F.sum("price_dec").cast("double") / F.count("*")).alias("avg_order_value"),
            F.min("o_totalprice").alias("min_order"),
            F.max("o_totalprice").alias("max_order"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        )
    )


# ---------------------------------------------------------------------------
# ROLLUP — multi-level aggregation (engine extension; Catalyst Expand).
# ---------------------------------------------------------------------------


@register(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_rows")
    )


# ---------------------------------------------------------------------------
# Analytic windows (SURVEY §2.5 extension: lag/lead + frames are the natural
# SCD2-interval tooling). Running sum + lead with deterministic ordering.
# ---------------------------------------------------------------------------


@register(
    "window_running_and_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           lead(o_orderdate) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
           ) AS next_order_date
    FROM orders
    WHERE o_custkey <= 100
    """,
)
def window_running_and_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    ordering = [F.col("o_orderdate").asc_nulls_first(), F.col("o_orderkey").asc_nulls_first()]
    w = W.partitionBy("o_custkey").orderBy(*ordering)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2
        ).alias("running_spend"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
    )


# ---------------------------------------------------------------------------
# §2.8 scalar functions: string (concat_ws/upper/trim/length), date
# (to_date/year), conditional (coalesce / when). One pass over customer.
# ---------------------------------------------------------------------------


@register(
    "scalar_functions",
    oracle="""
    SELECT c_custkey,
           upper(trim(c_name))                       AS name_upper,
           length(c_name)                            AS name_len,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           coalesce(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           CASE WHEN c_acctbal >= 5000 THEN 'HIGH'
                WHEN c_acctbal >= 0 THEN 'MID'
                ELSE 'NEG' END                        AS balance_band
    FROM customer
    """,
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.trim(F.col("c_name"))).alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_or_default"
        ),
        F.when(F.col("c_acctbal") >= 5000, "HIGH")
        .when(F.col("c_acctbal") >= 0, "MID")
        .otherwise("NEG")
        .alias("balance_band"),
    )


# ---------------------------------------------------------------------------
# Date/time functions (§2.8): to_date, date_format-style parts, datediff.
# ---------------------------------------------------------------------------


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE)                  AS order_date,
           CAST(year(o_orderdate) AS INT)             AS order_year,
           CAST(month(o_orderdate) AS INT)            AS order_month,
           CAST(quarter(o_orderdate) AS INT)          AS order_quarter,
           strftime(o_orderdate, '%Y-%m')             AS order_ym
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")).select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.quarter("o_orderdate").cast("int").alias("order_quarter"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
    )


# ---------------------------------------------------------------------------
# JSON extraction over events.props (§2.8 extension; driver fixture).
# ---------------------------------------------------------------------------


@register(
    "json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    prop_k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_id", "event_type", prop_k.alias("prop_k"))
        .filter(F.col("prop_k") > 50)
    )


# ---------------------------------------------------------------------------
# TPC-H-ish Q3 — shipping-priority: selective join chain + agg + top-k.
# Bench headline: tests join order, broadcast of customer, partial agg.
# ---------------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H-ish Q5 — five-way join through the region→nation→customer star plus
# supplier co-nation constraint. Exercises multi-join planning; small dims
# broadcast, the lineitem↔orders join is the only big shuffle.
# ---------------------------------------------------------------------------


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H-ish Q6 — pure scan+filter+agg: the pushdown showcase. The three
# predicates reach the parquet reader; no shuffle at all (single global agg).
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue_change",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Pivot — conditional-agg reshaping (engine extension; oracle as CASE sums
# so names/values align without DuckDB PIVOT syntax).
# ---------------------------------------------------------------------------


@register(
    "pivot_status_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           round(sum(CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice ELSE 0 END), 2) AS open_total,
           round(sum(CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice ELSE 0 END), 2) AS finished_total,
           round(sum(CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice ELSE 0 END), 2) AS pending_total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    joined = o.join(c, o.o_custkey == c.c_custkey)

    def status_total(code: str):
        return F.round(
            F.sum(F.when(F.col("o_orderstatus") == code, F.col("o_totalprice")).otherwise(0.0)), 2
        )

    return joined.groupBy("c_mktsegment").agg(
        status_total("O").alias("open_total"),
        status_total("F").alias("finished_total"),
        status_total("P").alias("pending_total"),
    )
