"""Silver layer — declarative per-entity specs + one generic loader.

The reference's 11 silver notebooks differ only in (schema, DQ predicates,
dedup ordering, load pattern). Here each is a row in a registry (the same
role load_config.csv plays for bronze —
2_bronze_ingestion_adf/configs/load_config.csv), executed by ONE loader:

  conform (P1-P3) → quarantine flag (§2.2) → keyed dedup (W1/A5)
  → load pattern M1 (SCD2 merge) | M2 (idempotent append) | M3 (full refresh)

Conform/DQ column lists and rules are verbatim from the reference
(citations per entity). `upper_cols`/`trim_cols` reproduce its
normalization (e.g. upper(currency) — silver_transactions.py:79).

silver.disputes is reconstructed (SURVEY §7.3): the reference repo ships a
gold notebook under the silver folder and no true silver_disputes
transform; schema follows the generator (7_datasets/generator/
fact_generators.py:446-453) + the gold expectations (is_current ⇒ SCD2).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..engine.clock import Clock
from ..engine.tableio import Warehouse
from ..operators.appends import append_if_absent
from ..operators.conform import harmonize_union
from ..operators.dedup import distinct_by_key, latest_by_recency
from ..operators.quality import (
    apply_quarantine, bad_length, blank, inverted_range, negative,
    non_positive, not_in, null_,
)
from ..operators.scd2 import scd2_init, scd2_merge


@dataclass(frozen=True)
class EntitySpec:
    name: str
    # output name -> (source col, type); type 'date'/'timestamp' use to_date/to_timestamp
    columns: dict[str, tuple[str, str]]
    key: str | None  # business key column (surrogate) driving dedup/merge
    key_sources: dict[str, tuple[str, bool]] = field(default_factory=dict)
    # key col -> (natural id col, nullable): nullable keys keep NULL (P9)
    upper_cols: tuple[str, ...] = ()
    trim_cols: tuple[str, ...] = ()
    dq_rules: tuple = ()  # callables df-independent -> Column
    dedup: str = "by_key"  # by_key | latest | none
    recency: tuple[str, ...] = ()  # for dedup="latest"
    load: str = "full_refresh"  # scd2 | append | full_refresh
    compare_cols: tuple[str, ...] = ()  # scd2 change-detection columns
    per_bank: bool = True  # two bronze sources unioned vs single file


def _typed(col: str, typ: str) -> Column:
    if typ == "date":
        return F.to_date(F.col(col))
    if typ == "timestamp":
        return F.to_timestamp(F.col(col))
    return F.col(col).cast(typ)


def conform_entity(spec: EntitySpec, sources: list[tuple[DataFrame, str | None]]) -> DataFrame:
    """sources: list of (raw df, source_system tag or None for tag-less feeds)."""
    # per_bank entities arrive as one tagged feed per source system (the
    # reference's two banks); single-source entities arrive as exactly one
    # untagged file. Validating here is what makes the flag load-bearing —
    # a mis-wired caller fails loudly instead of silently dropping the
    # source_system lineage column SCD2 change-detection depends on.
    if spec.per_bank:
        if any(tag is None for _, tag in sources):
            raise ValueError(
                f"entity '{spec.name}' is per_bank: every source needs a "
                "source_system tag"
            )
    elif len(sources) != 1 or sources[0][1] is not None:
        raise ValueError(
            f"entity '{spec.name}' is single-source: expected exactly one "
            "untagged feed"
        )
    tagged = []
    for df, tag in sources:
        tagged.append(df.withColumn("source_system", F.lit(tag)) if tag else df)
    df = harmonize_union(tagged) if len(tagged) > 1 else tagged[0]

    cols = [_typed(src, typ).alias(out) for out, (src, typ) in spec.columns.items()]
    if "source_system" in df.columns:
        cols.append(F.col("source_system").cast("string").alias("source_system"))
    out = df.select(*cols)

    for c in spec.upper_cols:
        out = out.withColumn(c, F.upper(F.col(c)))
    for c in spec.trim_cols:
        out = out.withColumn(c, F.trim(F.col(c)))

    for key_col, (natural, nullable) in spec.key_sources.items():
        k = F.concat_ws("-", F.col(natural), F.col("source_system"))
        if nullable:
            k = F.when(F.col(natural).isNull(), F.lit(None).cast("string")).otherwise(k)
        out = out.withColumn(key_col, k)

    out = apply_quarantine(out, [r() for r in spec.dq_rules])

    if spec.dedup == "latest" and spec.key:
        out = latest_by_recency(out, [spec.key], list(spec.recency))
    elif spec.dedup == "by_key" and spec.key:
        out = distinct_by_key(out, [spec.key])
    return out


def load_entity(
    wh: Warehouse, spec: EntitySpec, staged: DataFrame, clock: Clock
) -> int:
    """Apply the entity's load pattern against the warehouse silver table.
    Returns rows written (the overwrite's footer count), so callers can
    audit without a re-read."""
    now = clock.now()
    if spec.load == "scd2":
        if wh.exists("silver", spec.name):
            target = wh.read("silver", spec.name)
            new_state = scd2_merge(target, staged, spec.key, list(spec.compare_cols), now)
        else:
            new_state = scd2_init(staged, now)
        return wh.overwrite(new_state, "silver", spec.name)
    elif spec.load == "append":
        batch = staged.withColumn("audit_insertdate", F.lit(now).cast("timestamp"))
        if wh.exists("silver", spec.name):
            new_state = append_if_absent(wh.read("silver", spec.name), batch, spec.key)
        else:
            new_state = batch
        return wh.overwrite(new_state, "silver", spec.name)
    else:  # full refresh — M3
        return wh.overwrite(staged, "silver", spec.name)


# ---------------------------------------------------------------------------
# Registry — one spec per reference silver notebook.
# ---------------------------------------------------------------------------

SILVER_SPECS: dict[str, EntitySpec] = {}


def _spec(s: EntitySpec) -> EntitySpec:
    SILVER_SPECS[s.name] = s
    return s


# silver_transactions.py:73-116 (conform/keys/DQ/W1), :123-201 (M1)
_spec(EntitySpec(
    name="transactions",
    columns={
        "transaction_id": ("transaction_id", "string"),
        "account_id": ("account_id", "string"),
        "booking_ts": ("booking_ts", "timestamp"),
        "value_ts": ("value_ts", "timestamp"),
        "amount": ("amount", "double"),
        "currency": ("currency", "string"),
        "direction": ("direction", "string"),
        "channel": ("channel", "string"),
        "merchant_id": ("merchant_id", "string"),
        "counterparty_id": ("counterparty_id", "string"),
        "txn_type": ("txn_type", "string"),
        "status": ("status", "string"),
    },
    key="transaction_key",
    key_sources={
        "transaction_key": ("transaction_id", False),
        "account_key": ("account_id", False),
        "merchant_key": ("merchant_id", True),
        "counterparty_key": ("counterparty_id", True),
    },
    upper_cols=("currency", "direction", "status"),
    dq_rules=(
        lambda: blank("transaction_id"),
        lambda: blank("account_id"),
        lambda: null_("booking_ts"),
        lambda: null_("amount"),
        lambda: F.col("currency").isNull() | (F.length(F.trim(F.col("currency"))) != 3),
        lambda: not_in("direction", "DEBIT", "CREDIT"),
    ),
    dedup="latest",
    recency=("booking_ts", "value_ts"),
    load="scd2",
    # source_system + is_quarantined included for reference parity: its <>
    # chains compare them (silver_transactions.py:127-143), so a NULL→value
    # transition on a DQ-checked column that only flips the quarantine flag
    # still expires+reinserts the current row.
    compare_cols=(
        "account_id", "booking_ts", "value_ts", "amount", "currency", "direction",
        "channel", "merchant_id", "counterparty_id", "txn_type", "status",
        "source_system", "is_quarantined",
    ),
))

# silver_customers.py:64-97 (conform/DQ/W1), :104-159 (M1)
_spec(EntitySpec(
    name="customers",
    columns={
        "customer_id": ("customer_id", "string"),
        "first_name": ("first_name", "string"),
        "last_name": ("last_name", "string"),
        "dob": ("dob", "date"),
        "country": ("country", "string"),
        "created_at": ("created_at", "timestamp"),
        "updated_at": ("updated_at", "timestamp"),
    },
    key="customer_key",
    key_sources={"customer_key": ("customer_id", False)},
    dq_rules=(
        lambda: blank("customer_id"),
        lambda: blank("first_name"),
        lambda: blank("last_name"),
        lambda: null_("dob"),
    ),
    dedup="latest",
    recency=("updated_at", "created_at"),
    load="scd2",
    compare_cols=("first_name", "last_name", "dob", "country", "created_at",
                  "updated_at", "source_system", "is_quarantined"),
))

# silver_accounts.py:67-98 (conform/DQ/A5), :106-169 (M1)
_spec(EntitySpec(
    name="accounts",
    columns={
        "account_id": ("account_id", "string"),
        "customer_id": ("customer_id", "string"),
        "iban": ("iban", "string"),
        "product_id": ("product_id", "string"),
        "branch_id": ("branch_id", "string"),
        "currency": ("currency", "string"),
        "status": ("status", "string"),
        "opened_at": ("opened_at", "timestamp"),
        "closed_at": ("closed_at", "timestamp"),
    },
    key="account_key",
    key_sources={"account_key": ("account_id", False), "customer_key": ("customer_id", False)},
    upper_cols=("status",),
    dq_rules=(
        lambda: blank("account_id"),
        lambda: blank("customer_id"),
        lambda: blank("product_id"),
        lambda: blank("branch_id"),
        lambda: blank("currency"),
        lambda: inverted_range("opened_at", "closed_at"),
    ),
    dedup="by_key",
    load="scd2",
    compare_cols=(
        "customer_id", "iban", "product_id", "branch_id", "currency",
        "status", "opened_at", "closed_at", "source_system", "is_quarantined",
    ),
))

# silver_settlements.py:64-113 (conform/DQ/keys, M2 anti-join append)
_spec(EntitySpec(
    name="settlements",
    columns={
        "settlement_id": ("settlement_id", "string"),
        "transaction_id": ("transaction_id", "string"),
        "settlement_date": ("settlement_date", "date"),
        "settled_amount": ("settled_amount", "double"),
        "currency": ("currency", "string"),
        "fx_rate_used": ("fx_rate_used", "double"),
        "fees": ("fees", "double"),
        "settlement_status": ("settlement_status", "string"),
    },
    key="settlement_key",
    key_sources={
        "settlement_key": ("settlement_id", False),
        "transaction_key": ("transaction_id", False),
    },
    upper_cols=("currency", "settlement_status"),
    dq_rules=(
        lambda: blank("settlement_id"),
        lambda: blank("transaction_id"),
        lambda: null_("settlement_date"),
        lambda: null_("settled_amount"),
        lambda: F.col("currency").isNull() | (F.length(F.trim(F.col("currency"))) != 3),
    ),
    dedup="none",
    load="append",
))

# reconstructed silver.disputes (SURVEY §7.3; generator fact_generators.py:446-453)
_spec(EntitySpec(
    name="disputes",
    columns={
        "dispute_id": ("dispute_id", "string"),
        "transaction_id": ("transaction_id", "string"),
        "reason": ("reason", "string"),
        "opened_date": ("opened_date", "date"),
        "resolved_date": ("resolved_date", "date"),
        "outcome": ("outcome", "string"),
    },
    key="dispute_key",
    key_sources={
        "dispute_key": ("dispute_id", False),
        "transaction_key": ("transaction_id", False),
    },
    upper_cols=("outcome",),
    dq_rules=(
        lambda: blank("dispute_id"),
        lambda: blank("transaction_id"),
        lambda: null_("opened_date"),
        lambda: blank("outcome"),
    ),
    dedup="by_key",
    load="scd2",
    compare_cols=("reason", "opened_date", "resolved_date", "outcome",
                  "source_system", "is_quarantined"),
))

# silver_products.py:51-67 (conform/DQ/A5), :75-82 (M3)
_spec(EntitySpec(
    name="products",
    columns={
        "product_id": ("product_id", "string"),
        "product_type": ("product_type", "string"),
        "currency": ("currency", "string"),
        "interest_rate": ("interest_rate", "double"),
        "monthly_fee": ("monthly_fee", "double"),
    },
    key="product_id",
    dq_rules=(
        lambda: blank("product_id"),
        lambda: blank("product_type"),
        lambda: blank("currency"),
        lambda: F.col("interest_rate").isNull() | negative("interest_rate"),
        lambda: F.col("monthly_fee").isNull() | negative("monthly_fee"),
    ),
    dedup="by_key",
    load="full_refresh",
))

# silver_merchants.py:59-75
_spec(EntitySpec(
    name="merchants",
    columns={
        "merchant_id": ("merchant_id", "string"),
        "merchant_name": ("merchant_name", "string"),
        "mcc_code": ("mcc_code", "string"),
        "country": ("country", "string"),
        "city": ("city", "string"),
    },
    key="merchant_key",
    key_sources={"merchant_key": ("merchant_id", False)},
    dq_rules=(
        lambda: blank("merchant_id"),
        lambda: blank("merchant_name"),
        lambda: blank("mcc_code"),
    ),
    dedup="by_key",
    load="full_refresh",
))

# silver_branches.py:58-72
_spec(EntitySpec(
    name="branches",
    columns={
        "branch_id": ("branch_id", "string"),
        "branch_name": ("branch_name", "string"),
        "city": ("city", "string"),
        "country": ("country", "string"),
    },
    key="branch_key",
    key_sources={"branch_key": ("branch_id", False)},
    dq_rules=(lambda: blank("branch_id"), lambda: blank("branch_name")),
    dedup="by_key",
    load="full_refresh",
))

# silver_counterparties.py:59-78
_spec(EntitySpec(
    name="counterparties",
    columns={
        "counterparty_id": ("counterparty_id", "string"),
        "counterparty_name": ("counterparty_name", "string"),
        "counterparty_type": ("counterparty_type", "string"),
        "bank_bic": ("bank_bic", "string"),
        "country": ("country", "string"),
    },
    key="counterparty_key",
    key_sources={"counterparty_key": ("counterparty_id", False)},
    dq_rules=(
        lambda: blank("counterparty_id"),
        lambda: blank("counterparty_name"),
        lambda: blank("counterparty_type"),
    ),
    dedup="by_key",
    load="full_refresh",
))

# silver_mcc_codes.py:44-57 — single source, no source_system/key concat
_spec(EntitySpec(
    name="mcc_codes",
    columns={
        "mcc_code": ("mcc_code", "string"),
        "mcc_description": ("mcc_description", "string"),
        "mcc_category": ("mcc_category", "string"),
    },
    key="mcc_code",
    trim_cols=("mcc_code", "mcc_description", "mcc_category"),
    dq_rules=(
        lambda: F.col("mcc_code").isNull() | (F.length(F.col("mcc_code")) == 0),
        lambda: F.col("mcc_description").isNull() | (F.length(F.col("mcc_description")) == 0),
    ),
    dedup="by_key",
    load="full_refresh",
    per_bank=False,
))

# silver_fx_rates.py:47-68 — single (API) source; latest obs per currency
_spec(EntitySpec(
    name="fx_rates",
    columns={
        "base_currency": ("base_currency", "string"),
        "currency_code": ("currency_code", "string"),
        "currency_name": ("currency_name", "string"),
        "rate": ("rate", "double"),
        "obs_date": ("obs_date", "date"),
        "as_of": ("as_of", "timestamp"),
    },
    key="currency_code",
    upper_cols=("base_currency", "currency_code"),
    trim_cols=("base_currency", "currency_code", "currency_name"),
    dq_rules=(
        lambda: F.col("base_currency").isNull() | bad_length("base_currency", 3),
        lambda: F.col("currency_code").isNull() | bad_length("currency_code", 3),
        lambda: F.col("rate").isNull() | non_positive("rate"),
        lambda: null_("obs_date"),
        lambda: null_("as_of"),
    ),
    # reference uses orderBy→dropDuplicates (non-deterministic survivor,
    # silver_fx_rates.py:67-68); we use the deterministic W1 pattern —
    # deviation documented in SURVEY §2.4.
    dedup="latest",
    recency=("obs_date", "as_of"),
    load="full_refresh",
    per_bank=False,
))
