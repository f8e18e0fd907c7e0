"""Banking-domain fixtures per FIXTURES.md §B — small but join-complete,
two banks, ~5% dirty rows per quarantine rule, both direction vocabularies
(IN/OUT vs DEBIT/CREDIT — the reference inconsistency SURVEY §2.2 pins).
Deterministic: seeded random, fixed timestamps.
"""

from __future__ import annotations

import datetime as dt
import random

BASE = dt.datetime(2024, 1, 1, 9, 0, 0)


def _ts(days=0, hours=0, minutes=0):
    return BASE + dt.timedelta(days=days, hours=hours, minutes=minutes)


def make_bank(bank: str, n_cust=40, n_acct=60, n_txn=200, seed=7):
    rng = random.Random(seed + hash(bank) % 1000)
    customers, accounts, transactions, settlements, disputes = [], [], [], [], []

    for i in range(n_cust):
        dirty = i % 20 == 19
        customers.append({
            "customer_id": f"CUST{i:06d}",
            "first_name": "" if dirty else f"First{i}",
            "last_name": f"Last{i}",
            "dob": None if i % 25 == 24 else dt.date(1980 + i % 30, 1 + i % 12, 1 + i % 28),
            "country": ["Luxembourg", "France", "Germany", "Belgium", "Switzerland"][i % 5],
            "created_at": _ts(days=-100 + i),
            "updated_at": _ts(days=-100 + i) if i % 10 < 7 else _ts(days=-50 + i),
        })

    for i in range(n_acct):
        cust = f"CUST{(i % n_cust):06d}"
        opened = _ts(days=-200 + i)
        inverted = i % 17 == 16  # closed_at < opened_at quarantine rule
        closed = opened - dt.timedelta(days=5) if inverted else (
            opened + dt.timedelta(days=30) if i % 8 == 7 else None
        )
        accounts.append({
            "account_id": f"ACC{i:07d}",
            "customer_id": cust,
            "iban": f"LU{rng.randint(10**15, 10**16 - 1)}",
            "product_id": f"PR{(i % 8):03d}",
            "branch_id": f"BR{(i % 10):03d}",
            "currency": "EUR",
            "status": "closed" if closed is not None and not inverted else "open",
            "opened_at": opened,
            "closed_at": closed,
        })

    for i in range(n_txn):
        dirty_dir = i % 10 < 3  # IN/OUT vocabulary → quarantined per the rule
        bad_ccy = i % 33 == 32
        transactions.append({
            "transaction_id": f"TXN{i:010d}",
            "account_id": f"ACC{(i % n_acct):07d}",
            "booking_ts": _ts(days=i % 30, minutes=i),
            "value_ts": _ts(days=i % 30 + 1, minutes=i),
            "amount": None if i % 41 == 40 else round(rng.uniform(-500, 500), 2),
            "currency": "EURO" if bad_ccy else "eur",
            "direction": ("IN" if i % 2 else "OUT") if dirty_dir else ("debit" if i % 2 else "credit"),
            "channel": ["CARD", "TRANSFER", "ATM", "SYSTEM"][i % 4],
            "merchant_id": f"MRC{(i % 50):06d}" if i % 4 == 0 else None,
            "counterparty_id": f"CP{(i % 60):06d}" if i % 4 == 1 else None,
            "txn_type": ["CARD_PURCHASE", "TRANSFER", "ATM_WITHDRAWAL", "BANK_FEE", "INTEREST"][i % 5],
            "status": ["booked", "reversed", "failed"][i % 3],
        })

    for i in range(n_txn):
        if i % 2 == 0:
            settlements.append({
                "settlement_id": f"STL{i:010d}",
                "transaction_id": f"TXN{i:010d}",
                "settlement_date": (_ts(days=i % 30 + 2)).date(),
                "settled_amount": round(rng.uniform(0, 500), 2),
                "currency": "EUR",
                "fx_rate_used": 1.0,
                "fees": -round(rng.uniform(0, 8), 2),
                "settlement_status": ["settled", "pending", "failed", "reversed"][i % 4],
            })

    for i in range(0, n_txn, 25):
        disputes.append({
            "dispute_id": f"DSP{i:010d}",
            "transaction_id": f"TXN{i:010d}",
            "reason": ["FRAUD", "DUPLICATE", "NOT_RECEIVED"][i % 3],
            "opened_date": (_ts(days=i % 30 + 3)).date(),
            "resolved_date": None if i % 2 else (_ts(days=i % 30 + 40)).date(),
            "outcome": ["WON", "LOST", "PARTIAL", "PENDING"][i % 4],
        })

    return {
        "customers": customers, "accounts": accounts, "transactions": transactions,
        "settlements": settlements, "disputes": disputes,
    }


def make_reference_tables():
    products = [
        {"product_id": f"PR{i:03d}", "product_type": ["CURRENT", "SAVINGS", "LOAN", "CARD"][i % 4],
         "currency": "EUR",
         "interest_rate": -0.5 if i == 7 else round(0.01 * i, 4),  # one dirty
         "monthly_fee": round(1.5 * i, 2)}
        for i in range(8)
    ]
    branches = [
        {"branch_id": f"BR{i:03d}", "branch_name": "" if i == 9 else f"Branch {i}",
         "city": f"City{i}", "country": "Luxembourg"}
        for i in range(10)
    ]
    merchants = [
        {"merchant_id": f"MRC{i:06d}", "merchant_name": f"Merchant {i}",
         "mcc_code": f"{5000 + i:04d}", "country": "FR", "city": "ONLINE" if i % 7 == 0 else f"City{i}"}
        for i in range(50)
    ]
    counterparties = [
        {"counterparty_id": f"CP{i:06d}", "counterparty_name": f"CP {i}",
         "counterparty_type": ["PERSONAL", "EMPLOYER", "LANDLORD", "BUSINESS", "FINANCIAL_INSTITUTION"][i % 5],
         "bank_bic": None if i % 5 == 0 else f"BIC{i:05d}XXX", "country": "LU"}
        for i in range(60)
    ]
    mcc_codes = [
        {"mcc_code": f"{5000 + i:04d} ", "mcc_description": f" Category {i} desc ",
         "mcc_category": f"Cat{i % 5}"}
        for i in range(50)
    ]
    fx_rates = [
        {"base_currency": "EUR", "currency_code": c, "currency_name": n,
         "rate": r, "obs_date": d, "as_of": _ts(days=0)}
        for c, n, r, d in [
            ("USD", "US Dollar", 1.09, dt.date(2024, 1, 10)),
            ("USD", "US Dollar", 1.08, dt.date(2024, 1, 9)),   # older obs → deduped
            ("JPY", "Yen", 158.2, dt.date(2024, 1, 10)),
            ("GBP", "Pound", 0.86, dt.date(2024, 1, 10)),
            ("CHF", "Swiss Franc", 0.94, dt.date(2024, 1, 10)),
            ("XXX", "Bad rate", -1.0, dt.date(2024, 1, 10)),   # rate<=0 → quarantined
        ]
    ]
    return {
        "products": products, "branches": branches, "merchants": merchants,
        "counterparties": counterparties, "mcc_codes": mcc_codes, "fx_rates": fx_rates,
    }


def bronze_frames(spark):
    """Build the bronze dict the pipeline consumes: entity → [(df, tag)]."""
    import pandas as pd

    a, b = make_bank("bank_a"), make_bank("bank_b", seed=11)
    ref = make_reference_tables()

    def df(rows):
        return spark.createDataFrame(pd.DataFrame(rows))

    bronze = {}
    for ent in ["customers", "accounts", "transactions", "settlements", "disputes"]:
        bronze[ent] = [(df(a[ent]), "bank_a"), (df(b[ent]), "bank_b")]
    for ent in ["products", "branches", "merchants", "counterparties"]:
        bronze[ent] = [(df(ref[ent]), "bank_a"), (df(ref[ent]), "bank_b")]
    bronze["mcc_codes"] = [(df(ref["mcc_codes"]), None)]
    bronze["fx_rates"] = [(df(ref["fx_rates"]), None)]
    return bronze
