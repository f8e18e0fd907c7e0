"""End-to-end medallion walkthrough — the engine's pl_master in ~30 lines.

Builds the banking warehouse from the test fixtures (bronze frames for two
banks), runs bronze→silver→gold with audit bracketing and the reference's
DAG edges, then prints the resulting star schema and audit trail.

    python examples/medallion_demo.py
"""

from __future__ import annotations

import datetime as dt
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.engine import get_spark
from end_to_end_azure_data_engineering_spark.engine.clock import FixedClock
from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
from end_to_end_azure_data_engineering_spark.plans.audit import AuditLog
from end_to_end_azure_data_engineering_spark.plans.pipeline import run_pipeline
from tests.fixtures_banking import bronze_frames


def main() -> None:
    spark = get_spark("medallion_demo")
    spark.sparkContext.setLogLevel("ERROR")
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="sg_demo_"))
    clock = FixedClock(dt.datetime(2024, 2, 1, 12, 0, 0))

    run_pipeline(wh, bronze_frames(spark), clock)

    print("\n== gold star schema ==")
    for t in ["dim_customer", "dim_account", "dim_merchant", "dim_counterparty",
              "fact_transaction", "fact_settlement", "fact_dispute"]:
        print(f"  gold.{t:18s} {wh.read('gold', t).count():6d} rows")

    tx = wh.read("silver", "transactions")
    print("\n== silver.transactions quarantine split ==")
    tx.groupBy("is_quarantined").count().orderBy("is_quarantined").show()

    print("== audit trail (last 6) ==")
    AuditLog(wh).read().orderBy(F.col("inserted_at").desc()).select(
        "source_system", "source_object", "status", "rows_processed"
    ).show(6, truncate=False)


if __name__ == "__main__":
    main()
