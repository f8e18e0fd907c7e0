"""Source connector tests: REST API (canned fetcher), incremental ingest
with watermark (M4) against parquet stand-ins, CSV reader."""

import datetime as dt

from pyspark.sql import functions as F

from end_to_end_azure_data_engineering_spark.engine.clock import FixedClock
from end_to_end_azure_data_engineering_spark.engine.tableio import Warehouse
from end_to_end_azure_data_engineering_spark.plans.audit import AuditLog
from end_to_end_azure_data_engineering_spark.sources.incremental import incremental_ingest
from end_to_end_azure_data_engineering_spark.sources.readers import (
    build_incremental_query, read_csv,
)
from end_to_end_azure_data_engineering_spark.sources.rest_api import fetch_fx_rates

ECB_CSV = """KEY,FREQ,CURRENCY,CURRENCY_DENOM,TIME_PERIOD,OBS_VALUE
EXR.M.USD.EUR.SP00.A,M,USD,EUR,2024-01,1.0905
EXR.M.USD.EUR.SP00.A,M,USD,EUR,2024-02,1.0810
EXR.M.JPY.EUR.SP00.A,M,JPY,EUR,2024-02,161.15
EXR.M.GBP.EUR.SP00.A,M,GBP,EUR,2024-02,0.8552
"""


def test_rest_api_latest_obs(spark):
    urls = []
    df = fetch_fx_rates(
        spark, fetcher=lambda u: (urls.append(u) or ECB_CSV),
        currencies=("USD", "JPY", "GBP"),
        as_of=dt.datetime(2024, 3, 1),
    )
    rows = {r.currency_code: r for r in df.collect()}
    assert set(rows) == {"USD", "JPY", "GBP"}
    assert rows["USD"].rate == 1.0810  # latest obs per currency survives
    assert rows["USD"].obs_date == dt.date(2024, 2, 1)
    assert "USD+JPY+GBP" in urls[0]


def test_incremental_query_builder():
    assert build_incremental_query("dbo", "t", "updated_at", "") == "SELECT * FROM dbo.t"
    assert (
        build_incremental_query("dbo", "t", "updated_at", "2024-01-01 00:00:00")
        == "SELECT * FROM dbo.t WHERE updated_at > '2024-01-01 00:00:00'"
    )


def test_incremental_ingest_watermark_cycle(spark, tmp_path):
    """M4 end-to-end: first run full-scans, captures max watermark; second
    run reads only rows past it; audit rows bracket both."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    clock = FixedClock(dt.datetime(2024, 3, 1, 0, 0, 0))
    audit = AuditLog(wh, clock)

    src_rows = [
        (1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)),
        (3, dt.datetime(2024, 1, 3)),
    ]
    src = spark.createDataFrame(src_rows, "id long, updated_at timestamp")

    def read_fn(last_wm: str):
        if last_wm:
            return src.filter(F.col("updated_at") > F.lit(last_wm).cast("timestamp"))
        return src

    t1 = incremental_ingest(audit, "sql", "orders", read_fn, "updated_at")
    assert wh.read("bronze", t1).count() == 3
    wm = audit.fetch_last_watermark("sql", "orders")
    assert wm.startswith("2024-01-03")

    clock.advance(hours=1)
    # source grows by one late row before wm and one new row after it
    src2_rows = src_rows + [(4, dt.datetime(2024, 1, 4))]
    src2 = spark.createDataFrame(src2_rows, "id long, updated_at timestamp")

    def read_fn2(last_wm: str):
        return src2.filter(F.col("updated_at") > F.lit(last_wm).cast("timestamp"))

    t2 = incremental_ingest(audit, "sql", "orders", read_fn2, "updated_at")
    batch2 = wh.read("bronze", t2).collect()
    assert [r.id for r in batch2] == [4]  # only past-watermark rows land
    assert audit.fetch_last_watermark("sql", "orders").startswith("2024-01-04")
    logs = audit.read()
    assert logs.filter(F.col("status") == "SUCCESS").count() == 2


def test_incremental_ingest_failure_audited(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh2"))
    clock = FixedClock(dt.datetime(2024, 3, 1, 0, 0, 0))
    audit = AuditLog(wh, clock)

    def bad_read(last_wm: str):
        raise RuntimeError("source unavailable")

    try:
        incremental_ingest(audit, "sql", "broken", bad_read, "updated_at")
    except RuntimeError:
        pass
    logs = audit.read().filter(F.col("source_object") == "broken")
    statuses = {r.status for r in logs.collect()}
    assert statuses == {"STARTED", "FAILED"}


def test_csv_reader(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write('id,name\n1,"alpha, inc"\n2,beta\n')
    df = read_csv(spark, p)
    rows = {r.id: r.name for r in df.collect()}
    assert rows == {"1": "alpha, inc", "2": "beta"}


def test_incremental_ingest_partitioned_layout(spark, tmp_path):
    """SURVEY §4 upgrade: batches append into ONE table under
    _ingest_stamp= partitions; batch selection is partition pruning."""
    import re

    wh = Warehouse(spark, str(tmp_path / "wh_part"))
    audit = AuditLog(wh, FixedClock(dt.datetime(2024, 3, 1, 0, 0, 0)))
    src = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 2)),
         (3, dt.datetime(2024, 1, 3))],
        "id long, updated_at timestamp",
    )

    def read_fn(last_wm: str):
        return src.filter(F.col("updated_at") > last_wm) if last_wm else src

    t1 = incremental_ingest(audit, "bank_a", "tx", read_fn, "updated_at",
                            layout="partitioned")
    src2 = spark.createDataFrame([(4, dt.datetime(2024, 1, 4))],
                                 "id long, updated_at timestamp")
    src = src.unionByName(src2)
    t2 = incremental_ingest(audit, "bank_a", "tx", read_fn, "updated_at",
                            layout="partitioned")

    assert t1 == t2 == "tx"  # one table, not stamped names
    all_rows = wh.read("bronze", "tx")
    assert all_rows.count() == 4  # batch2 landed only the delta
    assert all_rows.select("_ingest_stamp").distinct().count() == 2

    # FixedClock gives both stamps the same time prefix — identify batch2's
    # stamp by its row, not by sort order (uuid suffix order is random)
    stamp2 = all_rows.filter(F.col("id") == 4).select("_ingest_stamp").first()[0]
    batch2 = all_rows.filter(F.col("_ingest_stamp") == stamp2)
    plan = batch2._sc._jvm.PythonSQLUtils.explainString(
        batch2._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and stamp2 in m.group(1), plan
    assert {r.id for r in batch2.collect()} == {4}


def test_read_csv_keep_corrupt_quarantines_bad_rows(spark, tmp_path):
    """ADF fault-tolerance twin: malformed lines surface in
    _corrupt_record for downstream quarantine instead of failing or
    silently vanishing."""
    import pytest as _pytest

    from end_to_end_azure_data_engineering_spark.sources.readers import read_csv

    p = tmp_path / "landing.csv"
    p.write_text(
        "id,amount,name\n"
        "1,10.5,alice\n"
        "2,notanumber,bob\n"      # type violation
        "3,7.25,carol\n"
    )
    df = read_csv(
        spark, str(p), schema="id int, amount double, name string",
        keep_corrupt=True,
    ).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 2
    assert [r.id for r in good.orderBy("id").collect()] == [1, 3]
    assert bad.count() == 1
    assert "notanumber" in bad.first()._corrupt_record
    df.unpersist()

    with _pytest.raises(ValueError):
        read_csv(spark, str(p), keep_corrupt=True)
