"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() align."""

import __spark_entry__ as ent
from tests.conftest import SF_DIR


def test_entry_returns_rows(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_registry_nonempty(spark):
    qs = ent.queries()
    assert len(qs) >= 20


def test_oracles_subset_of_queries():
    qs, os_ = ent.queries(), ent.oracle_sql()
    assert set(os_) <= set(qs)


def test_every_query_runs_sf0001(spark):
    for name, fn in ent.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()
