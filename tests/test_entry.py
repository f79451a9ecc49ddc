"""Driver-contract smoke: entry() rows>0; every oracle key has a query;
every query materializes at sf0.001."""

import pytest

import __spark_entry__ as entry_mod


def test_entry_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"seq", "url", "host", "depth", "priority", "rn"}


def test_oracle_keys_subset():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40 and len(os_) >= 30


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_runs_smoke(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, "/root/testdata/sf0.001")
    assert df.count() >= 0
