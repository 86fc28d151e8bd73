"""Driver-contract smoke: entry() + every query runs and returns rows."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_have_rows_at_sf0001(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() > 0, name


def test_oracle_keys_subset_of_queries():
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs
