"""Driver-contract smoke tests for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(df.schema.fields) > 0
    assert len(rows) > 0


def test_queries_oracle_keys_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    missing = set(o) - set(q)
    assert not missing, f"oracle_sql keys not in queries(): {missing}"
