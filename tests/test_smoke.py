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


def test_round5_driver_window_is_pinned():
    """The driver's CORRECTNESS pass verifies a 50-key prefix of queries().
    Round 5 aims that window at the 47 keys without a lifetime driver
    verdict plus 3 round-5 riders; a module edit must not silently
    displace them (the round-2 lesson)."""
    from experiments_datafusion_spark.queries import _PRIORITY

    keys = list(entrymod.queries())
    assert len(_PRIORITY) <= 50
    assert keys[: len(_PRIORITY)] == list(_PRIORITY)
    # every priority key is driver-checkable; the hash-knob production
    # twin is the one documented rows-only exception this round
    # (xxhash64 has no DuckDB replay)
    import experiments_datafusion_spark.queries as Q

    q = Q.all_queries()
    unoracled = [n for n in _PRIORITY if q[n].oracle is None]
    assert unoracled == ["docs_winnowing_fast"], unoracled


def test_table_sample_deterministic_and_bounded(spark, sf_dir):
    from experiments_datafusion_spark.queries import all_queries

    fn = all_queries()["table_sample"].fn
    n1 = fn(spark, sf_dir).count()
    n2 = fn(spark, sf_dir).count()
    total = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n1 == n2  # seeded sample is reproducible
    assert 0.05 * total < n1 < 0.15 * total  # ~10% Bernoulli
