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


def test_driver_window_is_pinned():
    """The driver's CORRECTNESS pass verifies a 50-key prefix of queries().
    Two invariants, both WINDOW-RELATIVE so rotating the window between
    rounds cannot stale this test (hardcoded per-round snapshots broke in
    r2 and again in r6):
      1. the registry surfaces exactly _PRIORITY as its prefix — a module
         edit must not silently displace the driver window;
      2. a key runs without an oracle ONLY when the registry documents it
         in ROWS_ONLY_BY_DESIGN — dropping an oracle by accident (or adding
         an unoracled key without its property-test story) fails here."""
    from experiments_datafusion_spark.queries import (
        ROWS_ONLY_BY_DESIGN,
        _PRIORITY,
        all_queries,
    )

    keys = list(entrymod.queries())
    assert len(_PRIORITY) <= 50
    assert keys[: len(_PRIORITY)] == list(_PRIORITY)
    unoracled = {n for n, q in all_queries().items() if q.oracle is None}
    assert unoracled == ROWS_ONLY_BY_DESIGN, (
        unoracled ^ ROWS_ONLY_BY_DESIGN
    )


def test_table_sample_deterministic_and_bounded(spark, sf_dir):
    from experiments_datafusion_spark.queries import all_queries

    fn = all_queries()["table_sample"].fn
    n1 = fn(spark, sf_dir).count()
    n2 = fn(spark, sf_dir).count()
    total = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert n1 == n2  # seeded sample is reproducible
    assert 0.05 * total < n1 < 0.15 * total  # ~10% Bernoulli


def test_bench_headline_keys_valid():
    """bench.py's key lists must stay consistent with the registry: every
    headline key exists, the oracle-exclusion list only names ORACLED
    headline keys (excluding a rows-only key would be a no-op typo), and
    the r4-comparable anchor is exactly the headline's first 29 entries —
    the cross-round comparability contract."""
    from bench import BENCH_ORACLE_EXCLUDE, HEADLINE, R4_COMPARABLE
    from experiments_datafusion_spark.queries import all_queries

    q = all_queries()
    missing = [k for k in HEADLINE if k not in q]
    assert not missing, missing
    assert set(BENCH_ORACLE_EXCLUDE) <= set(HEADLINE)
    for k in BENCH_ORACLE_EXCLUDE:
        assert q[k].oracle is not None, f"{k}: excluded but has no oracle anyway"
    assert tuple(R4_COMPARABLE) == tuple(HEADLINE[:29])
