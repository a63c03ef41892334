"""Pytest face of the seeded differential query fuzzer
(tools/fuzz_differential.py): 40 random specs across all NINE families
(filter/group/aggregate, windows, set ops, scalars, outer joins with
derived NULLABLE join keys, GROUPING SETS with grouping() flags, and the
round-7 axes: correlated scalar/EXISTS/NOT-EXISTS subqueries with non-equi
correlation, and INTERSECT/EXCEPT [ALL] over derived nullable columns),
each lowered from ONE AST to both a Spark plan and a DuckDB SQL string and
compared under the registry normalization.  Probes the composition
space between the hand-written keys; seeded, so a failure reproduces with
`python tools/fuzz_differential.py 40 20240814 /root/testdata/sf0.001`."""

from __future__ import annotations

import duckdb
import pytest

from tools.fuzz_differential import run

SEED = 20240814


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_fuzz_40_specs(spark, sf_dir, duck):
    results = run(40, SEED, sf_dir, spark=spark, con=duck)
    fails = [(i, sql, d) for i, sql, ok, d in results if not ok]
    assert not fails, fails


def test_fuzz_decimal_datetime_40_specs(spark, sf_dir, duck):
    """Round-9 axes in isolation: decimal arithmetic (the int128/decimal
    accumulation family behind the r4 1-ulp skew — everything computed in
    DECIMAL and landed in exact integer units) and calendar conventions
    (the dayofweek/date_diff shift family — each kind pairs Spark's
    spelling with the convention-corrected DuckDB spelling).  Also green
    at sf0.01 and sf0.1 (run manually:
    `python -c "...run(40, 20250815, sf, only=('decimal','datetime'))"`)."""
    results = run(40, 20250815, sf_dir, spark=spark, con=duck, only=("decimal", "datetime"))
    fails = [(i, sql, d) for i, sql, ok, d in results if not ok]
    assert not fails, fails


def test_fuzz_frame_40_specs(spark, sf_dir, duck):
    """Round-10 axis in isolation: window FRAMES — value-based RANGE frames
    over event time (epoch-seconds numeric form AND the INTERVAL form) and
    sliding ROWS frames with mixed aggregates, under a derived NULLABLE
    partition key (both engines must co-partition NULLs and agree on frame
    membership at ORDER-BY-peer boundaries).  Also green at sf0.01/sf0.1
    (run manually: run(40, 20250816, sf, only=('frame',)))."""
    results = run(40, 20250816, sf_dir, spark=spark, con=duck, only=("frame",))
    fails = [(i, sql, d) for i, sql, ok, d in results if not ok]
    assert not fails, fails


def test_empty_input_rollup_divergence_pinned(spark, duck):
    """Engine-divergence exhibit (found by the fuzzer, seed 987654): on
    EMPTY input the SQL standard's empty grouping set inside ROLLUP/CUBE
    aggregates globally — DuckDB (like Postgres) emits one grand-total
    row (NULL keys, count 0); Spark 4 returns NO rows, from both the
    DataFrame API and SQL.  The fuzzer comparator accepts this exact
    shape as a known divergence; this test pins BOTH behaviors so a
    future Spark version that fixes the deviation fails here and the
    comparator branch gets retired."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1, "a")], "k int, g string").where("k > 99")
    assert df.rollup("g").agg(F.count(F.lit(1)).alias("n")).collect() == []
    assert df.cube("g").agg(F.count(F.lit(1)).alias("n")).collect() == []
    # the plain global aggregate DOES emit its one row — the asymmetry
    assert df.groupBy().agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"] == 0
    want = duck.execute(
        "SELECT g, count(*) AS n FROM (SELECT 1 k, 'a' g) WHERE k > 99 GROUP BY ROLLUP(g)"
    ).fetchall()
    assert want == [(None, 0)]


def test_fuzz_hof_40_specs(spark, sf_dir, duck):
    """Round-10 axis 2 in isolation: HIGHER-ORDER array functions —
    transform-with-NULL-injection -> filter -> {aggregate fold, size,
    array_max, exists} chains, deliberately spelled differently per
    engine (Spark exists()/aggregate() vs DuckDB len(list_filter())>0 /
    coalesce(list_sum(),0)) so agreement checks the semantics (empty-array
    folds, NULL-element propagation, lambda arithmetic), not a shared
    spelling.  Also green at sf0.01/sf0.1 (run manually:
    run(60, 20260816, sf, only=('hof',)))."""
    results = run(40, 20260817, sf_dir, spark=spark, con=duck, only=("hof",))
    fails = [(i, sql, d) for i, sql, ok, d in results if not ok]
    assert not fails, fails


def test_fuzz_merge_45_specs(spark, sf_dir, duck):
    """Round-11 axis in isolation: the MERGE/changelog surface — seeded
    random changelogs (insert/update/delete mixes, NULLABLE payloads via
    seeded NULLIF bands, duplicate source keys collapsed by a seeded
    dedup rule) lowered to operators/table_format.merge_into or
    changes_between on the Spark side while DuckDB replays the SAME WHEN
    branches as a full-outer-join CASE projection with every condition
    coalesced to FALSE — the independently-spelled pin of the SQL-MERGE
    NULL-condition rule (the r10 NULL-delete bug's regression surface).
    Also green at sf0.01/sf0.1 (run manually:
    run(45, 20260901, sf, only=('merge',)))."""
    results = run(45, 20260901, sf_dir, spark=spark, con=duck, only=("merge",))
    fails = [(i, sql, d) for i, sql, ok, d in results if not ok]
    assert not fails, fails
