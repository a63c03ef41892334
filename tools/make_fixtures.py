"""Materialize the committed parquet fixtures under /root/repo/fixtures/.

Currently one fixture: the sortbench MERGE corpus (100k rows of the
mixed-tuple workload + portable split-hash run assignment).  Why a fixture
at all: the registry key's oracle-parity generator (portable md5 value
streams, so DuckDB can regenerate the identical dataset) costs ~2/3 of the
key's wall clock — the r9 closing ratio measured the GENERATOR, not the
merge.  Per FIXTURES.md's oracle-parity rule, the corpus is generated ONCE
here, written to parquet, and read by BOTH engines, so the key measures the
operator.

The generation-replay verification does not disappear — it moves here: this
tool regenerates the corpus through the DuckDB md5 SQL recipe and asserts
bit-identity with what Spark wrote, refusing to emit a fixture that the
oracle recipe cannot reproduce.  (The four single-batch sortbench_* keys
keep their regenerate-in-the-oracle form, so the recipe itself stays
driver-verified every round.)

Run: python tools/make_fixtures.py   (idempotent; rewrites the fixture)
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

FIXTURE_DIR = REPO / "fixtures"


def main() -> None:
    import duckdb
    import pyspark.sql.functions as F

    from experiments_datafusion_spark import generators
    from experiments_datafusion_spark.generators import DATA_SEED, SPLIT_SEED
    from experiments_datafusion_spark.operators import split as split_ops
    from experiments_datafusion_spark.queries.sortbench import (
        _H,
        _MERGE_N,
        _MERGE_RUNS,
        _sql_uniform,
        _sql_utf8_low,
    )
    from experiments_datafusion_spark.session import get_spark

    spark = get_spark("make-fixtures")
    out = FIXTURE_DIR / "sortbench_merge"

    base = spark.range(_MERGE_N).select(
        F.col("id"),
        generators._f64(DATA_SEED, _MERGE_N, portable=True).alias("f64"),
        generators._utf8_low(DATA_SEED + 1, portable=True).alias("utf_low1"),
        generators._utf8_low(DATA_SEED + 2, portable=True).alias("utf_low2"),
        generators._i64(DATA_SEED + 3, _MERGE_N, portable=True).alias("i64"),
    )
    assigned = split_ops.assign_streams_hash(
        base, _MERGE_RUNS, F.col("id").cast("string")
    ).withColumnRenamed("stream", "run")
    assigned.coalesce(1).write.mode("overwrite").parquet(str(out))

    # generation-replay proof: the DuckDB md5 recipe must reproduce the
    # fixture EXACTLY (the differential the registry key ran pre-fixture)
    con = duckdb.connect()
    n_diff = con.sql(
        f"""
        WITH ids AS (SELECT id FROM range({_MERGE_N}) t(id)),
        regen AS (
          SELECT id,
                 CAST({_H.format(x=f"CAST(id AS VARCHAR) || '#{SPLIT_SEED}'")}
                      % {_MERGE_RUNS} AS INTEGER) AS run,
                 CAST({_sql_uniform(DATA_SEED, _MERGE_N)} AS DOUBLE) AS f64,
                 {_sql_utf8_low(DATA_SEED + 1)} AS utf_low1,
                 {_sql_utf8_low(DATA_SEED + 2)} AS utf_low2,
                 {_sql_uniform(DATA_SEED + 3, _MERGE_N)} AS i64
          FROM ids
        ),
        fixture AS (
          SELECT id, run, f64, utf_low1, utf_low2, i64
          FROM read_parquet('{out}/*.parquet')
        )
        SELECT count(*) FROM (
          (SELECT * FROM regen EXCEPT SELECT * FROM fixture)
          UNION ALL
          (SELECT * FROM fixture EXCEPT SELECT * FROM regen)
        )
        """
    ).fetchone()[0]
    if n_diff:
        raise SystemExit(
            f"fixture does not match the md5 oracle recipe ({n_diff} diff rows)"
        )
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    print(f"wrote {out} ({n} rows) — md5-recipe replay verified")


if __name__ == "__main__":
    main()
