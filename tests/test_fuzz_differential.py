"""Pytest face of the seeded differential query fuzzer
(tools/fuzz_differential.py): 40 random filter/group/aggregate specs,
each lowered from ONE AST to both a Spark plan and a DuckDB SQL string
and compared under the registry normalization.  Probes the composition
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
