"""Differential-test harness: run a registry query on Spark AND its oracle
SQL on DuckDB over the same parquet files; compare row count, column names,
and order-insensitive values (floats under tolerance).

This mirrors the driver's correctness gate (SURVEY.md §5.1) so mismatches
surface locally at sf0.001 before the driver runs sf0.01.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from experiments_datafusion_spark.io import TABLES

FLOAT_RTOL = 1e-6
FLOAT_ATOL = 1e-8


def duck_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.sql(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif s.dtype == object:
            out[c] = s.astype(str)
    out = out[sorted(out.columns)]
    sort_cols = [c for c in out.columns if not pd.api.types.is_float_dtype(out[c])]
    float_cols = [c for c in out.columns if pd.api.types.is_float_dtype(out[c])]
    # include rounded floats in the sort key so row order is total
    tmp = out.copy()
    for c in float_cols:
        tmp[c] = np.round(tmp[c].astype(float), 6)
    out = out.loc[tmp.sort_values(by=sorted(out.columns), kind="mergesort").index]
    return out.reset_index(drop=True)


def compare_frames(actual: pd.DataFrame, expected: pd.DataFrame, name: str = "") -> None:
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(actual.columns)} != oracle {sorted(expected.columns)}"
    )
    a, e = _normalize(actual), _normalize(expected)

    def kind(s):
        k = s.dtype.kind
        return {"i": "i", "u": "i", "f": "f", "b": "b"}.get(k, "o")

    for c in a.columns:
        assert kind(a[c]) == kind(e[c]), (
            f"{name}: column {c} dtype kind {a[c].dtype} != oracle {e[c].dtype} "
            "(driver schema check would fail)"
        )
    for c in a.columns:
        av, ev = a[c], e[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(ev):
            av = av.astype(float).to_numpy()
            ev = ev.astype(float).to_numpy()
            both_nan = np.isnan(av) & np.isnan(ev)
            ok = both_nan | np.isclose(av, ev, rtol=FLOAT_RTOL, atol=FLOAT_ATOL)
            if not ok.all():
                i = int(np.argmin(ok))
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted-row {i}: {av[i]!r} != {ev[i]!r}"
                )
        else:
            same = av.astype(str).fillna("<NA>").eq(ev.astype(str).fillna("<NA>"))
            if not same.all():
                i = int(np.argmin(same.to_numpy()))
                raise AssertionError(
                    f"{name}: column {c} mismatch at sorted-row {i}: "
                    f"{av.iloc[i]!r} != {ev.iloc[i]!r}"
                )


def run_differential(spark, query, sf_dir: str) -> None:
    actual = query.fn(spark, sf_dir).toPandas()
    expected = duck_run(query.oracle, sf_dir)
    compare_frames(actual, expected, query.name)
