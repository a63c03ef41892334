"""Driver simulation for /root/repo/__spark_entry__.py (verify skill recipe).

Fresh bare SparkSession; smoke entry(); then every queries() entry at sf0.01
compared against oracle_sql() through DuckDB (tables registered as views over
the same parquet). Rows-only check for keys absent from oracle_sql().
"""
import sys, time, traceback

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import os

SF_DIR = os.environ.get("DRIVE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

ONLY = set(sys.argv[1:])  # optional subset of query names


def norm(df: pd.DataFrame) -> list[str]:
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(f"{round(v, 6)}")
            elif hasattr(v, "strftime"):
                vals.append(v.strftime("%Y-%m-%d %H:%M:%S"))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = e.entry(spark).collect()
    assert len(rows) > 0, "entry() returned 0 rows"
    print(f"entry: OK ({len(rows)} rows)", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    unknown = ONLY - set(qs)
    if unknown:  # a typo'd name must not produce a silent "0 pass, 0 fail" green
        print(f"ERROR: unknown query names: {sorted(unknown)}", flush=True)
        sys.exit(2)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}", flush=True)
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {dt:.1f}s)", flush=True)
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}", flush=True)
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}", flush=True)
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL {name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}",
                flush=True,
            )
            n_fail += 1
            continue
        a, b = norm(sdf), norm(odf)
        if a != b:
            diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if a and b else 0
            print(
                f"FAIL {name}: value mismatch at sorted-row {diff}:\n"
                f"  spark:  {a[diff] if diff < len(a) else '<none>'}\n"
                f"  oracle: {b[diff] if diff < len(b) else '<none>'}",
                flush=True,
            )
            n_fail += 1
            continue
        print(f"ok   {name}: {len(sdf)} rows match ({dt:.1f}s)", flush=True)
        n_pass += 1
    print(f"RESULT: {n_pass} pass, {n_fail} fail", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
