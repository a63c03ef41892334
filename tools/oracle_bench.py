"""Time the DuckDB oracle twin of each headline bench query (BASELINE.md
protocol: the reference's own absolute numbers are single-threaded in-memory
Rust microseconds, so the meaningful comparison is engine-vs-DuckDB on the
same parquet at the same moment — same-window timing sidesteps this host's
round-to-round CPU drift, see BENCH_NOTES.md).

Usage: python tools/oracle_bench.py [/path/to/BENCH.json]
  - loads the bench JSON (default: reads the last line of stdin if piped,
    else ./BENCH_latest.json), times each headline query's oracle SQL in
    DuckDB (32 threads, min of 3 after 1 warmup), and prints one JSON line
    {"queries": {name: {"spark": s, "duck": s, "ratio": r}}, "ratio_total": r}.

Queries without an oracle (none in the headline set) are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from experiments_datafusion_spark.io import TABLES  # noqa: E402
from experiments_datafusion_spark.queries import all_queries  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    bench_path = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "BENCH_latest.json")
    lines = [ln for ln in Path(bench_path).read_text().splitlines() if ln.startswith("{")]
    bench = json.loads(lines[-1])
    spark_times: dict[str, float] = bench["queries"]

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count() or 32}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    registry = all_queries()
    out: dict[str, dict[str, float]] = {}
    spark_total = duck_total = 0.0
    for name, spark_sec in spark_times.items():
        q = registry.get(name)
        if q is None or q.oracle is None:
            continue  # refsort_* etc. have no SQL twin
        con.execute(q.oracle).fetchall()  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(q.oracle).fetchall()
            times.append(time.perf_counter() - t0)
        duck_sec = round(min(times), 4)
        out[name] = {
            "spark": spark_sec,
            "duck": duck_sec,
            "ratio": round(spark_sec / duck_sec, 2) if duck_sec else None,
        }
        spark_total += spark_sec
        duck_total += duck_sec
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "queries": out,
                "spark_total": round(spark_total, 4),
                "duck_total": round(duck_total, 4),
                "ratio_total": round(spark_total / duck_total, 3) if duck_total else None,
            }
        )
    )


if __name__ == "__main__":
    main()
