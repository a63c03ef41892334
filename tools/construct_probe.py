"""Plan-construction floor probe (round 14).

Separates the Python-side DataFrame CONSTRUCTION cost (py4j round trips +
eager Catalyst analysis per operator, plus any setup collects the builder
runs) from the EXECUTION cost (noop-sink force) for a set of registry keys.

  python tools/construct_probe.py <key> [<key> ...] [--reps N]

Prints one JSON line per key: construct times, force-after-construct times.
The construction number is exactly the part of bench.py's timed region a
cheaper plan build would remove (bench times `force(fn(spark, SF_DIR))`, so
construction is inside the timed region).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from experiments_datafusion_spark.queries import all_queries  # noqa: E402
from experiments_datafusion_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark("edfs-construct-probe")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    for name in args.keys:
        # warmup: codegen + JIT, matches bench's warmup passes
        bench.force(registry[name].fn(spark, bench.SF_DIR))
        construct, execute, total = [], [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = registry[name].fn(spark, bench.SF_DIR)
            t1 = time.perf_counter()
            bench.force(df)
            t2 = time.perf_counter()
            construct.append(round(t1 - t0, 4))
            execute.append(round(t2 - t1, 4))
            total.append(round(t2 - t0, 4))
        print(
            json.dumps(
                {
                    "key": name,
                    "construct": construct,
                    "execute": execute,
                    "construct_best": min(construct),
                    "execute_best": min(execute),
                    "total_best": min(total),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
