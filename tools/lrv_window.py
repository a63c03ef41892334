"""Compute the next round's driver-window fill under the freshness policy
(queries/__init__.py): NEW/CHANGED keys first (passed as args), then the
least-recently-driver-verified keys (oldest CORRECTNESS_r*.json round
first, ties alphabetical) up to the 50-slot window.

Usage:
    python tools/lrv_window.py [new_key ...]

Prints the proposed `_PRIORITY` tuple body ready to paste, plus a summary
of which rounds the fill draws from.  Keys that have NEVER appeared in a
driver window (e.g. just-registered ones not passed as args) are flagged —
they belong at the front, not in the LRV fill.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

WINDOW = 50


def main() -> None:
    new_keys = sys.argv[1:]
    last: dict[str, int] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(f.stem.split("_r")[1])
        try:
            keys = json.load(open(f))
        except Exception:
            continue
        for k in keys:
            last[k] = max(rnd, last.get(k, 0))

    from experiments_datafusion_spark.queries import all_queries

    registry = list(all_queries())
    never = [k for k in registry if k not in last and k not in new_keys]
    if never:
        print(f"# WARNING: never driver-verified (put these FIRST): {never}")
    lrv = sorted((k for k in registry if k in last), key=lambda k: (last[k], k))
    # clamp: > WINDOW new+never keys would make the stop negative and the
    # slice wrap to nearly the whole LRV list (round-7 advisor finding)
    n_fill = max(0, WINDOW - len(new_keys) - len(never))
    fill = [k for k in lrv if k not in new_keys][:n_fill]
    window = list(new_keys) + never + fill
    rounds = sorted({last[k] for k in fill})
    print(f"# window = {len(window)} keys; LRV fill drawn from rounds {rounds}")
    for k in window:
        src = "new" if k in new_keys else ("NEVER" if k in never else f"r{last[k]}")
        print(f'    "{k}",  # {src}')


if __name__ == "__main__":
    main()
