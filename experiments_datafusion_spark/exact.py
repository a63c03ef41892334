"""Exact cross-engine rounding of aggregated doubles.

`round(sum(x), d)` on doubles has TWO latent cross-engine failure modes,
both found by the sf0.1 differential sweep (tpch_q9_profit 13939649.71 vs
.72, merge_upsert 6234.26 vs .27):
  1. Spark's partial/final sum and DuckDB's sequential sum differ by an
     ulp, and the true value sits on a .xx5 boundary;
  2. even on IDENTICAL doubles, Spark rounds via BigDecimal's exact
     decimal expansion while DuckDB scales-and-rints — they disagree
     within an ulp of the boundary.

The cure is the recipe the media decoders already use (operators/
multimodal.py): quantize PER ROW to integer units — per-row values are
single-op identical doubles in both engines, so the quantization itself
cannot diverge — SUM exact integers, then round with integer division.

Magnitude budget: |sum_units| * 2 must stay below 2^53 so the final
double division in `exact_round` floors exactly (units of 1e-4 over 1e5
rows of 1e5-magnitude values -> 1e14, three decades of headroom).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_units(col: Column, unit_dp: int) -> Column:
    """Per-row quantization to integer 10^-unit_dp units (exact in both
    engines: the input double is identical per row, round-to-0dp of it is
    a single deterministic op)."""
    return F.round(col * (10 ** unit_dp), 0).cast("long")


def exact_round(sum_units: Column, unit_dp: int, out_dp: int) -> Column:
    """Half-away-from-zero rounding of an integer-unit sum to out_dp
    decimals, all in integer arithmetic; returns a double with exactly
    out_dp decimals.  Matches both engines' round() sign convention."""
    den = 10 ** (unit_dp - out_dp)
    a = F.abs(sum_units)
    # True integer division, not floor-of-double-division: num and num%d2
    # are exact longs (< 2^53 by the magnitude budget), so num - num%d2 is
    # an exact multiple of d2 and the IEEE quotient is the exact integer —
    # unconditionally, with no dependence on half-ulp boundary distance
    # (the coupling the round-3 ADVICE flagged in the floor() variant).
    num = a * 2 + den
    d2 = 2 * den
    q = ((num - num % d2) / d2).cast("long")
    return F.when(sum_units < 0, -q).otherwise(q) / F.lit(float(10 ** out_dp))


def sql_to_units(expr: str, unit_dp: int) -> str:
    return f"CAST(round(({expr}) * {10 ** unit_dp}, 0) AS BIGINT)"


def sql_exact_round(expr: str, unit_dp: int, out_dp: int) -> str:
    den = 10 ** (unit_dp - out_dp)
    return (
        f"(CASE WHEN ({expr}) >= 0"
        f" THEN (({expr}) * 2 + {den}) // (2 * {den})"
        f" ELSE -(((-({expr})) * 2 + {den}) // (2 * {den})) END)"
        f" / {10 ** out_dp}.0"
    )


def sparksql_exact_round(expr: str, unit_dp: int, out_dp: int) -> str:
    """SPARK-SQL fragment replica of exact_round() (sql_exact_round above
    is the DuckDB-dialect twin — `//` is not Spark syntax).  Same integer
    arithmetic: q = (|x|*2 + den  -  (|x|*2 + den) % 2den) / 2den as an
    exact IEEE quotient, sign restored, divided by the 10^out_dp double."""
    den = 10 ** (unit_dp - out_dp)
    num = f"(abs({expr}) * 2 + {den})"
    q = f"CAST(({num} - {num} % {2 * den}) / {2 * den} AS BIGINT)"
    return (
        f"(CASE WHEN ({expr}) < 0 THEN -{q} ELSE {q} END)"
        f" / CAST({float(10 ** out_dp)!r} AS DOUBLE)"
    )
