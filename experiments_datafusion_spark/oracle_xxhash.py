"""DuckDB-SQL replay of Spark's xxhash64 (XXH64, seed 42) for 8-byte ASCII
inputs — the piece that lets the PRODUCTION side of the hash knob be fully
value-verified instead of rows-only.

Why it exists: the fingerprint-tier keys hash 8-char grams; the md5-derived
portable hash (operators/text.py:hash64) was kept on the oracled keys only
because DuckDB has no xxhash64.  But XXH64 of a < 32-byte input is a short
closed-form pipeline (one 8-byte lane round + the avalanche), and every
step is expressible in DuckDB as exact 128-bit integer arithmetic:

  * wrap-around 64-bit multiply via the 32-bit split
    a*b mod 2^64 = (a_lo*b + ((a_hi*(b mod 2^32)) mod 2^32)*2^32) mod 2^64
    — every intermediate < 2^97, safely inside HUGEINT;
  * rotl(x, r) = (x mod 2^(64-r))*2^r + x div 2^(64-r);
  * xor / shifts on HUGEINT natively (values stay < 2^64);
  * the final fold to Spark's SIGNED long: x - 2^64 when x >= 2^63.

The byte extraction reads characters (ascii(substr(...))) — correct ONLY
for pure-ASCII text, where characters == UTF-8 bytes.  The fixture corpus
is verified all-ASCII at every scale (round 7); a non-ASCII corpus would
need a byte-level extraction instead.  Verified exact against
F.xxhash64 on 500 random 8-char strings and on the fixture grams.

Constants are the published XXH64 primes (Collet's xxHash spec).
"""

from __future__ import annotations

_M64 = "18446744073709551616::HUGEINT"  # 2^64
_P1 = "11400714785074694791::HUGEINT"
_P2 = "14029467366897019727::HUGEINT"
_P3 = "1609587929392839161::HUGEINT"
_P4 = "9650029242287828579::HUGEINT"
# short-path accumulator for len=8, seed=42: (seed + PRIME5 + len) mod 2^64
_ACC0 = "2870177450012600311::HUGEINT"


def _mul64(a: str, b: str) -> str:
    """(a * b) mod 2^64 with every intermediate inside HUGEINT."""
    return (
        f"((({a}) % 4294967296::HUGEINT) * ({b}) "
        f"+ (((({a}) // 4294967296::HUGEINT) * (({b}) % 4294967296::HUGEINT)) "
        f"% 4294967296::HUGEINT) * 4294967296::HUGEINT) % {_M64}"
    )


def _rotl(x: str, r: int) -> str:
    lo = 1 << (64 - r)
    return f"((({x}) % {lo}::HUGEINT) * {1 << r}::HUGEINT + (({x}) // {lo}::HUGEINT))"


def _shr_xor(x: str, s: int) -> str:
    return f"xor(({x}), (({x}) // {1 << s}::HUGEINT))"


def _le64(col: str) -> str:
    """Little-endian 64-bit load of 8 ASCII characters."""
    return " + ".join(
        f"ascii(substr({col}, {i + 1}, 1))::HUGEINT * {1 << (8 * i)}::HUGEINT"
        for i in range(8)
    )


def xxh64_8byte_ctes(src: str, gcol: str, prefix: str = "xx") -> str:
    """CTE-chain fragment computing Spark-compatible ``xxhash64(gcol)``
    (XXH64 seed 42) for the exactly-8-character ASCII column ``gcol`` of
    CTE/table ``src``.  The final CTE ``{prefix}f`` carries every column of
    ``src`` plus signed BIGINT ``h``.  Compose inside a WITH list."""
    return ",\n".join(
        [
            f"{prefix}0 AS (SELECT *, ({_le64(gcol)}) AS x FROM {src})",
            f"{prefix}1 AS (SELECT * EXCLUDE (x), {_mul64('x', _P2)} AS x FROM {prefix}0)",
            f"{prefix}2 AS (SELECT * EXCLUDE (x), {_rotl('x', 31)} AS x FROM {prefix}1)",
            f"{prefix}3 AS (SELECT * EXCLUDE (x), xor({_ACC0}, {_mul64('x', _P1)}) AS x FROM {prefix}2)",
            f"{prefix}4 AS (SELECT * EXCLUDE (x), ({_mul64(_rotl('x', 27), _P1)} + {_P4}) % {_M64} AS x FROM {prefix}3)",
            f"{prefix}5 AS (SELECT * EXCLUDE (x), {_mul64(_shr_xor('x', 33), _P2)} AS x FROM {prefix}4)",
            f"{prefix}6 AS (SELECT * EXCLUDE (x), {_mul64(_shr_xor('x', 29), _P3)} AS x FROM {prefix}5)",
            f"{prefix}f AS (SELECT * EXCLUDE (x), "
            f"(CASE WHEN {_shr_xor('x', 32)} >= 9223372036854775808::HUGEINT "
            f"THEN {_shr_xor('x', 32)} - {_M64} ELSE {_shr_xor('x', 32)} END)::BIGINT AS h "
            f"FROM {prefix}6)",
        ]
    )
