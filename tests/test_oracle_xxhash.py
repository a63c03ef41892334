"""The DuckDB XXH64 replay (oracle_xxhash.py) must equal Spark's xxhash64
bit-for-bit on 8-char ASCII inputs — the claim that lets the production
side of the hash knob be fully value-verified (docs_winnowing_fast)."""

from __future__ import annotations

import random
import string

import duckdb
import pyspark.sql.functions as F

from experiments_datafusion_spark.oracle_xxhash import xxh64_8byte_ctes

_M = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _ref_xxh64_8(s: str, seed: int = 42) -> int:
    """Independent pure-Python XXH64 (8-byte short path, spec constants)."""
    acc = (seed + _P5 + 8) & _M
    k1 = int.from_bytes(s.encode(), "little")
    k1 = (k1 * _P2) & _M
    k1 = _rotl(k1, 31)
    k1 = (k1 * _P1) & _M
    acc ^= k1
    acc = (_rotl(acc, 27) * _P1 + _P4) & _M
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc - (1 << 64) if acc >= (1 << 63) else acc


def _duck_hashes(vals: list[str]) -> dict[str, int]:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join("('" + v.replace("'", "''") + "')" for v in vals)
        + ") v(g)"
    )
    sql = f"WITH {xxh64_8byte_ctes('t', 'g')} SELECT g, h FROM xxf"
    return dict(con.execute(sql).fetchall())


def test_sql_replay_equals_reference():
    rng = random.Random(20260815)
    alphabet = string.ascii_letters + string.digits + " .,!?;:'-"
    vals = list({"".join(rng.choices(alphabet, k=8)) for _ in range(400)})
    got = _duck_hashes(vals)
    assert all(got[v] == _ref_xxh64_8(v) for v in vals)


def test_sql_replay_equals_spark_xxhash64(spark):
    rng = random.Random(99)
    alphabet = string.ascii_letters + string.digits + " "
    vals = list({"".join(rng.choices(alphabet, k=8)) for _ in range(100)})
    want = {
        r.g: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "g string")
        .select("g", F.xxhash64("g").alias("h"))
        .collect()
    }
    assert _duck_hashes(vals) == want


def test_reference_edge_values():
    """Byte-boundary inputs: NULs are excluded by the ASCII-substr recipe
    (ascii('') is 0 but the corpus never writes control chars); probe the
    printable extremes instead."""
    vals = ["        ", "~~~~~~~~", "\x01" * 8, "zzzzzzzz"]
    got = _duck_hashes([v for v in vals if v.isprintable() or v == "\x01" * 8])
    for v, h in got.items():
        assert h == _ref_xxh64_8(v)


def test_fixture_documents_all_ascii():
    """PRECONDITION PIN (advisor r8): the SQL replay reads CODE POINTS
    (ascii(substr(...))), which equal UTF-8 bytes only for pure-ASCII
    text.  Assert the documents fixture is all-ASCII at every scale, so a
    future non-ASCII fixture trips THIS clear precondition failure
    instead of a confusing docs_winnowing_fast differential mismatch
    (oracle_xxhash.py module docstring documents the byte-level
    extraction a non-ASCII corpus would need)."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n_bad = con.execute(
            "SELECT count(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet')"
            " WHERE text IS NOT NULL AND NOT (text = regexp_replace("
            "text, '[^\\x00-\\x7F]', '', 'g'))"
        ).fetchone()[0]
        assert n_bad == 0, (
            f"{sf}: {n_bad} non-ASCII documents — the XXH64 SQL replay's "
            "code-point extraction no longer equals byte extraction; "
            "switch oracle_xxhash.py to byte-level reads"
        )
