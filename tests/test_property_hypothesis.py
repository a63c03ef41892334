"""Hypothesis property tests for the pure-Python components whose bugs
would surface as confusing cross-engine differential failures (SURVEY.md
§5.4): the stdlib PNG codec, the closed-form pixel-sum formula the
mm_png_features oracle relies on, and the exact half-up integer rounding
recipe shared by the WAV and PNG feature extractors.

These run WITHOUT Spark (hundreds of examples would be far too slow as
jobs) — the Spark-side plumbing is covered by the differential suite."""

from __future__ import annotations

import decimal

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from experiments_datafusion_spark.operators import multimodal as M


@settings(deadline=None, max_examples=100)
@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_any_grayscale_image(w, h, seed):
    """Encode->decode is pixel-exact for ARBITRARY 8-bit grayscale content,
    not just the closed-form corpus images."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    w2, h2, out = M._decode_png_gray8(M._encode_png_gray8(px))
    assert (w2, h2) == (w, h)
    assert (out == px).all()


@settings(deadline=None, max_examples=200)
@given(did=st.integers(min_value=0, max_value=10**9))
def test_png_pixel_sum_closed_form(did):
    """The oracle's cycle+wrapped-run pixel-sum formula equals the direct
    sum for any doc_id — this is the algebra the SQL oracle replays."""
    w, h = M._png_dims(did)
    n = w * h
    k = np.arange(n, dtype=np.int64)
    direct = int(((did * 7 + k) % 256).sum())
    a, r = (did * 7) % 256, n % 256
    closed = (n // 256) * 32640 + r * a + r * (r - 1) // 2 - 256 * max(0, a + r - 256)
    assert closed == direct


@settings(deadline=None, max_examples=300)
@given(
    s=st.integers(min_value=0, max_value=10**12),
    n=st.integers(min_value=1, max_value=10**6),
)
def test_exact_half_up_mean_matches_decimal(s, n):
    """(S*2e4 + n) // (2n) is EXACTLY decimal ROUND_HALF_UP of S/n at 4dp —
    the recipe both media decoders and their SQL oracles use instead of
    float round() (which splits engines at half-ulp boundaries)."""
    mean4 = (s * 20_000 + n) // (2 * n)
    want = int(
        (decimal.Decimal(s) / decimal.Decimal(n) * 10_000).quantize(
            decimal.Decimal(1), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert mean4 == want


@settings(deadline=None, max_examples=300)
@given(
    a=st.integers(min_value=0, max_value=2**53 - 1),
    b=st.integers(min_value=1, max_value=10**9),
)
def test_column_trunc_div_replica_is_exact(a, b):
    """((a - a % b) / b) with an IEEE double division — the Column-level
    integer-division idiom used by exact.exact_round, graph_pagerank and
    embedding_kmeans — equals true integer division for every nonnegative
    a < 2^53: a - a%b is an exact multiple of b, and the correctly-rounded
    IEEE quotient of an exact multiple is the exact integer.  This is the
    boundary property the r3 VERDICT asked to pin (no half-ulp coupling
    remains anywhere in the recipe)."""
    assert int(float(a - a % b) / b) == a // b


@settings(deadline=None, max_examples=300)
@given(
    s=st.integers(min_value=-(2**62), max_value=2**62),
    n=st.integers(min_value=1, max_value=10**9),
)
def test_kmeans_signed_trunc_div_matches_both_engines(s, n):
    """The signed truncating division used for k-means centroid units:
    Python's -((-s)//n) (s<0) / s//n (s>=0) == the oracle's
    CASE WHEN s>=0 THEN s//cnt ELSE -((-s)//cnt) END — and both equal
    C-style truncation toward zero at ANY int64 magnitude (pure integer
    ops; no 2^53 budget applies on this path)."""
    py = -((-s) // n) if s < 0 else s // n
    import math
    want = math.trunc(decimal.Decimal(s) / decimal.Decimal(n))
    assert py == want


@settings(deadline=None, max_examples=60)
@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_bmp_roundtrip_any_grayscale_image(w, h, seed):
    """BMP encode->decode is pixel-exact for ARBITRARY content and every
    stride-padding case (w % 4 in 0..3), not just the closed-form corpus."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    w2, h2, out = M._decode_bmp_gray8(M._encode_bmp_gray8(px))
    assert (w2, h2) == (w, h)
    assert (out == px).all()


def test_bmp_honest_boundaries():
    import pytest as _pytest

    good = M._encode_bmp_gray8(np.zeros((4, 5), dtype=np.uint8))
    with _pytest.raises(ValueError):
        M._decode_bmp_gray8(b"XX" + good[2:])  # bad magic
    with _pytest.raises(ValueError):
        M._decode_bmp_gray8(good[:40])  # truncated headers
    with _pytest.raises(ValueError):
        M._decode_bmp_gray8(good[:-3])  # truncated pixels
    import struct
    bad_bpp = bytearray(good)
    bad_bpp[28:30] = struct.pack("<H", 24)
    with _pytest.raises(NotImplementedError):
        M._decode_bmp_gray8(bytes(bad_bpp))  # 24-bit refused loudly
    topdown = bytearray(good)
    topdown[22:26] = struct.pack("<i", -4)
    with _pytest.raises(NotImplementedError):
        M._decode_bmp_gray8(bytes(topdown))  # top-down refused loudly


@settings(deadline=None, max_examples=150)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    k=st.integers(min_value=2, max_value=12),
    n_parts=st.integers(min_value=1, max_value=6),
)
def test_misra_gries_superset_and_two_pass_exactness(seed, k, n_parts):
    """The pigeonhole contract of the two-pass heavy-hitter sketch
    (operators/sketches.py), on ARBITRARY skewed streams and partition
    splits: (1) each partition keeps at most k candidates, (2) the union
    of per-partition MG survivors contains EVERY item with global
    frequency > N/k, so (3) recounting candidates and filtering at
    min_count > N/k reproduces the exact groupBy answer.  Driven through
    the real _mg_partition closure with pandas batches — no Spark."""
    import collections

    import pandas as pd

    from experiments_datafusion_spark.operators import sketches as SK

    rng = np.random.default_rng(seed)
    # Zipf-ish universe: small alphabet with geometric skew + uniform tail
    universe = [f"i{j}" for j in range(30)]
    weights = np.array([1.0 / (j + 1) ** 1.2 for j in range(30)])
    items = list(rng.choice(universe, size=int(rng.integers(1, 400)),
                            p=weights / weights.sum()))
    n = len(items)
    # random contiguous partition split (order matters to MG — keep it real)
    cuts = sorted(rng.integers(0, n + 1, size=n_parts - 1)) if n_parts > 1 else []
    parts = np.split(np.array(items, dtype=object), cuts)

    cand: set[str] = set()
    for part in parts:
        run = SK._mg_partition(k, "term")
        outs = list(run(iter([pd.DataFrame({"term": part})])))
        survivors = set(outs[-1]["term"])
        assert len(survivors) <= k
        cand |= survivors

    exact = collections.Counter(items)
    over = {x for x, c in exact.items() if c > n / k}
    assert over <= cand, f"missed guaranteed heavy hitters: {over - cand}"

    min_count = n // k + 1  # strictly > N/k -> sound threshold
    two_pass = {x: exact[x] for x in cand if exact[x] >= min_count}
    want = {x: c for x, c in exact.items() if c >= min_count}
    assert two_pass == want
