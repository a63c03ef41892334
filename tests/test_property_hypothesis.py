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
