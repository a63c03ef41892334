"""Pure-Python baseline JPEG codec (jpeg_codec.py) — property tests.

No JPEG implementation exists in this container to cross-check against, so
the evidence is structural + analytic: marker framing asserted byte-level,
the quantization-lossless regime (block-constant EVEN values) must
round-trip bit-for-bit, block-constant ODD values must round-trip within
the +-1 the DC quantum predicts, and smooth gradients stay within small
bounded error — each a property derivable from T.81 by hand, not from
another codec.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from experiments_datafusion_spark import jpeg_codec as J


def _tiled(tiles: np.ndarray) -> np.ndarray:
    return np.kron(tiles.astype(np.uint8), np.ones((8, 8), dtype=np.uint8))


@settings(max_examples=40, deadline=None)
@given(
    nty=st.integers(1, 5),
    ntx=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_even_flat_blocks_roundtrip_exact(nty, ntx, seed):
    rng = np.random.RandomState(seed)
    tiles = rng.randint(0, 128, size=(nty, ntx)) * 2  # even levels
    img = _tiled(tiles)
    assert np.array_equal(J.decode_gray(J.encode_gray(img)), img)


@settings(max_examples=25, deadline=None)
@given(nty=st.integers(1, 4), ntx=st.integers(1, 4), seed=st.integers(0, 2**31 - 1))
def test_odd_flat_blocks_within_dc_quantum(nty, ntx, seed):
    """v-128 odd puts DC = 8(v-128) halfway between quantum-16 multiples:
    reconstruction error is exactly the +-1 the quantizer predicts."""
    rng = np.random.RandomState(seed)
    tiles = rng.randint(0, 127, size=(nty, ntx)) * 2 + 1
    img = _tiled(tiles)
    err = J.decode_gray(J.encode_gray(img)).astype(int) - img.astype(int)
    assert np.abs(err).max() <= 1


# T.81 Figure A.6 zigzag order, as natural (row-major) indexes r*8+c —
# the published 64-entry table, transcribed by hand.  Pins the derived
# ZIGZAG against the spec so a diagonal-parity regression (round-5 advisor
# finding: the sort key produced the TRANSPOSE) cannot pass silently.
_T81_ZIGZAG_NATURAL = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def test_zigzag_matches_published_t81_table():
    assert [r * 8 + c for r, c in J.ZIGZAG] == _T81_ZIGZAG_NATURAL


def test_smooth_gradient_error_bounded():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    err = J.decode_gray(J.encode_gray(img)).astype(int) - img.astype(int)
    assert np.abs(err).mean() < 2 and np.abs(err).max() <= 6


def test_marker_framing():
    img = _tiled(np.full((8, 8), 100))  # 64x64: body dwarfs the ~300B headers
    data = J.encode_gray(img)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"  # SOI/EOI
    assert b"\xff\xdb" in data and b"\xff\xc0" in data  # DQT, SOF0
    assert data.count(b"\xff\xc4") >= 2  # DC + AC DHT
    assert b"\xff\xda" in data  # SOS
    # entropy compression actually happened
    assert len(data) < img.size


def test_dimension_contract_and_bad_input():
    with pytest.raises(ValueError, match="multiples of 8"):
        J.encode_gray(np.zeros((7, 8), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        J.decode_gray(b"not a jpeg")


def test_huffman_tables_are_canonical_and_annexk_sized():
    # Annex K: 12 DC symbols, 162 AC symbols; prefix-free by construction
    assert len(J.DC_CODES) == 12 and len(J.AC_CODES) == 162
    for codes in (J.DC_CODES, J.AC_CODES):
        seen = [(c, ln) for c, ln in codes.values()]
        as_bits = {format(c, f"0{ln}b") for c, ln in seen}
        assert len(as_bits) == len(seen)
        for a in as_bits:  # prefix-free
            assert not any(b != a and b.startswith(a) for b in as_bits)


def test_high_frequency_roundtrip_runs():
    """Noise is JPEG's worst case; just assert decode is well-formed and
    within the coarse bound the Annex-K table implies."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
    dec = J.decode_gray(J.encode_gray(img))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 128


# ---- AVI container (round 5, same file: the other new real codec) -----------


def test_avi_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from experiments_datafusion_spark.operators import multimodal as M

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 6),
        h=st.integers(1, 10),
        w=st.integers(1, 13),
        seed=st.integers(0, 2**31 - 1),
    )
    def inner(n, h, w, seed):
        rng = np.random.RandomState(seed)
        frames = rng.randint(0, 256, size=(n, h, w)).astype(np.uint8)
        assert np.array_equal(
            M._decode_avi_gray8(M._encode_avi_gray8(frames)), frames
        )

    inner()


def test_avi_rejects_compressed_and_garbage():
    import struct

    from experiments_datafusion_spark.operators import multimodal as M

    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    good = bytearray(M._encode_avi_gray8(frames))
    with pytest.raises(ValueError, match="RIFF/AVI"):
        M._decode_avi_gray8(b"nope")
    # flip the biCompression field inside strf PAST the supported set —
    # 0 (BI_RGB) and, since round 7, 1 (BI_RLE8) both decode for real, so
    # the DCT/inter-frame gate is any OTHER codec id
    idx = bytes(good).index(b"strf") + 8  # chunk body start
    comp_off = idx + 16  # biSize,i32 w,i32 h,u16 planes,u16 bpp -> compression
    good[comp_off : comp_off + 4] = struct.pack("<I", 2)
    with pytest.raises(NotImplementedError, match="video gate"):
        M._decode_avi_gray8(bytes(good))
    # a compressed ('00dc') chunk inside a stream whose strf declares
    # BI_RGB is malformed, not gated
    bad = bytearray(M._encode_avi_gray8(frames))
    bad[bytes(bad).index(b"00db") : bytes(bad).index(b"00db") + 4] = b"00dc"
    with pytest.raises(ValueError, match="non-RLE8"):
        M._decode_avi_gray8(bytes(bad))
