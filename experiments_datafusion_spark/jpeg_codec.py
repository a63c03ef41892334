"""Pure-Python baseline JPEG codec (ITU-T T.81, grayscale SOF0) — the
round-5 closure of the last multimodal stub: the container ships no codec
libraries, but baseline JPEG is fully implementable on the stdlib + numpy
(8x8 DCT-II, Annex-K quantization + Huffman tables, byte-stuffed entropy
stream).  operators/multimodal.py wraps this as the mm_jpeg_features path.

Scope (documented contract): 8-bit GRAYSCALE, baseline sequential (SOF0),
no subsampling, the Annex-K luminance tables.  Color/progressive stay out —
grayscale exercises every moving part (DCT, quantization, zigzag, DC
prediction, run-length AC, canonical Huffman, marker framing, byte
stuffing); the extra components of color add bookkeeping, not new machinery.

Exactness lever used by the differential tests: an image whose 8x8 blocks
are each CONSTANT with an EVEN value has only a DC coefficient of
8*(v-128); with the Annex-K DC quantum 16, (v-128) even makes DC/16 an
exact integer — no rounding anywhere — so encode->decode returns the input
bit-for-bit and a closed-form SQL oracle can predict the decoded features
while the codec still performs real Huffman + DCT work.  Random images
round-trip within quantization error (tests pin the bound).
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K.1 luminance quantization table (natural row-major order)
QTABLE = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
# T.81 Figure A.6: odd diagonals (r+c odd) are traversed row-ASCENDING
# ((0,1) before (1,0)), even diagonals row-DESCENDING ((2,0) before (0,2)
# i.e. column-ascending).  tests/test_jpeg.py pins the derived table
# against the published 64-entry order, so a parity regression is loud.
def _zigzag_order():
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[0] if (rc[0] + rc[1]) % 2 else rc[1]),
    )
    return order


ZIGZAG = _zigzag_order()

# Annex K.3 luminance DC Huffman table: BITS (codes per length 1..16), VALS
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# Annex K.5 luminance AC Huffman table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits, vals):
    """(value -> (code, length)) canonical Huffman assignment (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
AC_CODES = _canonical_codes(AC_BITS, AC_VALS)

# 8x8 DCT-II orthonormal matrix: C[u,x] = a(u) cos((2x+1)u pi/16)
_M = np.zeros((8, 8))
for u in range(8):
    a = np.sqrt(0.125) if u == 0 else 0.5
    for x in range(8):
        _M[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:  # skip the stuffed 0x00
            # explicit raise, not assert: malformed streams (truncation,
            # restart markers — unsupported) must fail under python -O too
            if self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker in scan")
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def read_code(self, decode_map: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = decode_map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _decode_maps(codes: dict) -> dict:
    return {(length, code): val for val, (code, length) in codes.items()}


DC_DECODE = _decode_maps(DC_CODES)
AC_DECODE = _decode_maps(AC_CODES)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1  # one's-complement negatives


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def encode_gray(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 array (h, w multiples of 8) as baseline JPEG."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("codec contract: dimensions must be multiples of 8")
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    zz_q = bytes(int(QTABLE[r, c]) for r, c in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    # SOF0: 8-bit, 1 component, no subsampling
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    # DHT (DC then AC)
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, AC_BITS, AC_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    bw = _BitWriter()
    prev_dc = 0
    shifted = pixels.astype(np.float64) - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            coef = _fdct(shifted[by : by + 8, bx : bx + 8])
            q = np.rint(coef / QTABLE).astype(np.int64)
            zz = [int(q[r, c]) for r, c in ZIGZAG]
            diff = zz[0] - prev_dc
            prev_dc = zz[0]
            size = _category(diff)
            code, length = DC_CODES[size]
            bw.write(code, length)
            if size:
                bw.write(_mag_bits(diff, size), size)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, last_nz + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = AC_CODES[0xF0]  # ZRL
                    bw.write(code, length)
                    run -= 16
                size = _category(v)
                code, length = AC_CODES[(run << 4) | size]
                bw.write(code, length)
                bw.write(_mag_bits(v, size), size)
                run = 0
            if last_nz < 63:
                code, length = AC_CODES[0x00]  # EOB
                bw.write(code, length)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_gray(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG produced by encode_gray (also any
    single-component SOF0 stream using one DQT/DHT pair each)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtable = None
    dc_map, ac_map = None, None
    h = w = None
    while True:
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            if body[0] & 0xF0:
                raise ValueError("only 8-bit quant tables")
            q = np.zeros((8, 8), dtype=np.int32)
            for k, (r, c) in enumerate(ZIGZAG):
                q[r, c] = body[1 + k]
            qtable = q
        elif marker == 0xC0:  # SOF0
            _, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp != 1:
                raise NotImplementedError("codec contract: grayscale only")
        elif marker == 0xC4:  # DHT
            cls = body[0] >> 4
            bits = list(body[1:17])
            nvals = sum(bits)
            vals = list(body[17 : 17 + nvals])
            m = _decode_maps(_canonical_codes(bits, vals))
            if cls == 0:
                dc_map = m
            else:
                ac_map = m
        elif marker == 0xDA:  # SOS — entropy data follows
            pos += seglen
            break
        pos += seglen
    if qtable is None or dc_map is None or ac_map is None or h is None:
        raise ValueError("missing DQT/DHT/SOF0 before SOS")
    br = _BitReader(data[pos : len(data) - 2])  # strip EOI
    out = np.zeros((h, w), dtype=np.uint8)
    prev_dc = 0
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            zz = [0] * 64
            size = br.read_code(dc_map)
            diff = _extend(br.read(size), size) if size else 0
            prev_dc += diff
            zz[0] = prev_dc
            k = 1
            while k < 64:
                sym = br.read_code(ac_map)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0x0F
                k += run
                zz[k] = _extend(br.read(size), size)
                k += 1
            coef = np.zeros((8, 8), dtype=np.float64)
            for kk, (r, c) in enumerate(ZIGZAG):
                coef[r, c] = zz[kk] * qtable[r, c]
            block = np.rint(_idct(coef) + 128.0)
            out[by : by + 8, bx : bx + 8] = np.clip(block, 0, 255).astype(np.uint8)
    return out
