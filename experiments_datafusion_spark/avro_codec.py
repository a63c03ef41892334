"""Pure-Python Avro Object Container File codec (Avro 1.11 spec,
https://avro.apache.org/docs/1.11.1/specification/) — the offline answer to
the one environment-blocked scan format: this container bundles no
spark-avro jar and pip has no index, so the JVM connector cannot load, but
the FORMAT itself is simple enough to speak directly.  sources/avro_source.py
wraps this codec as a Spark 4 Python DataSource (format "pyavro") with a
distributed reader (one partition per file) and a per-task writer, and
io.read_avro documents when to prefer which.

Supported schema subset (the DataSource's contract): a top-level record
whose fields are the Avro primitives null / boolean / int / long / float /
double / string / bytes, optionally wrapped in the nullable union
["null", T].  The long logicalType timestamp-micros round-trips as int64
microseconds (the DataSource maps it to TimestampType).

Wire format implemented here, straight from the spec:
  * varint zigzag longs; strings/bytes as length-prefixed payloads;
    float/double little-endian IEEE; boolean one byte
  * container = magic b"Obj\\x01", a metadata map (avro.schema JSON,
    avro.codec), a 16-byte sync marker, then blocks of
    (row count, byte size, payload, sync)
  * codecs: "null" and "deflate" (raw DEFLATE, wbits=-15 — Avro deflate
    carries no zlib header/checksum)
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic marker (no RNG — replayable files)


# ---- primitive binary encoding ----------------------------------------------


def _enc_long(n: int) -> bytes:
    # zigzag (spec: (n << 1) ^ (n >> 63)), written sign-split so Python's
    # arbitrary-precision ints can't smear the arithmetic shift
    z = ((-n - 1) << 1) | 1 if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


_PRIM_ENC = {
    "null": lambda v: b"",
    "boolean": lambda v: b"\x01" if v else b"\x00",
    "int": _enc_long,
    "long": _enc_long,
    "float": lambda v: struct.pack("<f", float(v)),
    "double": lambda v: struct.pack("<d", float(v)),
    "string": _enc_str,
    "bytes": lambda v: _enc_bytes(bytes(v)),
}


def _dec_value(typ: str, buf: bytes, pos: int):
    if typ == "null":
        return None, pos
    if typ == "boolean":
        return buf[pos] == 1, pos + 1
    if typ in ("int", "long"):
        return _dec_long(buf, pos)
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ in ("string", "bytes"):
        n, pos = _dec_long(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else bytes(raw)), pos + n
    raise NotImplementedError(f"avro type not supported by this codec: {typ!r}")


def _field_type(t):
    """Normalize a field's schema entry to ('union-nullable'?, primitive)."""
    if isinstance(t, dict):  # {"type": "long", "logicalType": ...}
        return False, t["type"]
    if isinstance(t, list):  # nullable union ["null", T]
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise NotImplementedError(f"only [null, T] unions supported: {t!r}")
        base = non_null[0]
        return True, base["type"] if isinstance(base, dict) else base
    return False, t


# ---- container write/read ----------------------------------------------------


def write_container(
    path: str,
    schema: dict,
    rows,
    codec: str = "deflate",
    rows_per_block: int = 4096,
) -> int:
    """Write rows (tuples in field order) as an Avro container; returns the
    row count."""
    fields = [(f["name"], *_field_type(f["type"])) for f in schema["fields"]]
    n_total = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
            "avro.codec": codec.encode(),
        }
        f.write(_enc_long(len(meta)))
        for k, v in meta.items():
            f.write(_enc_str(k))
            f.write(_enc_bytes(v))
        f.write(_enc_long(0))  # map terminator
        f.write(SYNC)
        block = io.BytesIO()
        n_block = 0

        def flush():
            nonlocal n_block
            if not n_block:
                return
            payload = block.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(level=6, wbits=-15)
                payload = c.compress(payload) + c.flush()
            elif codec != "null":
                raise NotImplementedError(f"codec {codec!r}")
            f.write(_enc_long(n_block))
            f.write(_enc_long(len(payload)))
            f.write(payload)
            f.write(SYNC)
            block.seek(0)
            block.truncate()
            n_block = 0

        for row in rows:
            for (name, nullable, typ), v in zip(fields, row):
                if nullable:
                    if v is None:
                        block.write(_enc_long(0))  # union branch: null
                        continue
                    block.write(_enc_long(1))  # union branch: T
                elif v is None:
                    raise ValueError(f"null in non-nullable field {name}")
                block.write(_PRIM_ENC[typ](v))
            n_block += 1
            n_total += 1
            if n_block >= rows_per_block:
                flush()
        flush()
    return n_total


def read_schema(path: str) -> dict:
    with open(path, "rb") as f:
        header = f.read(1 << 20)
    schema, _, _, _ = _parse_header(header)
    return schema


def _parse_header(buf: bytes):
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro container (bad magic)")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _dec_long(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n, pos = -n, pos
            _, pos = _dec_long(buf, pos)
        for _ in range(n):
            klen, pos = _dec_long(buf, pos)
            k = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _dec_long(buf, pos)
            meta[k] = buf[pos : pos + vlen]
            pos += vlen
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync, pos


def read_container(path: str):
    """Yield rows (tuples in field order) from an Avro container file."""
    with open(path, "rb") as f:
        buf = f.read()
    schema, codec, sync, pos = _parse_header(buf)
    fields = [(f["name"], *_field_type(f["type"])) for f in schema["fields"]]
    while pos < len(buf):
        n_rows, pos = _dec_long(buf, pos)
        size, pos = _dec_long(buf, pos)
        payload = buf[pos : pos + size]
        pos += size
        if buf[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise NotImplementedError(f"codec {codec!r}")
        p = 0
        for _ in range(n_rows):
            row = []
            for _, nullable, typ in fields:
                if nullable:
                    branch, p = _dec_long(payload, p)
                    if branch == 0:
                        row.append(None)
                        continue
                v, p = _dec_value(typ, payload, p)
                row.append(v)
            yield tuple(row)
