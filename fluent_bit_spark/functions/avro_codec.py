"""Avro binary codec: schema-driven record encoding + Object Container
Files.

The reference encodes log records to Avro binary against a user-supplied
schema (src/flb_avro.c: flb_msgpack_to_avro / flb_avro_init, used by
out_kafka's ``format avro`` path). The runtime here has the Avro JVM jars
but not the ``spark-avro`` data-source module and no avro/fastavro wheel,
so the wire format is implemented directly from the public Avro 1.11 spec
(avro.apache.org/docs/current/specification/) — this is an interchange
boundary codec like msgpack_codec, not a hot-path format; inside the
engine the columnar format stays parquet/Arrow. Invoked only through
Arrow-batched ``applyInPandas``/``mapInPandas`` wrappers (connectors.py).

Wire rules implemented (spec §"Binary encoding"):
- int/long: zigzag then little-endian base-128 varint;
- float/double: little-endian IEEE-754;
- string/bytes: long-prefixed; boolean: single 0/1 byte; null: empty;
- record: fields in declaration order; enum: int position;
- array/map: count-prefixed blocks terminated by a 0 count;
- union: long branch index then the value;
- fixed: raw bytes, length fixed by schema.
Object Container File (spec §"Object Container Files"): magic ``Obj\\x01``,
metadata map (avro.schema / avro.codec), 16-byte sync marker, then blocks
of (record count, serialized size, payload, sync). Codecs: null, deflate
(raw RFC-1951, the spec's required+optional pair).
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive encoders
# --------------------------------------------------------------------------
def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def enc_long(n: int) -> bytes:
    z = zigzag(n)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def dec_long(buf: bytes, off: int) -> tuple[int, int]:
    z, shift = 0, 0
    while True:
        b = buf[off]
        off += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            return unzigzag(z), off
        shift += 7


def enc_bytes(b: bytes) -> bytes:
    return enc_long(len(b)) + b


def enc_str(s: str) -> bytes:
    return enc_bytes(s.encode("utf-8"))


# --------------------------------------------------------------------------
# schema-driven value codec
# --------------------------------------------------------------------------
def _norm(schema: Any) -> Any:
    """A schema node is a type-name string, a dict, or a union list."""
    if isinstance(schema, str):
        return {"type": schema}
    return schema


def _branch_matches(schema: Any, value: Any) -> bool:
    s = _norm(schema)
    t = s if isinstance(s, list) else s["type"]
    if value is None:
        return t == "null"
    if isinstance(value, bool):
        return t == "boolean"
    if isinstance(value, int):
        return t in ("int", "long", "double", "float")
    if isinstance(value, float):
        return t in ("double", "float")
    if isinstance(value, str):
        return t in ("string", "enum")
    if isinstance(value, (bytes, bytearray)):
        return t in ("bytes", "fixed")
    if isinstance(value, dict):
        return t in ("record", "map")
    if isinstance(value, (list, tuple)):
        return t == "array"
    return False


def encode_value(schema: Any, value: Any) -> bytes:
    """Encode one value against a (parsed-JSON) Avro schema node."""
    if isinstance(schema, list):  # union: branch index + value
        for i, branch in enumerate(schema):
            if _branch_matches(branch, value):
                return enc_long(i) + encode_value(branch, value)
        raise TypeError(f"no union branch in {schema} for {value!r}")
    s = _norm(schema)
    t = s["type"]
    if t == "null":
        if value is not None:
            raise TypeError(f"null schema got {value!r}")
        return b""
    if t == "boolean":
        return b"\x01" if value else b"\x00"
    if t in ("int", "long"):
        return enc_long(int(value))
    if t == "float":
        return struct.pack("<f", float(value))
    if t == "double":
        return struct.pack("<d", float(value))
    if t == "string":
        return enc_str(value)
    if t == "bytes":
        return enc_bytes(bytes(value))
    if t == "fixed":
        raw = bytes(value)
        if len(raw) != s["size"]:
            raise ValueError(f"fixed size {s['size']} != {len(raw)}")
        return raw
    if t == "enum":
        return enc_long(s["symbols"].index(value))
    if t == "record":
        return b"".join(encode_value(f["type"], value.get(f["name"])) for f in s["fields"])
    if t == "array":
        if not value:
            return enc_long(0)
        body = b"".join(encode_value(s["items"], v) for v in value)
        return enc_long(len(value)) + body + enc_long(0)
    if t == "map":
        if not value:
            return enc_long(0)
        body = b"".join(enc_str(k) + encode_value(s["values"], v) for k, v in value.items())
        return enc_long(len(value)) + body + enc_long(0)
    raise TypeError(f"unsupported avro type {t!r}")


def decode_value(schema: Any, buf: bytes, off: int = 0) -> tuple[Any, int]:
    if isinstance(schema, list):
        idx, off = dec_long(buf, off)
        return decode_value(schema[idx], buf, off)
    s = _norm(schema)
    t = s["type"]
    if t == "null":
        return None, off
    if t == "boolean":
        return buf[off] == 1, off + 1
    if t in ("int", "long"):
        return dec_long(buf, off)
    if t == "float":
        return struct.unpack_from("<f", buf, off)[0], off + 4
    if t == "double":
        return struct.unpack_from("<d", buf, off)[0], off + 8
    if t == "string":
        n, off = dec_long(buf, off)
        return buf[off : off + n].decode("utf-8"), off + n
    if t == "bytes":
        n, off = dec_long(buf, off)
        return bytes(buf[off : off + n]), off + n
    if t == "fixed":
        n = s["size"]
        return bytes(buf[off : off + n]), off + n
    if t == "enum":
        i, off = dec_long(buf, off)
        return s["symbols"][i], off
    if t == "record":
        rec = {}
        for f in s["fields"]:
            rec[f["name"]], off = decode_value(f["type"], buf, off)
        return rec, off
    if t in ("array", "map"):
        out: Any = [] if t == "array" else {}
        while True:
            n, off = dec_long(buf, off)
            if n == 0:
                return out, off
            if n < 0:  # block with byte-size prefix (spec-permitted form)
                _, off = dec_long(buf, off)
                n = -n
            for _ in range(n):
                if t == "array":
                    v, off = decode_value(s["items"], buf, off)
                    out.append(v)
                else:
                    k, koff = dec_long(buf, off)
                    key = buf[koff : koff + k].decode("utf-8")
                    off = koff + k
                    out[key], off = decode_value(s["values"], buf, off)
    raise TypeError(f"unsupported avro type {t!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------
def ocf_bytes(schema: Any, records: list, codec: str = "null", sync: bytes | None = None) -> bytes:
    """Serialize records into one Avro Object Container File blob.

    ``sync`` defaults to a deterministic schema-derived marker so repeated
    runs are byte-identical (the spec only requires 16 random-ish bytes)."""
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=True)
    if sync is None:
        sync = hashlib.md5(schema_json.encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    head = bytearray(MAGIC)
    head += enc_long(len(meta))
    for k, v in sorted(meta.items()):
        head += enc_str(k) + enc_bytes(v)
    head += enc_long(0)
    head += sync
    if records:
        payload = b"".join(encode_value(schema, r) for r in records)
        if codec == "deflate":
            payload = zlib.compress(payload, 9)[2:-4]  # raw RFC-1951 stream
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        head += enc_long(len(records)) + enc_long(len(payload)) + payload + sync
    return bytes(head)


def read_ocf(buf: bytes) -> tuple[Any, list]:
    """Parse one container file -> (schema, records). Validates magic,
    codec, and every block's sync marker."""
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    off = 4
    meta: dict[str, bytes] = {}
    while True:
        n, off = dec_long(buf, off)
        if n == 0:
            break
        if n < 0:
            _, off = dec_long(buf, off)
            n = -n
        for _ in range(n):
            klen, off = dec_long(buf, off)
            key = buf[off : off + klen].decode("utf-8")
            off += klen
            vlen, off = dec_long(buf, off)
            meta[key] = bytes(buf[off : off + vlen])
            off += vlen
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf[off : off + 16]
    off += 16
    records = []
    while off < len(buf):
        count, off = dec_long(buf, off)
        size, off = dec_long(buf, off)
        block = buf[off : off + size]
        off += size
        if buf[off : off + 16] != sync:
            raise ValueError("sync marker mismatch")
        off += 16
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        boff = 0
        for _ in range(count):
            rec, boff = decode_value(schema, block, boff)
            records.append(rec)
    return schema, records
