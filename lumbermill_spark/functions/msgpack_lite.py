"""Dependency-free MessagePack codec for the common type subset.

Fallback for ``parser.MsgPack`` when the ``msgpack`` package is not
installed (reference: /root/reference/lumbermill/parser/MsgPack.py:89-134
decodes events with msgpack-python). Implements the public MessagePack
spec for: nil, bool, all int widths, float32/64, str, bin, array, map.
Ext types are not supported (raise ValueError → the parser's
undecodable-payload path). The encoder exists for tests/generators —
the decode path is what production uses.

Executor-side cost note: this is plain Python, so it only ever runs
inside an Arrow-batched pandas UDF (like the reference decoder this is
byte-at-a-time work that no JVM expression covers); when the C-backed
``msgpack`` package is importable the parser prefers it.
"""

from __future__ import annotations

import struct

_F32 = struct.Struct(">f")
_F64 = struct.Struct(">d")
_INT = {0xCC: struct.Struct(">B"), 0xCD: struct.Struct(">H"),
        0xCE: struct.Struct(">I"), 0xCF: struct.Struct(">Q"),
        0xD0: struct.Struct(">b"), 0xD1: struct.Struct(">h"),
        0xD2: struct.Struct(">i"), 0xD3: struct.Struct(">q")}


def packb(o) -> bytes:
    out = bytearray()
    _pack(o, out)
    return bytes(out)


def _pack(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(o & 0xFF)
        elif 0 < o <= 0xFF:
            out += bytes([0xCC, o])
        elif 0 < o <= 0xFFFF:
            out += b"\xcd" + o.to_bytes(2, "big")
        elif 0 < o <= 0xFFFFFFFF:
            out += b"\xce" + o.to_bytes(4, "big")
        elif 0 < o <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + o.to_bytes(8, "big")
        elif -0x80 <= o < 0:
            out += b"\xd0" + o.to_bytes(1, "big", signed=True)
        elif -0x8000 <= o < 0:
            out += b"\xd1" + o.to_bytes(2, "big", signed=True)
        elif -0x80000000 <= o < 0:
            out += b"\xd2" + o.to_bytes(4, "big", signed=True)
        elif -0x8000000000000000 <= o < 0:
            out += b"\xd3" + o.to_bytes(8, "big", signed=True)
        else:
            raise ValueError("int out of msgpack range")
    elif isinstance(o, float):
        out += b"\xcb" + _F64.pack(o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out += b"\xda" + n.to_bytes(2, "big")
        else:
            out += b"\xdb" + n.to_bytes(4, "big")
        out += b
    elif isinstance(o, (bytes, bytearray, memoryview)):
        b = bytes(o)
        n = len(b)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out += b"\xc5" + n.to_bytes(2, "big")
        else:
            out += b"\xc6" + n.to_bytes(4, "big")
        out += b
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + n.to_bytes(2, "big")
        else:
            out += b"\xdd" + n.to_bytes(4, "big")
        for x in o:
            _pack(x, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + n.to_bytes(2, "big")
        else:
            out += b"\xdf" + n.to_bytes(4, "big")
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"cannot msgpack-encode {type(o).__name__}")


def unpackb(buf: bytes):
    """Decode one msgpack object; ValueError on malformed/trailing/ext."""
    try:
        obj, off = _unpack(memoryview(bytes(buf)), 0)
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"truncated msgpack data: {exc}") from exc
    if off != len(buf):
        raise ValueError("trailing bytes after msgpack object")
    return obj


def _take(mv: memoryview, off: int, n: int) -> tuple[bytes, int]:
    if off + n > len(mv):
        raise ValueError("msgpack data ends mid-value")
    return bytes(mv[off:off + n]), off + n


def _unpack(mv: memoryview, off: int):
    if off >= len(mv):
        raise ValueError("empty msgpack input")
    b = mv[off]
    off += 1
    if b <= 0x7F:                       # positive fixint
        return b, off
    if b >= 0xE0:                       # negative fixint
        return b - 0x100, off
    if 0x80 <= b <= 0x8F:               # fixmap
        return _unpack_map(mv, off, b & 0x0F)
    if 0x90 <= b <= 0x9F:               # fixarray
        return _unpack_array(mv, off, b & 0x0F)
    if 0xA0 <= b <= 0xBF:               # fixstr
        raw, off = _take(mv, off, b & 0x1F)
        return raw.decode("utf-8"), off
    if b == 0xC0:
        return None, off
    if b == 0xC2:
        return False, off
    if b == 0xC3:
        return True, off
    if b in (0xC4, 0xC5, 0xC6):         # bin 8/16/32
        w = 1 << (b - 0xC4)
        raw, off = _take(mv, off, w)
        n = int.from_bytes(raw, "big")
        return _take(mv, off, n)
    if b == 0xCA:
        raw, off = _take(mv, off, 4)
        return _F32.unpack(raw)[0], off
    if b == 0xCB:
        raw, off = _take(mv, off, 8)
        return _F64.unpack(raw)[0], off
    if b in _INT:
        st = _INT[b]
        raw, off = _take(mv, off, st.size)
        return st.unpack(raw)[0], off
    if b in (0xD9, 0xDA, 0xDB):         # str 8/16/32
        w = 1 << (b - 0xD9)
        raw, off = _take(mv, off, w)
        n = int.from_bytes(raw, "big")
        raw, off = _take(mv, off, n)
        return raw.decode("utf-8"), off
    if b in (0xDC, 0xDD):               # array 16/32
        w = 2 << (b - 0xDC)
        raw, off = _take(mv, off, w)
        return _unpack_array(mv, off, int.from_bytes(raw, "big"))
    if b in (0xDE, 0xDF):               # map 16/32
        w = 2 << (b - 0xDE)
        raw, off = _take(mv, off, w)
        return _unpack_map(mv, off, int.from_bytes(raw, "big"))
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x}")


def _unpack_array(mv: memoryview, off: int, n: int):
    out = []
    for _ in range(n):
        v, off = _unpack(mv, off)
        out.append(v)
    return out, off


def _unpack_map(mv: memoryview, off: int, n: int):
    out = {}
    for _ in range(n):
        k, off = _unpack(mv, off)
        v, off = _unpack(mv, off)
        out[k] = v
    return out, off
