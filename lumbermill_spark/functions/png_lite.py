"""Dependency-free PNG codec (8-bit, non-interlaced) over stdlib zlib.

Backs the multimodal ``decode_images``/``resize`` real-codec path when
Pillow is not installed: PNG is a fully public format (RFC 2083) and the
deflate payload is stdlib ``zlib``, so grayscale/RGB/RGBA images round-
trip without any imaging library. Encoder always writes filter 0 rows;
decoder reconstructs all five standard filters (None/Sub/Up/Average/
Paeth), so externally-produced non-interlaced 8-bit PNGs decode too.

Like every Python codec in this repo it only runs inside Arrow-batched
``mapInPandas`` stages — never per-row UDFs in a JVM expression plan.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> stored channels per pixel (palette stores 1 index byte)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(arr) -> bytes:
    """(h, w) gray / (h, w, 3) RGB / (h, w, 4) RGBA uint8 → PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color = 6
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8 array")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = arr.reshape(h, -1)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, channels).

    ValueError on non-PNG input or unsupported variants (16-bit,
    palette, interlaced)."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    off, idat, meta, plte = 8, [], None, None
    while off + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, off)
        body = data[off + 8:off + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        off += 12 + ln
        if typ == b"IHDR":
            w, h, depth, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or inter != 0 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, "
                    f"color={color}, interlace={inter})")
            meta = (w, h, _CHANNELS[color], color)
        elif typ == b"PLTE":
            if len(body) % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if meta is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, ch, color = meta
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt PNG deflate stream: {exc}") from exc
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).astype(np.int32)
        pos += stride
        if f == 0:
            cur = line
        elif f == 2:                       # Up: fully vectorized
            cur = (line + prev) & 0xFF
        elif f == 1:                       # Sub: per-lane cumsum mod 256
            # recurrence cur[x] = (line[x] + cur[x-ch]) % 256 is an
            # independent running sum per channel lane; cumsum in int64
            # then mask — vectorized (mod distributes over addition)
            cur = (np.cumsum(line.reshape(-1, ch), axis=0,
                             dtype=np.int64) & 0xFF) \
                .astype(np.int32).reshape(stride)
        elif f in (3, 4):                  # Average/Paeth: sequential
            # floor-div / 3-way predictor break linearity, so these two
            # stay a per-byte loop — the known slow path for externally
            # produced PNGs (libpng/Pillow default to adaptive
            # filtering). Self-encoded PNGs (encode_png) use filter 0
            # and never hit it; install Pillow for bulk foreign decode.
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if f == 3:
                    pred = (a + b) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    if color == 3:                         # palette indices -> RGB
        if int(out.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[out.reshape(h, w)]
    return out.reshape(h, w, ch) if ch > 1 else out.reshape(h, w)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (the deterministic, lib-free kernel)."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]


def mean_luma(arr: np.ndarray) -> float:
    """ITU-R 601-2 luma mean in [0, 1] (Pillow's convert('L') weights)."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        lum = a
    elif a.shape[2] >= 3:
        lum = (a[..., 0] * 299 + a[..., 1] * 587 + a[..., 2] * 114) / 1000
    else:                                  # gray + alpha
        lum = a[..., 0]
    return float(lum.mean() / 255.0)
