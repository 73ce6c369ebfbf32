"""Pure-stdlib YUV4MPEG2 (Y4M) codec subset — uncompressed video.

Y4M is the uncompressed interchange container used by mjpegtools /
ffmpeg (`yuv4mpeg(5)`): one ASCII stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A<n>:<d>] [C<cs>] ...\\n``
followed by frames, each ``FRAME[ params]\\n`` + raw planar YCbCr
bytes. Because frames are raw planes, a parser needs no codec library —
this is the video analog of ``png_lite``: it makes the
``multimodal.frame_sample`` operator's ``codec='real'`` path executable
in a container with no ffmpeg/PyAV, for payloads in this format.

Supported colorspaces (8-bit): C420 (+jpeg/paldv/mpeg2 tags — chroma
siting differs between those but plane SIZES do not, which is all a
parser needs), C422, C444, Cmono. Interlaced streams are accepted and
treated as full frames (Ip/It/Ib only affect display interpretation).

Scale note: payloads are parsed inside Arrow batches of a mapInPandas
stage; a 10-second 1080p Y4M clip is ~1.5 GB, so real deployments
should lower ``spark.sql.execution.arrow.maxRecordsPerBatch`` for
video tables (see multimodal module docstring).

Reference parity: LumberMill has no video path at all (nothing under
/root/reference/lumbermill handles media); this module backs the
training-pipeline multimodal surface required by the build brief.
"""

from __future__ import annotations

import numpy as np

#: per-plane (xdiv, ydiv) subsampling divisors, keyed by the C-tag body.
_PLANE_DIVS: dict[str, tuple[tuple[int, int], ...]] = {
    "420": ((1, 1), (2, 2), (2, 2)),
    "420jpeg": ((1, 1), (2, 2), (2, 2)),
    "420paldv": ((1, 1), (2, 2), (2, 2)),
    "420mpeg2": ((1, 1), (2, 2), (2, 2)),
    "422": ((1, 1), (2, 1), (2, 1)),
    "444": ((1, 1), (1, 1), (1, 1)),
    "mono": ((1, 1),),
}

_MAGIC = b"YUV4MPEG2"


class Y4MError(ValueError):
    """Malformed or unsupported Y4M payload."""


def _plane_shape(w: int, h: int, divs: tuple[int, int]) -> tuple[int, int]:
    xd, yd = divs
    # ceil-divide: odd dims are legal for 444/mono; 420 requires even,
    # but ffmpeg pads with ceil so we mirror that.
    return (-(-h // yd), -(-w // xd))


def parse_header(payload: bytes) -> tuple[dict, int]:
    """Parse the stream header. Returns (params, offset-after-newline).

    params: {width, height, fps_num, fps_den, colorspace} — colorspace
    is the normalized C-tag body ('420', '422', '444', 'mono', ...).
    """
    if not payload.startswith(_MAGIC + b" "):
        raise Y4MError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n", 0, 4096)
    if nl < 0:
        raise Y4MError("unterminated Y4M stream header")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420"
    for tok in payload[len(_MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        tag, body = chr(tok[0]), tok[1:].decode("ascii", "replace")
        if tag == "W":
            width = int(body)
        elif tag == "H":
            height = int(body)
        elif tag == "F":
            num, _, den = body.partition(":")
            fps_num, fps_den = int(num), int(den or 1)
        elif tag == "C":
            cs = body
            # strip depth suffixes we don't support (e.g. 420p10)
            if cs not in _PLANE_DIVS:
                raise Y4MError(f"unsupported Y4M colorspace C{cs}")
            colorspace = cs
        # I (interlace), A (aspect), X (comment): size-irrelevant
    if not width or not height or width < 0 or height < 0:
        raise Y4MError("Y4M header missing W/H")
    return (
        {
            "width": width,
            "height": height,
            "fps_num": fps_num,
            "fps_den": fps_den,
            "colorspace": colorspace,
        },
        nl + 1,
    )


def iter_frames(payload: bytes):
    """Yield (frame_idx, planes) for every frame; planes is a tuple of
    uint8 numpy arrays (Y[, Cb, Cr]) with subsampled chroma shapes.

    Plane arrays are zero-copy views over the payload buffer.
    """
    params, off = parse_header(payload)
    w, h = params["width"], params["height"]
    divs = _PLANE_DIVS[params["colorspace"]]
    shapes = [_plane_shape(w, h, d) for d in divs]
    sizes = [r * c for r, c in shapes]
    frame_bytes = sum(sizes)
    buf = memoryview(payload)
    idx = 0
    n = len(payload)
    while off < n:
        nl = payload.find(b"\n", off, off + 1024)
        if nl < 0 or not payload.startswith(b"FRAME", off):
            raise Y4MError(f"bad FRAME marker at offset {off}")
        off = nl + 1
        if off + frame_bytes > n:
            raise Y4MError(f"truncated Y4M frame {idx}")
        planes = []
        for (rows, cols), size in zip(shapes, sizes):
            planes.append(
                np.frombuffer(buf[off : off + size], dtype=np.uint8)
                .reshape(rows, cols)
            )
            off += size
        yield idx, tuple(planes)
        idx += 1


def probe(payload: bytes) -> dict:
    """Header params + frame count (validates total length)."""
    params, off = parse_header(payload)
    count = sum(1 for _ in iter_frames(payload))
    return {**params, "n_frames": count}


def encode_y4m(
    frames,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """Encode uint8 frames into a Y4M stream.

    ``frames``: iterable of either 2-D luma arrays (colorspace='mono')
    or (Y, Cb, Cr) tuples whose chroma shapes match the colorspace's
    subsampling. All frames must share dimensions.
    """
    if colorspace not in _PLANE_DIVS:
        raise Y4MError(f"unsupported colorspace {colorspace}")
    divs = _PLANE_DIVS[colorspace]
    out = []
    w = h = None
    for f in frames:
        planes = (f,) if isinstance(f, np.ndarray) else tuple(f)
        if len(planes) != len(divs):
            raise Y4MError(
                f"frame has {len(planes)} planes, colorspace "
                f"{colorspace} needs {len(divs)}"
            )
        y = np.ascontiguousarray(planes[0], dtype=np.uint8)
        if w is None:
            h, w = y.shape
            shapes = [_plane_shape(w, h, d) for d in divs]
            out.append(
                f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 "
                f"C{colorspace}\n".encode("ascii")
            )
        for p, shape in zip(planes, shapes):
            p = np.ascontiguousarray(p, dtype=np.uint8)
            if p.shape != shape:
                raise Y4MError(f"plane shape {p.shape} != expected {shape}")
        out.append(b"FRAME\n")
        for p in planes:
            out.append(np.ascontiguousarray(p, dtype=np.uint8).tobytes())
    if w is None:
        raise Y4MError("no frames to encode")
    return b"".join(out)
