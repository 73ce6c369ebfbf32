"""Minimal pure-stdlib RIFF/WAVE PCM codec (the audio leg of the
multimodal suite; see png_lite / y4m_lite for the image and video
legs).

Supported subset — documented, checked, fail-fast: RIFF/WAVE with one
``fmt `` chunk (format 1 = integer PCM, 16-bit) and one ``data``
chunk; mono or interleaved multi-channel. That subset is what training
pipelines actually normalize TO before feature extraction; anything
else (float PCM, ADPCM, extensible headers) raises :class:`WavError`
so a bad payload never silently yields wrong features.

The encoder exists so tests and the oracle-checked query can
synthesize deterministic payloads without any audio library in the
container; the decoder is the production path (stdlib ``struct`` +
numpy frombuffer — no Python per-sample loop).

Reference parity note: the reference has no audio module; this is part
of the training-data surface this engine adds (SURVEY §2 "beyond the
reference" table).
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    pass


def encode_wav(samples: np.ndarray, sample_rate: int,
               channels: int = 1) -> bytes:
    """int16 samples (interleaved when channels > 1) -> WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1:
        raise WavError("samples must be a flat interleaved int16 array")
    if channels < 1 or len(s) % channels:
        raise WavError("sample count must be a multiple of channels")
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                             byte_rate, block_align, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes -> (sample_rate, channels, int16 samples interleaved).

    Walks RIFF chunks (tolerates extra chunks like LIST/INFO before or
    after data — real-world files carry them)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            # validate against the ACTUAL body length, not the declared
            # size — a truncated payload must raise WavError (which
            # decode_audio turns into a null row), never struct.error
            if size < 16 or len(body) < 16:
                raise WavError("fmt chunk too short/truncated")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            # declared-vs-actual check, same as fmt: a data chunk cut
            # off by truncation must raise (-> null feature row), not
            # silently yield a short sample array with plausible but
            # wrong rms/duration
            if len(body) < size:
                raise WavError("data chunk truncated")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt/data chunk")
    audio_format, channels, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise WavError(
            f"unsupported WAV (format={audio_format}, bits={bits}); "
            "only 16-bit integer PCM is in the supported subset")
    if channels < 1:
        raise WavError("channels < 1")
    usable = len(data) - (len(data) % (2 * channels))
    samples = np.frombuffer(data[:usable], dtype="<i2")
    return int(rate), int(channels), samples


def probe(payload: bytes) -> dict:
    rate, channels, samples = parse_wav(payload)
    n = len(samples) // channels
    return {"sample_rate": rate, "channels": channels, "n_samples": n,
            "duration_s": n / rate if rate else 0.0}
