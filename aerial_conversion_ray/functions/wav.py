"""First-party WAV (RIFF / PCM) codec — minimal, real, dependency-free.

The container ships no audio libraries, so the engine carries its own
encoder/decoder for the baseline format every tool can read: RIFF
"WAVE" with a canonical 16-byte ``fmt `` chunk (PCM, mono or
multi-channel, 16-bit signed little-endian) and one ``data`` chunk.
Semantics source: the public RIFF/WAVE spec (the same role
``functions/png.py`` plays for images).  The decoder walks chunks (so
writers that insert LIST/INFO chunks still parse) and returns the
sample matrix.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 -> WAV bytes (PCM16, little-endian)."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, ch) int16 samples, sample rate).  Chunk-walking
    parser: tolerates extra chunks, validates PCM16."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    ch = rate = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        payload = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", payload[:16])
            if tag != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if ch is None or data is None:
        raise ValueError("missing fmt/data chunk")
    arr = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return arr, int(rate)
