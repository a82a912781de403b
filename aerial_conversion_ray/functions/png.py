"""REAL PNG codec (pure numpy + stdlib zlib — no external libs).

This replaces the honest ``DecodeStub`` for the image path: the bytes
on the media column are genuine PNG files (signature, IHDR/IDAT/IEND
chunks, CRCs, zlib-deflated scanlines) and the decoder handles the
full 8-bit baseline: color types 0 (gray), 2 (RGB), 6 (RGBA) and all
five scanline filters.

Vectorization: the per-blob zlib calls are C-speed and inherent to the
codec (exactly what PIL does per image); unfiltering is numpy —
filters None/Sub/Up reconstruct with whole-row vector ops (Sub is a
per-lane modulo-256 prefix sum), Average/Paeth need the sequential
x-recurrence the spec defines and fall back to a per-pixel loop on
the (rare) rows that use them.  Our encoder emits filter 0, so
engine-produced PNGs decode on the fully vectorized path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit PNG from (H, W) gray, (H, W, 3) RGB or (H, W, 4) RGBA."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # filter byte 0 (None) per scanline, vectorized row assembly
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = a.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reconstruct scanlines per the PNG filter spec."""
    stride = w * ch
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int64)  # headroom for sums, mod at end
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        d = data[y]
        if f == 0:  # None
            rec = d
        elif f == 1:  # Sub: per-lane prefix sum mod 256
            rec = d.copy()
            for lane in range(ch):
                rec[lane::ch] = np.cumsum(d[lane::ch]) % 256
        elif f == 2:  # Up
            rec = (d + prev) % 256
        elif f == 3:  # Average (sequential in x)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (d[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth (sequential in x)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a_ = rec[x - ch] if x >= ch else 0
                b_ = prev[x]
                c_ = prev[x - ch] if x >= ch else 0
                p = a_ + b_ - c_
                pa_, pb_, pc_ = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa_ <= pb_ and pa_ <= pc_) else (b_ if pb_ <= pc_ else c_)
                rec[x] = (d[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8).reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) or (H, W, C) uint8."""
    if bytes(buf[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    n = len(buf)
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", buf, pos)
        typ = bytes(buf[pos + 4 : pos + 8])
        data = bytes(buf[pos + 8 : pos + 8 + ln])
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced baseline PNG supported")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    ch = _CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != h * (1 + w * ch):
        raise ValueError("scanline payload size mismatch")
    return _unfilter(raw, h, w, ch)
