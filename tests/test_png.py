"""First-party PNG codec: roundtrips, all five scanline filters, and
the real media_decode pipeline stage."""

import struct
import zlib

import numpy as np
import pytest

from aerial_conversion_ray.functions import png


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (13, 31), (7, 5, 3), (4, 6, 4)]
)
def test_roundtrip(shape):
    arr = _rand(shape, sum(shape))
    out = png.decode_png(png.encode_png(arr))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


def _encode_with_filters(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Hand-rolled encoder applying a CHOSEN filter per scanline (the
    spec's forward direction) so the decoder's unfilter is exercised
    on every type."""
    h, w = arr.shape
    prev = np.zeros(w, dtype=np.int64)
    lines = []
    for y, f in zip(range(h), ftypes):
        cur = arr[y].astype(np.int64)
        left = np.concatenate([[0], cur[:-1]])
        ul = np.concatenate([[0], prev[:-1]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = (cur - (left + prev) // 2) % 256
        else:  # Paeth
            p = left + prev - ul
            pa_, pb_, pc_ = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, prev, ul)
            )
            filt = (cur - pred) % 256
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(lines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw))
        + png._chunk(b"IEND", b"")
    )


def test_all_filter_types_decode():
    arr = _rand((10, 9), 42)
    ftypes = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    buf = _encode_with_filters(arr, ftypes)
    assert np.array_equal(png.decode_png(buf), arr)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        png.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        # 16-bit depth unsupported
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
        png.decode_png(
            b"\x89PNG\r\n\x1a\n"
            + png._chunk(b"IHDR", ihdr)
            + png._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + png._chunk(b"IEND", b"")
        )


def test_media_decode_real_codec(ray_session, sf_dir):
    """The media_decode stage synthesizes genuine PNG bytes and the
    decoder recovers the exact deterministic pixels (numpy oracle)."""
    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import multimodal

    cfg = EngineConfig(pages_rep=2)
    got = (
        multimodal.media_decode(sf_dir, cfg)
        .to_pandas()
        .sort_values("page_id")
        .reset_index(drop=True)
    )
    pid = got["page_id"].to_numpy()
    w, h = multimodal._png_dims(pid)
    assert np.array_equal(got["img_w"].to_numpy(), w)
    assert np.array_equal(got["img_h"].to_numpy(), h)
    # spot-exact pixel sums on a sample
    for k in range(0, len(got), max(1, len(got) // 17)):
        p = int(pid[k])
        i, j = np.meshgrid(np.arange(h[k]), np.arange(w[k]), indexing="ij")
        v = (p * 3 + i * 7 + j * 13) % multimodal.PNG_MOD
        assert int(got["px_sum"].iloc[k]) == int(v.sum())
        assert int(got["max_byte"].iloc[k]) == int(v.max())
