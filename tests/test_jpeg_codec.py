"""First-party baseline JPEG codec (functions/jpeg.py) unit tests."""

import numpy as np
import pytest

from aerial_conversion_ray.functions.jpeg import (
    DCT_M,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def test_dct_matrix_is_orthonormal():
    assert np.allclose(DCT_M @ DCT_M.T, np.eye(8), atol=1e-12)


def test_zigzag_is_a_permutation_and_involution():
    assert sorted(ZIGZAG) == list(range(64))
    a = np.arange(64)
    assert np.array_equal(a[ZIGZAG][UNZIGZAG], a)
    # first few entries of the standard scan
    assert list(ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2]


def test_quality_tables_monotone():
    q50l, _ = quality_tables(50)
    q90l, _ = quality_tables(90)
    q10l, _ = quality_tables(10)
    assert (q90l <= q50l).all() and (q50l <= q10l).all()
    assert q50l.min() >= 1 and q10l.max() <= 255


def test_flat_image_near_lossless():
    img = np.full((16, 24), 130, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == (16, 24)
    assert np.abs(out.astype(int) - 130).max() <= 1


def test_marker_layout():
    b = encode_jpeg(np.zeros((8, 8), np.uint8))
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b[2:4] == b"\xff\xe0" and b[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b


def test_rgb_444_roundtrip_smooth():
    i, j = np.mgrid[0:40, 0:56]
    rgb = np.stack([(i * 3) % 256, (j * 2) % 256, ((i + j) * 2) % 256], -1)
    rgb = rgb.astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample="444"))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4


def test_rgb_420_odd_dims_roundtrip():
    i, j = np.mgrid[0:37, 0:45]
    rgb = np.stack(
        [
            np.clip(128 + 40 * np.sin(i / 5), 0, 255),
            np.clip(128 + 40 * np.cos(j / 7), 0, 255),
            np.full(i.shape, 90.0),
        ],
        -1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="420"))
    assert out.shape == rgb.shape  # cropped back to odd dims
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 16


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(7)
    g = rng.integers(0, 256, (24, 32)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    err = np.abs(out.astype(int) - g.astype(int))
    assert err.max() <= 32 and err.mean() <= 8


def test_restart_markers_do_not_change_pixels():
    rng = np.random.default_rng(11)
    g = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=75))
    for ri in (1, 3, 7):
        withr = decode_jpeg(encode_jpeg(g, quality=75, restart_interval=ri))
        assert np.array_equal(base, withr)
    b = encode_jpeg(g, quality=75, restart_interval=3)
    assert b"\xff\xdd" in b  # DRI present
    assert any(bytes([0xFF, 0xD0 + k]) in b for k in range(8))  # RSTn present


def test_progressive_rejected_loudly():
    b = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    idx = bytes(b).find(b"\xff\xc0")
    b[idx + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(b))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_decoder_reads_tables_from_stream_not_constants():
    """Quality changes the in-file DQT; the decoder must follow it
    (coarser tables -> larger error on the same noisy image)."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    e90 = np.abs(
        decode_jpeg(encode_jpeg(g, quality=90)).astype(int) - g.astype(int)
    ).mean()
    e20 = np.abs(
        decode_jpeg(encode_jpeg(g, quality=20)).astype(int) - g.astype(int)
    ).mean()
    assert e20 > e90
    assert len(encode_jpeg(g, quality=20)) < len(encode_jpeg(g, quality=90))
