"""Pure-numpy media codecs (operators/media_codecs.py) — byte-exact
round-trips and real signal recovery, no Spark session needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opensearch_jvector_plugin_spark.operators.media_codecs import (
    Y4MVideo,
    audio_feature_vector,
    box_resize,
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    encode_y4m,
    image_feature_vector,
    phash64,
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)


def test_ppm_round_trip_exact(img):
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)


def test_ppm_header_comments_and_errors():
    body = bytes(range(12))
    buf = b"P6\n# a comment\n 2 # inline\n2\n255\n" + body
    assert decode_ppm(buf).shape == (2, 2, 3)
    with pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n2 2\n255\n" + body)
    with pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(b"P6\n4 4\n255\n" + body)
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + body)


def _bmp24(img: np.ndarray, bottom_up: bool = True) -> bytes:
    h, w = img.shape[:2]
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    src = img[::-1] if bottom_up else img
    rows[:, : w * 3] = src[:, :, ::-1].reshape(h, w * 3)
    raster = rows.tobytes()
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, h if bottom_up else -h, 1, 24, 0, len(raster),
            2835, 2835, 0, 0,
        )
        + raster
    )


def test_bmp_decode_exact_both_orientations(img):
    assert np.array_equal(decode_bmp(_bmp24(img, bottom_up=True)), img)
    assert np.array_equal(decode_bmp(_bmp24(img, bottom_up=False)), img)
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 64)


def test_wav_round_trip_and_features():
    rate = 8000
    t = np.arange(rate) / rate
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    x, r = decode_wav(encode_wav(sig, rate))
    assert r == rate and x.shape == (rate, 1)
    assert np.abs(x[:, 0] - sig).max() < 1e-3  # 16-bit quantization only
    dur, rms, zcr, centroid, peak = audio_feature_vector(
        encode_wav(sig, rate)
    )
    assert dur == 1.0
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(centroid - 440.0) < 5.0  # real spectral analysis
    assert abs(peak - 0.5) < 1e-3


def test_y4m_geometry_and_frame_access():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (7, 24, 32), np.uint8)
    v = Y4MVideo(encode_y4m(frames, fps=10))
    assert (v.n_frames, v.height, v.width, v.fps) == (7, 24, 32, 10.0)
    assert v.duration_ms == 700
    for i in (0, 3, 6):
        assert np.array_equal(v.luma_plane(i), frames[i])
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        Y4MVideo(b"RIFFxxxx")


def test_box_resize_is_exact_block_mean():
    g = np.arange(16, dtype=np.float64).reshape(4, 4)
    np.testing.assert_allclose(
        box_resize(g, 2, 2), [[2.5, 4.5], [10.5, 12.5]]
    )
    # Non-divisible sizes still cover the grid (no zero-area boxes).
    out = box_resize(np.ones((5, 7)), 3, 2)
    np.testing.assert_allclose(out, 1.0)


def test_phash_content_sensitivity(img):
    ph = phash64(img)
    assert 0 <= ph < 2**64
    # Tiny perturbation: hash is stable (few low-frequency bits move).
    noisy = img.astype(np.int32) + np.random.default_rng(2).integers(
        -2, 3, img.shape
    )
    ph_noisy = phash64(np.clip(noisy, 0, 255).astype(np.uint8))
    assert bin(ph ^ ph_noisy).count("1") <= 6
    # Structurally different image: hash far away.
    other = np.rot90(255 - img, axes=(0, 1)).copy()
    assert bin(ph ^ phash64(other)).count("1") >= 10


def test_image_feature_vector_real_statistics():
    flat = np.full((16, 16, 3), 128, np.uint8)
    f = image_feature_vector(flat)
    assert len(f) == 8
    assert abs(f[0] - 128 / 255) < 1e-6  # mean
    assert f[1] < 1e-9 and f[2] < 1e-9 and f[3] < 1e-9  # no variance/edges
    grad = np.zeros((16, 16, 3), np.uint8)
    grad[:, 8:] = 255
    g = image_feature_vector(grad)
    assert g[2] > 0.05  # horizontal edge energy
    assert g[4] < 0.01 and g[5] > 0.99  # left/right quadrant means
