"""Color conversion parity tests (BT.601 constants vs cv2)."""

import cv2
import numpy as np

from trainner_redux_tpu.utils.color_util import (
    rgb2ycbcr,
    rgb2ycbcr_nchw,
    rgb2ycbcr_np,
    ycbcr2rgb_np,
)


def test_rgb2ycbcr_matches_cv2(rng):
    img = rng.random((16, 16, 3), dtype=np.float32)
    ours = rgb2ycbcr_np(img) * 255.0
    # cv2's YCrCb is full-swing JPEG convention — compare against the explicit
    # BT.601 studio-swing formula used by BasicSR instead.
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 65.481 * r + 128.553 * g + 24.966 * b + 16.0
    cb = -37.797 * r - 74.203 * g + 112.0 * b + 128.0
    cr = 112.0 * r - 93.786 * g - 18.214 * b + 128.0
    expected = np.stack([y, cb, cr], axis=-1)
    np.testing.assert_allclose(ours, expected, atol=1e-3)


def test_y_only_matches_full(rng):
    img = rng.random((8, 8, 3), dtype=np.float32)
    y_only = rgb2ycbcr_np(img, y_only=True)
    full = rgb2ycbcr_np(img)[..., 0]
    np.testing.assert_allclose(y_only, full, atol=1e-6)


def test_roundtrip(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    back = ycbcr2rgb_np(rgb2ycbcr_np(img))
    np.testing.assert_allclose(back, img, atol=1e-4)


def test_jax_matches_numpy(rng):
    img = rng.random((8, 8, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(rgb2ycbcr(img)), rgb2ycbcr_np(img), rtol=1e-4, atol=1e-5
    )


def test_nchw_layout(rng):
    img = rng.random((2, 3, 8, 8)).astype(np.float32)
    out = np.asarray(rgb2ycbcr_nchw(img))
    assert out.shape == (2, 3, 8, 8)
    hwc = rgb2ycbcr_np(img[0].transpose(1, 2, 0))
    np.testing.assert_allclose(out[0].transpose(1, 2, 0), hwc, rtol=1e-4, atol=1e-5)
