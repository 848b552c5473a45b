"""PSNR / SSIM metrics, numpy + JAX variants.

Parity: /root/reference/traiNNer/metrics/psnr_ssim.py:13-262 (itself matching
cv2/matlab conventions): images in [0, 255] scale for the SSIM constants,
11x11 Gaussian window sigma 1.5, optional Y-channel evaluation and border
cropping. Published benchmark numbers (BASELINE.md §A) depend on these exact
conventions.
"""

from __future__ import annotations

import cv2
import numpy as np

from trainner_redux_tpu.utils.color_util import rgb2ycbcr_np
from trainner_redux_tpu.utils.registry import METRIC_REGISTRY


def _prepare(img: np.ndarray, crop_border: int, test_y_channel: bool) -> np.ndarray:
    """HWC float [0,1] RGB (or HW) -> evaluation array in [0,255] float64."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 2:
        img = img[..., None]
    if crop_border != 0:
        img = img[crop_border:-crop_border, crop_border:-crop_border, ...]
    if test_y_channel and img.shape[2] == 3:
        img = rgb2ycbcr_np(img.astype(np.float32), y_only=True).astype(np.float64)
        img = img[..., None] if img.ndim == 2 else img
    return img * 255.0


@METRIC_REGISTRY.register(name="calculate_psnr")
def calculate_psnr(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 0,
    test_y_channel: bool = False,
    **kwargs,
) -> float:
    assert img.shape == img2.shape, f"Image shapes differ: {img.shape} vs {img2.shape}"
    a = _prepare(img, crop_border, test_y_channel)
    b = _prepare(img2, crop_border, test_y_channel)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _ssim_channel(img: np.ndarray, img2: np.ndarray) -> float:
    """cv2-convention single-channel SSIM on [0,255] float64."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())

    mu1 = cv2.filter2D(img, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = cv2.filter2D(img**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img * img2, -1, window)[5:-5, 5:-5] - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


@METRIC_REGISTRY.register(name="calculate_ssim")
def calculate_ssim(
    img: np.ndarray,
    img2: np.ndarray,
    crop_border: int = 0,
    test_y_channel: bool = False,
    **kwargs,
) -> float:
    assert img.shape == img2.shape, f"Image shapes differ: {img.shape} vs {img2.shape}"
    a = _prepare(img, crop_border, test_y_channel)
    b = _prepare(img2, crop_border, test_y_channel)
    ssims = [_ssim_channel(a[..., i], b[..., i]) for i in range(a.shape[2])]
    return float(np.mean(ssims))


# ------------------------- JAX (on-device) variants -------------------------


def calculate_psnr_jax(img, img2, crop_border: int = 0, test_y_channel: bool = False):
    """Batched NHWC [0,1] PSNR on device (used for fast in-training val)."""
    import jax.numpy as jnp

    from trainner_redux_tpu.utils.color_util import rgb2ycbcr

    a, b = jnp.asarray(img, jnp.float32), jnp.asarray(img2, jnp.float32)
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border, :]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        a = rgb2ycbcr(a, y_only=True)
        b = rgb2ycbcr(b, y_only=True)
    mse = jnp.mean((a * 255.0 - b * 255.0) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(255.0**2 / jnp.maximum(mse, 1e-12))


def calculate_ssim_jax(img, img2, crop_border: int = 0, test_y_channel: bool = False):
    """Batched NHWC [0,1] SSIM on device, cv2-window convention."""
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.utils.color_util import rgb2ycbcr

    a, b = jnp.asarray(img, jnp.float32), jnp.asarray(img2, jnp.float32)
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border, :]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border, :]
    if test_y_channel:
        a = rgb2ycbcr(a, y_only=True)
        b = rgb2ycbcr(b, y_only=True)
    a, b = a * 255.0, b * 255.0

    # separable band-matrix matmuls, not a depthwise grouped conv: C=3
    # depthwise convs are pathological on TPU (see losses/mssim_loss._filt)
    from trainner_redux_tpu.losses.mssim_loss import _filt as _sep_filt

    win = jnp.zeros((11,))  # only its length is read; sigma passed below

    def filt(x):
        return _sep_filt(x, win, sigma=1.5)

    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    mu1, mu2 = filt(a), filt(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = filt(a * a) - mu1_sq
    sigma2_sq = filt(b * b) - mu2_sq
    sigma12 = filt(a * b) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean(axis=(1, 2, 3))
