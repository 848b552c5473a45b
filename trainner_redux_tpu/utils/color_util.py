"""Color-space conversions (numpy + JAX), BT.601 constants.

Parity targets: /root/reference/traiNNer/utils/color_util.py:8-434. The
YCbCr conversions use ITU-R BT.601 studio-swing constants (the same ones used
by cv2/BasicSR), since published PSNR-Y/SSIM-Y numbers depend on them exactly.

All functions accept float images in [0, 1]; `*_np` operate on HWC numpy
arrays, the jnp versions on [..., H, W, C] or NCHW jax arrays as documented.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# BT.601 full->studio swing RGB->YCbCr (inputs in [0,1], outputs in [0,255]
# before /255). Row order: Y, Cb, Cr; columns R, G, B.
_RGB2YCBCR_MAT = np.array(
    [
        [65.481, -37.797, 112.0],
        [128.553, -74.203, -93.786],
        [24.966, 112.0, -18.214],
    ],
    dtype=np.float64,
)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)


def rgb2ycbcr_np(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    """HWC RGB [0,1] -> YCbCr [0,1] (studio swing). y_only returns HW."""
    img = img.astype(np.float64)
    if y_only:
        out = img @ _RGB2YCBCR_MAT[:, 0] + _YCBCR_OFFSET[0]
    else:
        out = img @ _RGB2YCBCR_MAT + _YCBCR_OFFSET
    return (out / 255.0).astype(np.float32)


def bgr2ycbcr_np(img: np.ndarray, y_only: bool = False) -> np.ndarray:
    return rgb2ycbcr_np(img[..., ::-1], y_only=y_only)


def ycbcr2rgb_np(img: np.ndarray) -> np.ndarray:
    """HWC YCbCr [0,1] (studio swing) -> RGB [0,1]."""
    img = img.astype(np.float64) * 255.0
    # forward maps rgb in [0,1] to ycbcr in [0,255]; inverting lands back in [0,1]
    out = (img - _YCBCR_OFFSET) @ np.linalg.inv(_RGB2YCBCR_MAT)
    return out.astype(np.float32)


def rgb2ycbcr(img: jnp.ndarray, y_only: bool = False) -> jnp.ndarray:
    """[..., C=3] RGB [0,1] -> YCbCr [0,1]; y_only keeps a trailing dim of 1."""
    mat = jnp.asarray(_RGB2YCBCR_MAT, dtype=img.dtype)
    off = jnp.asarray(_YCBCR_OFFSET, dtype=img.dtype)
    if y_only:
        out = img @ mat[:, :1] + off[0]
    else:
        out = img @ mat + off
    return out / 255.0


def ycbcr2rgb(img: jnp.ndarray) -> jnp.ndarray:
    inv = jnp.asarray(np.linalg.inv(_RGB2YCBCR_MAT), dtype=img.dtype)
    off = jnp.asarray(_YCBCR_OFFSET, dtype=img.dtype)
    return (img * 255.0 - off) @ inv


def rgb2ycbcr_nchw(img: jnp.ndarray, y_only: bool = False) -> jnp.ndarray:
    """NCHW RGB [0,1] -> NCHW YCbCr (or N1HW luma)."""
    out = rgb2ycbcr(jnp.moveaxis(img, -3, -1), y_only=y_only)
    return jnp.moveaxis(out, -1, -3)


def ycbcr2rgb_nchw(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(ycbcr2rgb(jnp.moveaxis(img, -3, -1)), -1, -3)


def rgb2luma(img: jnp.ndarray) -> jnp.ndarray:
    """NCHW RGB -> N1HW luma (BT.601 Y), matching rgb_to_luma in the reference."""
    return rgb2ycbcr_nchw(img, y_only=True)


# ----------------------------- linear RGB ---------------------------------


def srgb_to_linear(img: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(img: jnp.ndarray) -> jnp.ndarray:
    img = jnp.clip(img, 0.0, 1.0)
    return jnp.where(img <= 0.0031308, img * 12.92, 1.055 * img ** (1 / 2.4) - 0.055)


# ------------------------------- CIELAB ------------------------------------

_SRGB2XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    dtype=np.float64,
)
_D65 = np.array([0.95047, 1.0, 1.08883], dtype=np.float64)


def rgb2xyz(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] sRGB [0,1] -> XYZ (D65)."""
    lin = srgb_to_linear(img)
    return lin @ jnp.asarray(_SRGB2XYZ.T, dtype=img.dtype)


def xyz2lab(xyz: jnp.ndarray, eps: float = 216 / 24389, kappa: float = 24389 / 27) -> jnp.ndarray:
    xr = xyz / jnp.asarray(_D65, dtype=xyz.dtype)
    f = jnp.where(xr > eps, jnp.cbrt(jnp.maximum(xr, 1e-12)), (kappa * xr + 16.0) / 116.0)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    L = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def rgb2lab(img: jnp.ndarray) -> jnp.ndarray:
    return xyz2lab(rgb2xyz(img))
