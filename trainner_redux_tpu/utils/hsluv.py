"""HSLuv color space (vectorized JAX port of the hsluv reference algorithm).

Parity: /root/reference/traiNNer/utils/hsluv.py (itself a port of
hsluv-python). HSLuv = CIELCh(uv) with saturation normalized by the maximum
in-gamut chroma for the given hue/lightness, giving perceptually uniform
H in [0,360), S in [0,100], L in [0,100].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# sRGB -> XYZ (D65) rows (hsluv reference constants)
_M = np.array(
    [
        [3.240969941904521, -1.537383177570093, -0.498610760293],
        [-0.96924363628087, 1.87596750150772, 0.041555057407175],
        [0.055630079696993, -0.20397695888897, 1.056971514242878],
    ],
    dtype=np.float64,
)
_KAPPA = 903.2962962
_EPSILON = 0.0088564516
_REF_U = 0.19783000664283
_REF_V = 0.46831999493879


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] sRGB [0,1] -> XYZ, hsluv convention (inverse of _M)."""
    lin = _srgb_to_linear(rgb)
    m_inv = jnp.asarray(np.linalg.inv(_M).T, dtype=rgb.dtype)
    return lin @ m_inv


def _y_to_l(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(y <= _EPSILON, y * _KAPPA, 116.0 * jnp.cbrt(jnp.maximum(y, 1e-12)) - 16.0)


def rgb_to_lch(rgb: jnp.ndarray) -> jnp.ndarray:
    xyz = rgb_to_xyz(rgb)
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    l_val = _y_to_l(y)
    divider = x + 15.0 * y + 3.0 * z
    var_u = jnp.where(divider > 1e-12, 4.0 * x / divider, _REF_U)
    var_v = jnp.where(divider > 1e-12, 9.0 * y / divider, _REF_V)
    u = 13.0 * l_val * (var_u - _REF_U)
    v = 13.0 * l_val * (var_v - _REF_V)
    c = jnp.hypot(u, v)
    h = jnp.degrees(jnp.arctan2(v, u))
    h = jnp.where(h < 0, h + 360.0, h)
    h = jnp.where(c < 1e-8, 0.0, h)
    return jnp.stack([l_val, c, h], axis=-1)


def _max_chroma_for_lh(l_val: jnp.ndarray, h_deg: jnp.ndarray) -> jnp.ndarray:
    """Minimum positive ray length to the 6 sRGB gamut boundary lines."""
    hrad = jnp.deg2rad(h_deg)
    sin_h, cos_h = jnp.sin(hrad), jnp.cos(hrad)
    sub1 = ((l_val + 16.0) ** 3) / 1560896.0
    sub2 = jnp.where(sub1 > _EPSILON, sub1, l_val / _KAPPA)

    lengths = []
    for c in range(3):
        m1, m2, m3 = _M[c]
        for t in (0.0, 1.0):
            top1 = (284517.0 * m1 - 94839.0 * m3) * sub2
            top2 = (
                (838422.0 * m3 + 769860.0 * m2 + 731718.0 * m1) * l_val * sub2
                - 769860.0 * t * l_val
            )
            bottom = (632260.0 * m3 - 126452.0 * m2) * sub2 + 126452.0 * t
            slope = top1 / bottom
            intercept = top2 / bottom
            denom = sin_h - slope * cos_h
            length = intercept / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            lengths.append(jnp.where(length >= 0, length, jnp.inf))
    return jnp.min(jnp.stack(lengths, axis=0), axis=0)


def rgb_to_hsluv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] sRGB [0,1] -> HSLuv (H 0-360, S 0-100, L 0-100)."""
    lch = rgb_to_lch(rgb)
    l_val, c, h = lch[..., 0], lch[..., 1], lch[..., 2]
    max_chroma = _max_chroma_for_lh(jnp.clip(l_val, 1e-4, 100.0 - 1e-4), h)
    s = jnp.where(
        (l_val > 100.0 - 1e-4) | (l_val < 1e-4),
        0.0,
        c / jnp.maximum(max_chroma, 1e-8) * 100.0,
    )
    return jnp.stack([h, jnp.clip(s, 0.0, 100.0), jnp.clip(l_val, 0.0, 100.0)], axis=-1)
