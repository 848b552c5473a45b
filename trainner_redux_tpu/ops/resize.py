"""Image resampling as matmuls (TPU-idiomatic) + Gaussian blur.

Replaces torch `F.interpolate` / the reference's custom lanczos resampler
(/root/reference/traiNNer/data/degradations.py:961-1060, resize_pt) with a
separable weight-matrix formulation: for static in/out sizes the resampling
weights are computed on the host at trace time, and the resize itself is two
einsum contractions — exactly the shape the MXU wants, fused by XLA with
surrounding elementwise work. Supports the reference's mode set:
bilinear / bicubic (optionally antialiased), nearest-exact, area, lanczos.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

ANTIALIAS_MODES = {"bilinear", "bicubic"}


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return np.where(
        ax <= 1,
        (a + 2) * ax3 - (a + 3) * ax2 + 1,
        np.where(ax < 2, a * ax3 - 5 * a * ax2 + 8 * a * ax - 4 * a, 0.0),
    )


def _triangle_kernel(x: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(x), 0.0, None)


def _lanczos_kernel(x: np.ndarray, a: int = 3) -> np.ndarray:
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(np.abs(x) < a, out, 0.0)


_KERNELS = {
    "bicubic": (_cubic_kernel, 2.0),
    "bilinear": (_triangle_kernel, 1.0),
    "lanczos": (lambda x: _lanczos_kernel(x, 3), 3.0),
}


@lru_cache(maxsize=256)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, antialias: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic resampling matrix."""
    if mode == "nearest-exact":
        w = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        src = np.minimum((np.arange(out_size) + 0.5) * scale, in_size - 0.5).astype(int)
        w[np.arange(out_size), src] = 1.0
        return w
    if mode == "nearest":
        w = np.zeros((out_size, in_size), dtype=np.float32)
        scale = in_size / out_size
        src = np.minimum(np.floor(np.arange(out_size) * scale), in_size - 1).astype(int)
        w[np.arange(out_size), src] = 1.0
        return w
    if mode == "area":
        # overlap of output cell [i/s, (i+1)/s) with each input cell
        w = np.zeros((out_size, in_size), dtype=np.float64)
        scale = in_size / out_size
        for i in range(out_size):
            lo, hi = i * scale, (i + 1) * scale
            j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
            for j in range(j0, min(j1, in_size)):
                w[i, j] = min(hi, j + 1) - max(lo, j)
        w /= w.sum(axis=1, keepdims=True)
        return w.astype(np.float32)

    kernel, radius = _KERNELS[mode]
    scale = out_size / in_size
    # antialias widens the kernel support when downscaling
    filter_scale = max(1.0, 1.0 / scale) if antialias else 1.0
    support = radius * filter_scale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) / scale - 0.5
        j0 = int(np.floor(center - support)) + 1
        j1 = int(np.floor(center + support)) + 1
        taps = np.arange(j0, j1 + 1)
        vals = kernel((taps - center) / filter_scale)
        taps_c = np.clip(taps, 0, in_size - 1)
        for t, v in zip(taps_c, vals):
            w[i, t] += v
    w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    mode: str = "bicubic",
    antialias: bool | None = None,
) -> jnp.ndarray:
    """Resize NHWC images to (out_h, out_w). Static sizes only (jit-friendly)."""
    n, h, w, c = x.shape
    oh, ow = int(size[0]), int(size[1])
    if antialias is None:
        antialias = mode in ANTIALIAS_MODES
    if mode == "lanczos":
        # reference semantics (degradations.py:983-1002): lanczos3 low-pass
        # only in the downscaled dims, then bicubic (no antialias) resample.
        if oh < h:
            x = jnp.einsum(
                "oh,nhwc->nowc", jnp.asarray(_lowpass_matrix(h, oh)), x,
                precision="highest",
            )
        if ow < w:
            x = jnp.einsum(
                "ow,nhwc->nhoc",
                jnp.asarray(_lowpass_matrix(w, ow)),
                x,
                precision="highest",
            )
        return resize(x, (oh, ow), mode="bicubic", antialias=False).clip(0.0, 1.0)

    # precision=highest: these matmuls are tiny vs the conv workload, and the
    # TPU MXU's default bf16 accumulation costs ~3e-3 abs error — visible in
    # checkpoint-parity and metric math
    if oh != h:
        mh = jnp.asarray(_resize_matrix(h, oh, mode, antialias), dtype=x.dtype)
        x = jnp.einsum("oh,nhwc->nowc", mh, x, precision="highest")
    if ow != w:
        mw = jnp.asarray(_resize_matrix(w, ow, mode, antialias), dtype=x.dtype)
        x = jnp.einsum("ow,nhwc->nhoc", mw, x, precision="highest")
    return x


def resize_scale(
    x: jnp.ndarray, scale: float, mode: str = "bicubic", antialias: bool | None = None
) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    return resize(x, (round(h * scale), round(w * scale)), mode, antialias)


def resize_bicubic(x: jnp.ndarray, size: tuple[int, int], antialias: bool = True) -> jnp.ndarray:
    return resize(x, size, mode="bicubic", antialias=antialias)


@lru_cache(maxsize=64)
def _lowpass_matrix(in_size: int, out_size: int, a: int = 3) -> np.ndarray:
    """Same-size lanczos low-pass operator with reflect padding (as a matrix),
    mirroring the reference's pre-filter conv (degradations.py:983-996)."""
    ratio = out_size / in_size
    # ramp of taps (reference _ramp): symmetric multiples of ratio
    n = math.ceil(a / ratio + 1)
    ramp = np.arange(n) * ratio
    taps_x = np.concatenate([-ramp[1:][::-1], ramp])[1:-1]
    k = _lanczos_kernel(taps_x, a)
    k = k / k.sum()
    pad = (len(k) - 1) // 2
    m = np.zeros((in_size, in_size), dtype=np.float64)
    for i in range(in_size):
        for dj, kv in enumerate(k):
            j = i - pad + dj
            # reflect (without repeating the edge: cv2 BORDER_REFLECT_101)
            if j < 0:
                j = -j
            if j >= in_size:
                j = 2 * in_size - 2 - j
            j = int(np.clip(j, 0, in_size - 1))
            m[i, j] += kv
    return m.astype(np.float32)


@lru_cache(maxsize=32)
def _gaussian_kernel1d(kernel_size: int, sigma: float) -> np.ndarray:
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int = 5, sigma: float = 0.5) -> jnp.ndarray:
    """Separable Gaussian blur on NHWC with reflect padding."""
    import jax

    k = jnp.asarray(_gaussian_kernel1d(kernel_size, sigma), dtype=x.dtype)
    pad = (kernel_size - 1) // 2
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return x
