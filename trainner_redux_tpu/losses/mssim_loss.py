"""SSIM / MS-SSIM losses (JAX, NHWC).

Parity: /root/reference/traiNNer/losses/mssim_loss.py (ssim/ms_ssim math,
SSIMLoss :383, MSSIMLoss :489): 11x11 Gaussian window sigma 1.5, optional
matlab-style downsampling, Y-channel (YIQ luma) preprocessing. Note: the
reference's SSIMLoss.forward returns the raw similarity score (a latent
defect — higher is better); here SSIMLoss returns loss_weight * (1 - score)
so it is a proper minimization objective, matching MSSIMLoss's convention.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.losses.loss_util import avg_pool
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@lru_cache(maxsize=8)
def _gauss_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def to_y_channel(x: jnp.ndarray, color_space: str = "yiq") -> jnp.ndarray:
    """NHWC RGB [0,1] -> N,H,W,1 luma. 'yiq' uses full-range BT.601 luma."""
    if color_space == "yiq":
        coef = jnp.asarray([0.299, 0.587, 0.114], dtype=x.dtype)
        return (x * coef).sum(axis=-1, keepdims=True)
    from trainner_redux_tpu.utils.color_util import rgb2ycbcr

    return rgb2ycbcr(x, y_only=True)


def preprocess_rgb(x: jnp.ndarray, test_y_channel: bool, color_space: str = "yiq") -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    if test_y_channel and x.shape[-1] == 3:
        x = to_y_channel(x, color_space)
    return x


@lru_cache(maxsize=32)
def _band_matrix(size: int, sigma: float, n: int) -> np.ndarray:
    """(n, n-size+1) banded matrix B with B[i+k, i] = g[k]: x @ B is a
    VALID 1D Gaussian filter along that axis."""
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    out = np.zeros((n, n - size + 1), np.float32)
    for i in range(n - size + 1):
        out[i : i + size, i] = g
    return out


def _filt(x: jnp.ndarray, win: jnp.ndarray, sigma: float = 1.5) -> jnp.ndarray:
    """VALID Gaussian blur as two separable band-matrix MATMULS.

    The obvious depthwise grouped conv (feature_group_count=C with C=3) is
    pathological on TPU — its gradient falls off XLA's fast conv path, and
    a measured mssimloss fwd+bwd at (8,256,256,3) cost 63.6 ms with a 219 s
    compile (docs/perf/profile_gan_span_s.json). The Gaussian window is
    separable and STATIC, so each axis is a dense (N, N-10) banded matmul
    that lands on the MXU with well-formed gradients (the transpose is just
    the transposed band matrix)."""
    size = int(win.shape[0]) if win.ndim == 1 else int(win.shape[-1])
    h, w = x.shape[1], x.shape[2]
    bh = jnp.asarray(_band_matrix(size, sigma, h))
    bw = jnp.asarray(_band_matrix(size, sigma, w))
    t = jnp.einsum("nhwc,hm->nmwc", x, bh)
    return jnp.einsum("nmwc,wk->nmkc", t, bw)


def ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    downsample: bool = False,
    get_cs: bool = False,
):
    """Per-image SSIM over NHWC inputs; window 11, sigma 1.5."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    f = max(1, round(min(x.shape[1], x.shape[2]) / 256))
    if downsample and f > 1:
        x = avg_pool(x, f)
        y = avg_pool(y, f)

    win = jnp.asarray(_gauss_window())
    mu1 = _filt(x, win)
    mu2 = _filt(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _filt(x * x, win) - mu1_sq
    sigma2_sq = _filt(y * y, win) - mu2_sq
    sigma12 = _filt(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    ssim_val = ssim_map.mean(axis=(1, 2, 3))
    if get_cs:
        return ssim_val, cs_map.mean(axis=(1, 2, 3))
    return ssim_val


def ms_ssim(
    x: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 1.0,
    downsample: bool = False,
    is_prod: bool = True,
) -> jnp.ndarray:
    weights = jnp.asarray(_MS_WEIGHTS)
    levels = len(_MS_WEIGHTS)
    mcs = []
    ssim_val = None
    for _ in range(levels):
        ssim_val, cs = ssim(x, y, data_range=data_range, downsample=downsample, get_cs=True)
        mcs.append(cs)
        # pad to even then 2x avg pool (torch: avg_pool2d(k=2, padding=h%2))
        ph, pw = x.shape[1] % 2, x.shape[2] % 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
            y = jnp.pad(y, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        x = avg_pool(x, 2)
        y = avg_pool(y, 2)
    mcs_arr = jnp.stack(mcs, axis=0)
    if is_prod:
        return jnp.prod(
            jnp.clip(mcs_arr[:-1], 1e-6, None) ** weights[:-1, None], axis=0
        ) * jnp.clip(ssim_val, 1e-6, None) ** weights[-1]
    w = weights / weights.sum()
    return jnp.sum(mcs_arr[:-1] * w[:-1, None], axis=0) + ssim_val * w[-1]


@LOSS_REGISTRY.register(name="ssimloss")
class SSIMLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        channels: int = 3,
        downsample: bool = False,
        test_y_channel: bool = True,
        color_space: str = "yiq",
        crop_border: float = 0.0,
    ) -> None:
        self.loss_weight = loss_weight
        self.downsample = downsample
        self.test_y_channel = test_y_channel
        self.color_space = color_space
        self.crop_border = int(crop_border)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if self.crop_border:
            cb = self.crop_border
            x = x[:, cb:-cb, cb:-cb, :]
            y = y[:, cb:-cb, cb:-cb, :]
        x = preprocess_rgb(x, self.test_y_channel, self.color_space)
        y = preprocess_rgb(y, self.test_y_channel, self.color_space)
        score = ssim(x, y, downsample=self.downsample)
        return self.loss_weight * (1.0 - score.mean())


@LOSS_REGISTRY.register(name="mssimloss")
class MSSIMLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        channels: int = 3,
        downsample: bool = False,
        test_y_channel: bool = True,
        is_prod: bool = True,
        color_space: str = "yiq",
        include_luminance: bool = False,
    ) -> None:
        self.loss_weight = loss_weight
        self.downsample = downsample
        self.test_y_channel = test_y_channel
        self.is_prod = is_prod
        self.color_space = color_space

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        x = preprocess_rgb(x, self.test_y_channel, self.color_space)
        y = preprocess_rgb(y, self.test_y_channel, self.color_space)
        score = ms_ssim(x, y, downsample=self.downsample, is_prod=self.is_prod)
        return self.loss_weight * (1.0 - jnp.clip(score.mean(), 0.0, 1.0))
