"""MS-SSIM + Gaussian-weighted L1 mix loss.

Parity: /root/reference/traiNNer/losses/ms_ssim_l1_loss.py:10 (itself the
public MS_SSIM_L1_LOSS): multi-sigma Gaussian pyramids via grouped convs,
loss = alpha * (1 - lM * prod(cs)) + (1 - alpha) * gaussian-blurred L1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


@lru_cache(maxsize=4)
def _g_masks(sigmas: tuple[float, ...], channels: int = 3) -> np.ndarray:
    """(filter, filter, 1, channels * len(sigmas)) depthwise kernels, ordered
    sigma-major like the reference (r0,g0,b0, r1,g1,b1, ...)."""
    filter_size = int(4 * sigmas[-1] + 1)
    coords = np.arange(filter_size, dtype=np.float64) - filter_size // 2
    masks = []
    for sigma in sigmas:
        g = np.exp(-(coords**2) / (2 * sigma**2))
        g /= g.sum()
        g2 = np.outer(g, g)
        for _ in range(channels):
            masks.append(g2)
    return np.stack(masks, axis=-1)[:, :, None, :].astype(np.float32)


@lru_cache(maxsize=32)
def _band_same(sigma: float, n: int, filter_size: int, pad: int) -> np.ndarray:
    """(n, n) banded matrix for zero-pad-`pad` + VALID 1D Gaussian blur:
    out[i] = sum_k g[k] * x[i + k - pad], i.e. B[i+k-pad, i] = g[k]."""
    coords = np.arange(filter_size, dtype=np.float64) - filter_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    out = np.zeros((n, n), np.float32)
    for i in range(n):
        for k in range(filter_size):
            j = i + k - pad
            if 0 <= j < n:
                out[j, i] = g[k]
    return out


@LOSS_REGISTRY.register(name="msssiml1loss")
class MSSSIML1Loss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        gaussian_sigmas: list[float] | None = None,
        data_range: float = 1.0,
        k: tuple[float, float] = (0.01, 0.03),
        alpha: float = 0.1,
        cuda_dev: int = 0,  # accepted for config compatibility
    ) -> None:
        self.loss_weight = loss_weight
        self.sigmas = tuple(gaussian_sigmas or [0.5, 1.0, 2.0, 4.0, 8.0])
        self.DR = data_range
        self.C1 = (k[0] * data_range) ** 2
        self.C2 = (k[1] * data_range) ** 2
        self.alpha = alpha
        self.pad = int(2 * self.sigmas[-1])

    def _conv(self, x: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
        """Multi-sigma Gaussian pyramid as separable band-matrix matmuls.

        The reference's tiled depthwise grouped conv (feature_group_count =
        C * levels) is pathological on TPU — small-channel depthwise convs
        and especially their gradients fall off XLA's fast path (the sibling
        mssim_loss measured 63.6 ms fwd+bwd for 5 such convs at b8 256px).
        Each sigma's window is separable and static, so each level is two
        dense (N, N) banded matmuls on the MXU. Output channel order stays
        sigma-major (r0,g0,b0, r1,...), matching `masks`."""
        del masks
        fs = int(4 * self.sigmas[-1] + 1)
        outs = []
        for sigma in self.sigmas:
            bh = jnp.asarray(_band_same(sigma, x.shape[1], fs, self.pad))
            bw = jnp.asarray(_band_same(sigma, x.shape[2], fs, self.pad))
            t = jnp.einsum("nhwc,hm->nmwc", x, bh)
            outs.append(jnp.einsum("nmwc,wk->nmkc", t, bw))
        return jnp.concatenate(outs, axis=-1)

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        c = x.shape[-1]
        masks = jnp.asarray(_g_masks(self.sigmas, c))

        mux = self._conv(x, masks)
        muy = self._conv(y, masks)
        mux2, muy2, muxy = mux**2, muy**2, mux * muy
        sigmax2 = self._conv(x * x, masks) - mux2
        sigmay2 = self._conv(y * y, masks) - muy2
        sigmaxy = self._conv(x * y, masks) - muxy

        lmap = (2 * muxy + self.C1) / (mux2 + muy2 + self.C1)
        cs = (2 * sigmaxy + self.C2) / (sigmax2 + sigmay2 + self.C2)

        # luminance from the largest sigma (last c channels), product over cs
        lM = jnp.prod(lmap[..., -c:], axis=-1)
        PIcs = jnp.prod(cs, axis=-1)
        loss_ms_ssim = 1.0 - lM * PIcs  # (N,H,W)

        loss_l1 = jnp.abs(x - y)
        # gaussian-weighted l1 with the largest-sigma masks
        gaussian_l1 = self._conv(loss_l1, masks)[..., -c:].mean(axis=-1)

        loss_mix = self.alpha * loss_ms_ssim + (1 - self.alpha) * gaussian_l1 / self.DR
        return self.loss_weight * loss_mix.mean()
