"""Structural/frequency loss long tail (JAX, NHWC).

One module covering the reference's smaller loss files:
- NCCLoss (ncc_loss.py:8), CosimLoss (cosim_loss.py:8)
- HFENLoss (hfen_loss.py:32), GradientVarianceLoss (gradient_variance_loss.py:12)
- FFLoss focal-frequency (focal_frequency_loss.py:9)
- LaplacianPyramidLoss (laplacian_loss.py:10)
- AdaptiveBlockTVLoss (adaptive_block_tv_loss.py:12)
- CheckerboardLoss (checkerboard_loss.py:45)
- CHCLoss (chc_loss.py:10), ConsistencyLoss (consistency_loss.py:12)
- BCEWithLogitsDiceLoss (bcewithlogitsdice_loss.py:8)
- FLIPLoss (flip_loss.py:64, core NVIDIA-FLIP formulation)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.archs.arch_util import pixel_unshuffle
from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY

_DN = ("NHWC", "HWIO", "NHWC")


def _gray(x: jnp.ndarray) -> jnp.ndarray:
    coef = jnp.asarray([0.2989, 0.5870, 0.1140], x.dtype)
    return (x * coef).sum(axis=-1, keepdims=True)


def _depthwise(x: jnp.ndarray, k: np.ndarray, pad: int) -> jnp.ndarray:
    c = x.shape[-1]
    kern = jnp.tile(jnp.asarray(k, x.dtype)[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=_DN,
        feature_group_count=c,
    )


@LOSS_REGISTRY.register(name="nccloss")
class NCCLoss:
    """1 - normalized cross-correlation mapped to [0,1]."""

    def __init__(self, loss_weight: float = 1.0) -> None:
        self.loss_weight = loss_weight

    def __call__(self, sr: jnp.ndarray, hr: jnp.ndarray) -> jnp.ndarray:
        sr = sr.astype(jnp.float32)
        hr = hr.astype(jnp.float32)
        c = sr.shape[-1]
        a = jnp.moveaxis(sr, -1, 0).reshape(c, -1)
        b = jnp.moveaxis(hr, -1, 0).reshape(c, -1)
        a = a - a.mean(axis=1, keepdims=True)
        b = b - b.mean(axis=1, keepdims=True)
        cc = (a * b).sum(1) / jnp.sqrt((a**2).sum(1) * (b**2).sum(1) + 1e-12)
        cc = cc.mean()
        return self.loss_weight * (1.0 - (cc + 1.0) * 0.5)


@LOSS_REGISTRY.register(name="cosimloss")
class CosimLoss:
    """Cosine-similarity penalty over channel vectors."""

    def __init__(self, loss_weight: float = 1.0, cosim_lambda: float = 5) -> None:
        self.loss_weight = loss_weight
        self.cosim_lambda = cosim_lambda

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        x = jnp.clip(x.astype(jnp.float32), 1e-12, 1.0)
        y = jnp.clip(y.astype(jnp.float32), 1e-12, 1.0)
        sim = (x * y).sum(-1) / jnp.maximum(
            jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(y, axis=-1), 1e-20
        )
        return self.loss_weight * self.cosim_lambda * (1.0 - sim.mean())


@lru_cache(maxsize=8)
def _log_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    k = kernel_size // 2
    xs = np.arange(-k, k + 1, dtype=np.float64)
    xx, yy = np.meshgrid(xs, xs)
    r2 = xx**2 + yy**2
    s2 = sigma * sigma
    kern = (r2 - 2 * s2) / (s2**2) * np.exp(-r2 / (2 * s2))
    kern -= kern.mean()
    return kern.astype(np.float32)


@LOSS_REGISTRY.register(name="hfenloss")
class HFENLoss:
    """High-frequency error norm with a Laplacian-of-Gaussian filter."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        kernel_size: int = 7,
        sigma: float = 1.0,
        reduction: str = "mean",
        eps: float = 1e-6,
        criterion: str = "charbonnier",
        **_: dict,
    ) -> None:
        self.loss_weight = loss_weight
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.criterion = get_criterion(criterion)
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        k = _log_kernel(self.kernel_size, self.sigma)
        pad = self.kernel_size // 2
        hf_pred = _depthwise(pred.astype(jnp.float32), k, pad)
        hf_target = _depthwise(target.astype(jnp.float32), k, pad)
        return self.loss_weight * self.criterion(hf_pred, hf_target)


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)


@LOSS_REGISTRY.register(name="gradientvarianceloss")
class GradientVarianceLoss:
    """Variance of Sobel gradient maps over non-overlapping patches."""

    def __init__(
        self, loss_weight: float = 1.0, patch_size: int = 16, criterion: str = "charbonnier"
    ) -> None:
        self.loss_weight = loss_weight
        self.patch_size = patch_size
        self.criterion = get_criterion(criterion)

    def _patch_var(self, g: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = g.shape
        p = self.patch_size
        g = g[:, : h - h % p, : w - w % p, 0]
        g = g.reshape(n, g.shape[1] // p, p, g.shape[2] // p, p)
        g = g.transpose(0, 1, 3, 2, 4).reshape(n, -1, p * p)
        return jnp.var(g, axis=-1)

    def __call__(self, output: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        go = _gray(output.astype(jnp.float32))
        gt = _gray(target.astype(jnp.float32))
        vx_o = self._patch_var(_depthwise(go, _SOBEL_X, 1))
        vy_o = self._patch_var(_depthwise(go, _SOBEL_Y, 1))
        vx_t = self._patch_var(_depthwise(gt, _SOBEL_X, 1))
        vy_t = self._patch_var(_depthwise(gt, _SOBEL_Y, 1))
        return self.loss_weight * (self.criterion(vx_o, vx_t) + self.criterion(vy_o, vy_t))


@LOSS_REGISTRY.register(name="ffloss")
class FFLoss:
    """Focal frequency loss (ICCV 2021): spectrum distance weighted by its
    own magnitude^alpha."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        alpha: float = 1.0,
        patch_factor: int = 1,
        ave_spectrum: bool = True,
        log_matrix: bool = False,
        batch_matrix: bool = False,
    ) -> None:
        self.loss_weight = loss_weight
        self.alpha = alpha
        self.patch_factor = patch_factor
        self.ave_spectrum = ave_spectrum
        self.log_matrix = log_matrix
        self.batch_matrix = batch_matrix

    def _freq(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        pf = self.patch_factor
        x = x.reshape(n, pf, h // pf, pf, w // pf, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(n, pf * pf, h // pf, w // pf, c)
        f = jnp.fft.fft2(x.astype(jnp.float32), axes=(2, 3), norm="ortho")
        return jnp.stack([f.real, f.imag], axis=-1)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        rf = self._freq(pred)
        tf = self._freq(target)
        if self.ave_spectrum:
            rf = rf.mean(axis=0, keepdims=True)
            tf = tf.mean(axis=0, keepdims=True)
        dist2 = ((rf - tf) ** 2).sum(-1)
        weight = jax.lax.stop_gradient(jnp.sqrt(dist2) ** self.alpha)
        if self.log_matrix:
            weight = jnp.log(weight + 1.0)
        norm = weight.max() if self.batch_matrix else jnp.max(
            weight, axis=tuple(range(1, weight.ndim)), keepdims=True
        )
        weight = jnp.nan_to_num(weight / jnp.maximum(norm, 1e-12), nan=0.0)
        weight = jnp.clip(weight, 0.0, 1.0)
        return self.loss_weight * (dist2 * weight).mean()


@LOSS_REGISTRY.register(name="laplacianpyramidloss")
class LaplacianPyramidLoss:
    """Multi-level Laplacian pyramid L1 (reference laplacian_loss.py:10)."""

    def __init__(
        self, loss_weight: float = 1.0, max_levels: int = 3, criterion: str = "l1", **_: dict
    ) -> None:
        self.loss_weight = loss_weight
        self.max_levels = max_levels
        self.criterion = get_criterion(criterion)

    @staticmethod
    def _gauss_down(x: jnp.ndarray) -> jnp.ndarray:
        k1 = np.array([1.0, 4.0, 6.0, 4.0, 1.0])
        k = np.outer(k1, k1)
        k /= k.sum()
        blurred = _depthwise(x, k.astype(np.float32), 2)
        return blurred[:, ::2, ::2, :]

    def _pyramid(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        levels = []
        cur = x
        for _ in range(self.max_levels):
            down = self._gauss_down(cur)
            up = jnp.repeat(jnp.repeat(down, 2, axis=1), 2, axis=2)
            up = up[:, : cur.shape[1], : cur.shape[2], :]
            levels.append(cur - up)
            cur = down
        levels.append(cur)
        return levels

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        total = jnp.zeros((), jnp.float32)
        for a, b in zip(
            self._pyramid(pred.astype(jnp.float32)),
            self._pyramid(target.astype(jnp.float32)),
            strict=True,
        ):
            total = total + self.criterion(a, b)
        return self.loss_weight * total


@LOSS_REGISTRY.register(name="adaptiveblocktvloss")
class AdaptiveBlockTVLoss:
    """TV on block boundaries, weighted down where the target has edges
    (suppresses blocking artifacts without blurring real detail)."""

    def __init__(
        self, loss_weight: float = 1.0, block_size: int = 8, edge_threshold: float = 0.1
    ) -> None:
        self.loss_weight = loss_weight
        self.block_size = block_size
        self.edge_threshold = edge_threshold

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        p = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        bs = self.block_size
        h, w = p.shape[1], p.shape[2]
        # vertical boundaries (columns at multiples of bs)
        cols = jnp.arange(bs, w, bs)
        rows = jnp.arange(bs, h, bs)
        dv_p = jnp.abs(p[:, :, cols, :] - p[:, :, cols - 1, :])
        dv_t = jnp.abs(t[:, :, cols, :] - t[:, :, cols - 1, :])
        dh_p = jnp.abs(p[:, rows, :, :] - p[:, rows - 1, :, :])
        dh_t = jnp.abs(t[:, rows, :, :] - t[:, rows - 1, :, :])
        wv = jnp.where(dv_t > self.edge_threshold, 0.0, 1.0)
        wh = jnp.where(dh_t > self.edge_threshold, 0.0, 1.0)
        return self.loss_weight * ((dv_p * wv).mean() + (dh_p * wh).mean())


@LOSS_REGISTRY.register(name="checkerboardloss")
class CheckerboardLoss:
    """Penalizes pixel-shuffle checkerboard artifacts: pairwise differences
    inside each scale x scale block must match the target's."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        scale: int = 4,
        criterion: str = "charbonnier",
        eps: float = 1e-12,
    ) -> None:
        self.loss_weight = loss_weight
        self.scale = scale
        self.criterion = get_criterion(criterion)

    def _pairdiffs(self, x: jnp.ndarray) -> jnp.ndarray:
        blocks = pixel_unshuffle(x, self.scale)  # (N, H/s, W/s, C*s*s)
        n, h, w, cs = blocks.shape
        s2 = self.scale * self.scale
        c = cs // s2
        b = blocks.reshape(n, h, w, c, s2)
        return b[..., :, None] - b[..., None, :]  # (N,h,w,c,s2,s2)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        h = pred.shape[1] - pred.shape[1] % self.scale
        w = pred.shape[2] - pred.shape[2] % self.scale
        dp = self._pairdiffs(pred[:, :h, :w].astype(jnp.float32))
        dt = self._pairdiffs(target[:, :h, :w].astype(jnp.float32))
        return self.loss_weight * self.criterion(dp, dt)


@LOSS_REGISTRY.register(name="chcloss")
class CHCLoss:
    """Clipped pseudo-Huber with cosine-similarity term."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        reduction: str = "mean",
        criterion: str = "huber",
        loss_lambda: float = 0.0,
        clip_min: float = 1.0 / 255.0,
        clip_max: float = 254.0 / 255.0,
    ) -> None:
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.criterion = criterion
        self.loss_lambda = loss_lambda
        self.clip_min = clip_min
        self.clip_max = clip_max

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray, **kwargs) -> jnp.ndarray:
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        sim = (pred * target).sum(-1) / jnp.maximum(
            jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1), 1e-20
        )
        cosine_term = (1.0 - sim).mean()
        if self.criterion == "l1":
            base = jnp.abs(pred - target)
        else:
            base = jnp.sqrt((pred - target) ** 2 + 1e-12)
        combined = jnp.clip(base + self.loss_lambda * cosine_term, self.clip_min, self.clip_max)
        if self.reduction == "sum":
            out = combined.sum()
        elif self.reduction == "none":
            out = combined
        else:
            out = combined.mean()
        return self.loss_weight * out


@LOSS_REGISTRY.register(name="consistencyloss")
class ConsistencyLoss:
    """Brightness/chroma consistency via Oklab chroma and CIE-L* on blurred
    images (reference consistency_loss.py:12)."""

    def __init__(
        self,
        loss_weight: float = 0.25,
        criterion: str = "chc",
        blur: bool = True,
        blur_kernel_size: int = 21,
        blur_sigma: float = 3.0,
        saturation: float = 1.0,
        brightness: float = 0.9,
        cosim: bool = True,
        cosim_weight: float = 0.5,
        chc_lambda: float = 0.012,
    ) -> None:
        self.loss_weight = loss_weight
        self.use_blur = blur
        self.blur_kernel_size = blur_kernel_size
        self.blur_sigma = blur_sigma
        self.saturation = saturation
        self.brightness = brightness
        self.use_cosim = cosim
        self.cosim_weight = cosim_weight
        if criterion == "chc":
            self.criterion = CHCLoss(1.0, "mean", "huber", chc_lambda)
        else:
            self.criterion = None
            self._crit = get_criterion("l1" if criterion == "l1" else "huber")

    @staticmethod
    def _oklab(rgb: jnp.ndarray) -> jnp.ndarray:
        lin = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
        m1 = jnp.asarray(
            [
                [0.4122214708, 0.5363325363, 0.0514459929],
                [0.2119034982, 0.6806995451, 0.1073969566],
                [0.0883024619, 0.2817188376, 0.6299787005],
            ],
            rgb.dtype,
        )
        lms = lin @ m1.T
        lms = jnp.cbrt(jnp.maximum(lms, 1e-12))
        m2 = jnp.asarray(
            [
                [0.2104542553, 0.7936177850, -0.0040720468],
                [1.9779984951, -2.4285922050, 0.4505937099],
                [0.0259040371, 0.7827717662, -0.8086757660],
            ],
            rgb.dtype,
        )
        return lms @ m2.T  # (L, a, b)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        p = pred.astype(jnp.float32)
        t = target.astype(jnp.float32)
        if self.use_blur:
            from trainner_redux_tpu.ops.resize import gaussian_blur

            p = gaussian_blur(p, self.blur_kernel_size, self.blur_sigma)
            t = gaussian_blur(t, self.blur_kernel_size, self.blur_sigma)
        lab_p, lab_t = self._oklab(jnp.clip(p, 0, 1)), self._oklab(jnp.clip(t, 0, 1))
        chroma_p = jnp.hypot(lab_p[..., 1], lab_p[..., 2]) * self.saturation
        chroma_t = jnp.hypot(lab_t[..., 1], lab_t[..., 2]) * self.saturation
        light_p = lab_p[..., 0] * self.brightness
        light_t = lab_t[..., 0] * self.brightness
        crit = self.criterion if self.criterion else self._crit
        loss = crit(chroma_p[..., None], chroma_t[..., None]) + crit(
            light_p[..., None], light_t[..., None]
        )
        if self.use_cosim:
            sim = (p * t).sum(-1) / jnp.maximum(
                jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1), 1e-20
            )
            loss = loss + self.cosim_weight * (1.0 - sim.mean())
        return self.loss_weight * loss


@LOSS_REGISTRY.register(name="bcewithlogitsdiceloss")
class BCEWithLogitsDiceLoss:
    """Segmentation loss: BCE-with-logits + soft Dice."""

    def __init__(
        self, loss_weight: float = 1.0, bce_weight: float = 0.5, smooth: float = 1.0
    ) -> None:
        self.loss_weight = loss_weight
        self.bce_weight = bce_weight
        self.smooth = smooth

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred = pred.astype(jnp.float32)
        target = target.astype(jnp.float32)
        bce = jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
        probs = jax.nn.sigmoid(pred)
        inter = (probs * target).sum()
        dice = 1.0 - (2 * inter + self.smooth) / (probs.sum() + target.sum() + self.smooth)
        return self.loss_weight * (self.bce_weight * bce + (1 - self.bce_weight) * dice)
