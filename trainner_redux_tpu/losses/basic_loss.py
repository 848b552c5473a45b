"""Pixel/structural losses (JAX, NHWC images in [0,1]).

Parity targets: /root/reference/traiNNer/losses/basic_loss.py (L1 :37,
MSE :69, Charbonnier :101, FFT :143, Huber :160, PSNR :185, Color :217,
Average :248, Bicubic :270, Luma :301). Each loss is a stateless callable
returning `loss_weight * value`; everything runs inside the jitted train
step, so no device/dtype bookkeeping is needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.losses.loss_util import (
    avg_pool,
    charbonnier,
    get_criterion,
    l1,
    l2,
    reduce_loss,
)
from trainner_redux_tpu.utils.color_util import rgb2ycbcr
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


class Loss:
    """Base: carries loss_weight; subclasses implement __call__(pred, target)."""

    def __init__(self, loss_weight: float = 1.0) -> None:
        self.loss_weight = loss_weight


@LOSS_REGISTRY.register(name="l1loss")
class L1Loss(Loss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean") -> None:
        super().__init__(loss_weight)
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.loss_weight * l1(pred, target, self.reduction)


@LOSS_REGISTRY.register(name="mseloss")
class MSELoss(Loss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean") -> None:
        super().__init__(loss_weight)
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.loss_weight * l2(pred, target, self.reduction)


@LOSS_REGISTRY.register(name="charbonnierloss")
class CharbonnierLoss(Loss):
    def __init__(
        self, loss_weight: float = 1.0, reduction: str = "mean", eps: float = 1e-12
    ) -> None:
        super().__init__(loss_weight)
        self.reduction = reduction
        self.eps = eps

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.loss_weight * charbonnier(pred, target, self.eps, self.reduction)


@LOSS_REGISTRY.register(name="huberloss")
class HuberLoss(Loss):
    def __init__(
        self, loss_weight: float = 1.0, reduction: str = "mean", delta: float = 1.0
    ) -> None:
        super().__init__(loss_weight)
        self.reduction = reduction
        self.delta = delta

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        diff = jnp.abs(pred - target)
        loss = jnp.where(
            diff <= self.delta, 0.5 * diff**2, self.delta * (diff - 0.5 * self.delta)
        )
        return self.loss_weight * reduce_loss(loss, self.reduction)


@LOSS_REGISTRY.register(name="fftloss")
class FFTLoss(Loss):
    """L1 in the 2D Fourier domain (real/imag stacked)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean") -> None:
        super().__init__(loss_weight)
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # NHWC: fft over the spatial dims; compute in fp32 for stability
        pf = jnp.fft.fft2(pred.astype(jnp.float32), axes=(1, 2))
        tf = jnp.fft.fft2(target.astype(jnp.float32), axes=(1, 2))
        pred_s = jnp.stack([pf.real, pf.imag], axis=-1)
        target_s = jnp.stack([tf.real, tf.imag], axis=-1)
        return self.loss_weight * l1(pred_s, target_s, self.reduction)


@LOSS_REGISTRY.register(name="psnrloss")
class PSNRLoss(Loss):
    """Negative-PSNR loss (reference basic_loss.py:185-215)."""

    def __init__(
        self, loss_weight: float = 1.0, reduction: str = "mean", to_y: bool = False
    ) -> None:
        super().__init__(loss_weight)
        assert reduction == "mean"
        self.to_y = to_y
        self.scale = 10 / np.log(10)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.to_y:
            coef = jnp.asarray([65.481, 128.553, 24.966], dtype=pred.dtype)
            pred = ((pred * coef).sum(axis=-1, keepdims=True) + 16.0) / 255.0
            target = ((target * coef).sum(axis=-1, keepdims=True) + 16.0) / 255.0
        mse = ((pred - target) ** 2).mean(axis=(1, 2, 3))
        return self.loss_weight * (self.scale * jnp.log(mse + 1e-8)).mean()


@LOSS_REGISTRY.register(name="colorloss")
class ColorLoss(Loss):
    """Chroma (CbCr) loss on avg-pooled channels (reference :217-246)."""

    def __init__(self, loss_weight: float = 1.0, criterion: str = "l1", scale: int = 4) -> None:
        super().__init__(loss_weight)
        self.criterion = get_criterion(criterion)
        self.scale = int(scale)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred_uv = rgb2ycbcr(pred)[..., 1:]
        target_uv = rgb2ycbcr(target)[..., 1:]
        return self.loss_weight * self.criterion(
            avg_pool(pred_uv, self.scale), avg_pool(target_uv, self.scale)
        )


@LOSS_REGISTRY.register(name="lumaloss")
class LumaLoss(Loss):
    def __init__(self, loss_weight: float = 1.0, criterion: str = "l1") -> None:
        super().__init__(loss_weight)
        self.criterion = get_criterion(criterion)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        pred_y = rgb2ycbcr(pred, y_only=True)
        target_y = rgb2ycbcr(target, y_only=True)
        return self.loss_weight * self.criterion(pred_y, target_y)


@LOSS_REGISTRY.register(name="averageloss")
class AverageLoss(Loss):
    """Criterion on avg-pool-downscaled images (reference :248-267)."""

    def __init__(self, loss_weight: float = 1.0, criterion: str = "l1", scale: int = 4) -> None:
        super().__init__(loss_weight)
        self.criterion = get_criterion(criterion)
        self.scale = int(scale)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        return self.loss_weight * self.criterion(
            avg_pool(pred, self.scale), avg_pool(target, self.scale)
        )


@LOSS_REGISTRY.register(name="bicubicloss")
class BicubicLoss(Loss):
    """Criterion on bicubic-downscaled + slightly blurred images (reference :270-299)."""

    def __init__(self, loss_weight: float = 1.0, criterion: str = "l1", scale: int = 4) -> None:
        super().__init__(loss_weight)
        self.criterion = get_criterion(criterion)
        self.scale = int(scale)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        from trainner_redux_tpu.ops.resize import gaussian_blur, resize_bicubic

        def ds(x):
            n, h, w, c = x.shape
            x = resize_bicubic(x, (h // self.scale, w // self.scale), antialias=True)
            return gaussian_blur(x, kernel_size=5, sigma=0.5)

        return self.loss_weight * self.criterion(ds(pred), ds(target))


@LOSS_REGISTRY.register(name="tvloss")
class TVLoss(Loss):
    """Total variation regularizer (reference tv_loss.py:12)."""

    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean") -> None:
        super().__init__(loss_weight)
        self.reduction = reduction

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray | None = None) -> jnp.ndarray:
        del target
        h_var = l1(pred[:, 1:, :, :], pred[:, :-1, :, :], self.reduction)
        w_var = l1(pred[:, :, 1:, :], pred[:, :, :-1, :], self.reduction)
        return self.loss_weight * (h_var + w_var)
