"""LDL loss (Locally Discriminative Learning, CVPR 2022).

Parity: /root/reference/traiNNer/losses/ldl_loss.py:9-110. Needs the EMA
model's output (wired by SRModel). The local-variance sliding window is
expressed as depthwise convs (mean / mean-of-squares), which XLA fuses —
no unfold materialization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


def _local_var(residual: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Sliding-window unbiased variance over ksize x ksize patches (N,H,W,1)."""
    pad = (ksize - 1) // 2
    x = jnp.pad(residual, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    k = jnp.ones((ksize, ksize, 1, 1), residual.dtype)
    dn = ("NHWC", "HWIO", "NHWC")
    n = ksize * ksize
    s1 = jax.lax.conv_general_dilated(x, k, (1, 1), "VALID", dimension_numbers=dn)
    s2 = jax.lax.conv_general_dilated(x * x, k, (1, 1), "VALID", dimension_numbers=dn)
    # unbiased: (sum_sq - sum^2/n) / (n - 1)
    return (s2 - s1 * s1 / n) / (n - 1)


def get_refined_artifact_map(
    img_gt: jnp.ndarray, img_output: jnp.ndarray, img_ema: jnp.ndarray, ksize: int = 7
) -> jnp.ndarray:
    residual_ema = jnp.sum(jnp.abs(img_gt - img_ema), axis=-1, keepdims=True)
    residual_sr = jnp.sum(jnp.abs(img_gt - img_output), axis=-1, keepdims=True)
    patch_level_weight = jnp.power(
        jnp.var(residual_sr, axis=(1, 2, 3), keepdims=True, ddof=1), 1 / 5
    )
    pixel_level_weight = _local_var(residual_sr, ksize)
    overall_weight = patch_level_weight * pixel_level_weight
    return jnp.where(residual_sr < residual_ema, 0.0, overall_weight)


@LOSS_REGISTRY.register(name="ldlloss")
class LDLLoss:
    def __init__(self, loss_weight: float = 1.0, criterion: str = "l1") -> None:
        self.loss_weight = loss_weight
        self.criterion = get_criterion(criterion)

    def __call__(
        self, output: jnp.ndarray, output_ema: jnp.ndarray, gt: jnp.ndarray
    ) -> jnp.ndarray:
        output = output.astype(jnp.float32)
        gt = gt.astype(jnp.float32)
        output_ema = output_ema.astype(jnp.float32)
        w = jax.lax.stop_gradient(get_refined_artifact_map(gt, output, output_ema))
        return self.loss_weight * self.criterion(w * output, w * gt)
