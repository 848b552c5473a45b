"""HSLuv perceptual color loss (parity: reference basic_loss.py:324-434).

Returns a dict of {hue, saturation, lightness} components (the model layer
sums and logs them individually, as the reference does for dict losses).
"""

from __future__ import annotations

import jax.numpy as jnp

from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.hsluv import rgb_to_hsluv
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register(name="hsluvloss")
class HSLuvLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        hue_weight: float = 1 / 3,
        saturation_weight: float = 1 / 3,
        lightness_weight: float = 1 / 3,
        criterion: str = "l1",
        downscale_factor: int = 1,
        blur_strength: int = 0,
    ) -> None:
        self.loss_weight = loss_weight
        self.hue_weight = hue_weight
        self.saturation_weight = saturation_weight
        self.lightness_weight = lightness_weight
        self.criterion = get_criterion(criterion)
        self.downscale_factor = downscale_factor
        self.blur_strength = blur_strength

    def _prep(self, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if self.downscale_factor > 1:
            from trainner_redux_tpu.ops.resize import resize

            h, w = x.shape[1], x.shape[2]
            x = jnp.clip(
                resize(
                    x,
                    (h // self.downscale_factor, w // self.downscale_factor),
                    "bicubic",
                    True,
                ),
                0.0,
                1.0,
            )
        hsl = rgb_to_hsluv(jnp.clip(x.astype(jnp.float32), 0.0, 1.0))
        return hsl[..., 0] / 360.0, hsl[..., 1] / 100.0, hsl[..., 2] / 100.0

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> dict[str, jnp.ndarray]:
        if self.blur_strength:
            from trainner_redux_tpu.ops.resize import gaussian_blur

            k = 4 * self.blur_strength + 1
            x = gaussian_blur(x, k, self.blur_strength)
            y = gaussian_blur(y, k, self.blur_strength)

        x_h, x_s, x_l = self._prep(x)
        y_h, y_s, y_l = self._prep(y)
        eps = 0.1

        hue_diff = jnp.minimum(jnp.abs(x_h - y_h), 1.0 - jnp.abs(x_h - y_h)) * 2.0
        hue_diff = jnp.where((x_s < eps) & (y_s < eps), 0.0, hue_diff)
        hue_diff = jnp.where(
            ((x_s < eps) & (y_s > eps)) | ((x_s > eps) & (y_s < eps)),
            jnp.maximum(x_s, y_s),
            hue_diff,
        )
        hue_diff = jnp.where((x_l < eps) & (y_l < eps), 0.0, hue_diff)
        hue_diff = jnp.where((x_l > 1 - eps) & (y_l > eps - 1), 0.0, hue_diff)
        hue_loss = hue_diff.mean() * self.hue_weight

        sat_diff = self.criterion(x_s, y_s, reduction="none")
        weight = jnp.clip(jnp.minimum(x_l, 1 - x_l), 0, 0.5) + jnp.clip(
            jnp.minimum(y_l, 1 - y_l), 0, 0.5
        )
        saturation_loss = (sat_diff * weight).mean() * self.saturation_weight

        lightness_loss = self.criterion(x_l, y_l, reduction="mean") * self.lightness_weight

        return {
            "hue": self.loss_weight * hue_loss,
            "saturation": self.loss_weight * saturation_loss,
            "lightness": self.loss_weight * lightness_loss,
        }
