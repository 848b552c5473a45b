"""Contextual loss (CX) on VGG features.

Parity: /root/reference/traiNNer/losses/contextual_loss.py:28: cosine-
similarity-based soft nearest-neighbor matching between feature sets
(Mechrez et al. 2018). Band width / distance type follow the reference
defaults. Feature maps are subsampled to bound the N^2 similarity matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trainner_redux_tpu.archs.vgg_arch import VGGFeatureExtractor
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


def _contextual_similarity(
    x: jnp.ndarray, y: jnp.ndarray, band_width: float
) -> jnp.ndarray:
    """x, y: (N, P, C) feature sets -> CX similarity scalar per batch item."""
    # center by y's mean (reference convention)
    mu = y.mean(axis=1, keepdims=True)
    xc = x - mu
    yc = y - mu
    xn = xc / jnp.maximum(jnp.linalg.norm(xc, axis=-1, keepdims=True), 1e-8)
    yn = yc / jnp.maximum(jnp.linalg.norm(yc, axis=-1, keepdims=True), 1e-8)
    cos = jnp.einsum("npc,nqc->npq", xn, yn)
    dist = 1.0 - cos
    # relative distances
    d_min = dist.min(axis=2, keepdims=True)
    d_rel = dist / (d_min + 1e-5)
    w = jnp.exp((1.0 - d_rel) / band_width)
    cx_ij = w / jnp.maximum(w.sum(axis=2, keepdims=True), 1e-8)
    cx = cx_ij.max(axis=1).mean(axis=1)
    return cx


@LOSS_REGISTRY.register(name="contextualloss")
class ContextualLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        layer_weights: dict[str, float] | None = None,
        vgg_type: str = "vgg19",
        band_width: float = 0.5,
        max_points: int = 1024,
        weights_path: str | None = None,
        **_: dict,
    ) -> None:
        self.loss_weight = loss_weight
        self.layer_weights = dict(layer_weights or {"conv3_4": 1.0, "conv4_4": 1.0})
        self.band_width = band_width
        self.max_points = max_points
        self.vgg = VGGFeatureExtractor(
            list(self.layer_weights), vgg_type=vgg_type, weights_path=weights_path
        )

    def _flat(self, f: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = f.shape
        f = f.reshape(n, h * w, c)
        if h * w > self.max_points:
            stride = (h * w + self.max_points - 1) // self.max_points
            f = f[:, ::stride, :]
        return f

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fx = self.vgg(pred.astype(jnp.float32))
        fy = self.vgg(jax.lax.stop_gradient(target.astype(jnp.float32)))
        total = jnp.zeros((), jnp.float32)
        for name, w in self.layer_weights.items():
            cx = _contextual_similarity(
                self._flat(fx[name]), self._flat(fy[name]), self.band_width
            )
            total = total + w * (-jnp.log(jnp.maximum(cx, 1e-8))).mean()
        return self.loss_weight * total
