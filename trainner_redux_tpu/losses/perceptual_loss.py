"""VGG perceptual loss (+ style/Gram variant).

Parity: /root/reference/traiNNer/losses/perceptual_loss.py:9 /
perceptual_fp16_loss.py:75: weighted per-layer feature distances on a VGG
extractor, optional Gram-matrix style term, criterion l1/l2/charbonnier/fro.
The extractor's frozen weights are closed over as constants in the jitted
train step (no module state, no .to(device) plumbing).
"""

from __future__ import annotations

import jax.numpy as jnp

from trainner_redux_tpu.archs.vgg_arch import VGGFeatureExtractor
from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


def _gram(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> (N, C, C) Gram matrix."""
    n, h, w, c = x.shape
    f = x.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", f, f) / (c * h * w)


def _default_layer_weights() -> dict[str, float]:
    return {
        "conv1_2": 0.1,
        "conv2_2": 0.1,
        "conv3_4": 1.0,
        "conv4_4": 1.0,
        "conv5_4": 1.0,
    }


@LOSS_REGISTRY.register(name="perceptualloss")
class PerceptualLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        layer_weights: dict[str, float] | None = None,
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        perceptual_weight: float | None = None,
        style_weight: float = 0.0,
        criterion: str = "l1",
        weights_path: str | None = None,
        **_: dict,
    ) -> None:
        # either loss_weight (new style) or perceptual_weight (legacy) scales
        self.loss_weight = loss_weight if perceptual_weight is None else perceptual_weight
        self.layer_weights = dict(layer_weights or _default_layer_weights())
        self.style_weight = style_weight
        self.criterion_type = criterion
        self.criterion = None if criterion == "fro" else get_criterion(criterion)
        self.vgg = VGGFeatureExtractor(
            layer_name_list=list(self.layer_weights),
            vgg_type=vgg_type,
            use_input_norm=use_input_norm,
            range_norm=range_norm,
            weights_path=weights_path,
        )

    def _dist(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self.criterion_type == "fro":
            return jnp.linalg.norm((a - b).reshape(a.shape[0], -1), axis=-1).mean()
        return self.criterion(a, b)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        import jax

        pred_f = self.vgg(pred.astype(jnp.float32))
        gt_f = self.vgg(jax.lax.stop_gradient(target.astype(jnp.float32)))

        percep = jnp.zeros((), jnp.float32)
        for name, w in self.layer_weights.items():
            percep = percep + w * self._dist(pred_f[name], gt_f[name])
        total = self.loss_weight * percep

        if self.style_weight > 0:
            style = jnp.zeros((), jnp.float32)
            for name, w in self.layer_weights.items():
                style = style + w * self._dist(_gram(pred_f[name]), _gram(gt_f[name]))
            total = total + self.style_weight * style
        return total


# the fp16 variant of the reference differs only in autocast plumbing; under
# the bf16 dtype policy it is the same computation
LOSS_REGISTRY.register(PerceptualLoss, name="perceptualfp16loss")
