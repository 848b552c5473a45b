"""Feature matching loss over discriminator intermediates
(parity: /root/reference/traiNNer/losses/feature_matching_loss.py:13)."""

from __future__ import annotations

import jax.numpy as jnp

from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register(name="featurematchingloss")
class FeatureMatchingLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        reduction: str = "mean",
        layers: list | None = None,
        criterion: str = "l1",
        eps: float = 1e-6,
        **_: dict,
    ) -> None:
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.layers = layers
        self.criterion = get_criterion(criterion)

    def __call__(self, real_feats, fake_feats) -> jnp.ndarray:
        # accept single lists or multi-scale lists-of-lists
        if real_feats and isinstance(real_feats[0], (list, tuple)):
            real_flat = [f for feats in real_feats for f in feats]
            fake_flat = [f for feats in fake_feats for f in feats]
        else:
            real_flat, fake_flat = list(real_feats), list(fake_feats)
        if self.layers is not None:
            real_flat = [real_flat[i] for i in self.layers]
            fake_flat = [fake_flat[i] for i in self.layers]
        total = jnp.zeros((), jnp.float32)
        for r, f in zip(real_flat, fake_flat, strict=True):
            total = total + self.criterion(f.astype(jnp.float32), r.astype(jnp.float32))
        if self.reduction == "mean" and real_flat:
            total = total / len(real_flat)
        return self.loss_weight * total
