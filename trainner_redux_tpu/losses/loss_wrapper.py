"""ModelAsLoss wrapper.

ModelAsLoss (parity: reference loss_wrapper.py:7) lets an architecture
compute its own training loss (used by ParagonDiffusion).

The external-backbone perceptual losses (ConvNeXt/DINO/ResNet50-anime/
LineDistiller/AESOP/CLIP-contrastive) live in tower_perceptual_loss.py with
real flax towers + local torch-state-dict loaders; TOPIQ-as-loss is in
topiq_loss.py.
"""

from __future__ import annotations

from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register(name="modelasloss")
class ModelAsLoss:
    """The generator's own forward returns its loss; the trainer detects this
    wrapper and feeds (lq, gt) through the network's loss head."""

    def __init__(self, loss_weight: float = 1.0, **_: dict) -> None:
        self.loss_weight = loss_weight

    def __call__(self, output, target):
        # the "output" of a self-supervising model IS its loss value
        import jax.numpy as jnp

        return self.loss_weight * jnp.asarray(output, jnp.float32).mean()
