"""ModelAsLoss wrapper + gated external-tower losses.

ModelAsLoss (parity: reference loss_wrapper.py:7) lets an architecture
compute its own training loss (used by ParagonDiffusion).

The external-backbone perceptual losses (ConvNeXt/DINO/ResNet50-anime/CLIP
line-distiller/AESOP/TOPIQ-as-loss) require pretrained towers that cannot be
fetched in a zero-egress environment and are not bundled by the reference
either; they register with an informative construction-time error so configs
fail fast with guidance instead of silently training on random features.
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


def _gated(name: str, needs: str):
    class GatedLoss:
        def __init__(self, *args, **kwargs) -> None:
            raise NotImplementedError(
                f"{name} requires pretrained {needs} weights which are not "
                "bundled and cannot be downloaded in this environment. Place "
                "the weights under TRAINNER_WEIGHTS_DIR and use the "
                "corresponding *_weights_path option, or choose another loss "
                "(perceptualloss/distsloss run with local VGG weights)."
            )

    GatedLoss.__name__ = name
    return GatedLoss


for _name, _needs in [
    ("convnextperceptualloss", "ConvNeXt"),
    ("dinoperceptualloss", "DINOv2"),
    ("perceptualanimeloss", "ResNet50-anime"),
    ("linedistillerloss", "LineDistiller"),
    ("aesoploss", "AESOP autoencoder"),
    ("topiqloss", "TOPIQ"),
]:
    LOSS_REGISTRY.register(_gated(_name, _needs), name=_name)
