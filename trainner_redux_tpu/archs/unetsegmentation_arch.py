"""UnetSegmentation — generic U-Net for mask prediction (flax/NHWC).

Parity: reference traiNNer/archs/unetsegmentation_arch.py:20-44, which wraps
segmentation-models-pytorch's smp.Unet with a pretrained encoder. Pretrained
SMP encoders require downloads unavailable in zero-egress deployments, so
this is a self-contained double-conv U-Net with the same factory surface
(in_ch/classes/activation); `encoder_weights` other than None fails fast
with guidance (same policy as the DINO/CLIP towers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class DoubleConv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(Conv2d(self.features, 3, dtype=self.dtype, name="conv1")(x))
        return nn.relu(Conv2d(self.features, 3, dtype=self.dtype, name="conv2")(x))


class UnetSegmentation(nn.Module):
    in_ch: int = 3
    classes: int = 1
    base_feat: int = 32
    depth: int = 4
    activation: str | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mult = 2**self.depth
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        skips = []
        for d in range(self.depth):
            y = DoubleConv(self.base_feat * 2**d, dtype=self.dtype, name=f"enc_{d}")(y)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = DoubleConv(self.base_feat * 2**self.depth, dtype=self.dtype, name="mid")(y)
        for d in reversed(range(self.depth)):
            y = jax.image.resize(
                y, (y.shape[0], y.shape[1] * 2, y.shape[2] * 2, y.shape[-1]), "nearest"
            )
            y = jnp.concatenate([y, skips[d]], axis=-1)
            y = DoubleConv(self.base_feat * 2**d, dtype=self.dtype, name=f"dec_{d}")(y)
        y = Conv2d(self.classes, 1, padding=0, dtype=self.dtype, name="head")(y)
        y = y[:, :h0, :w0, :]
        if self.activation == "sigmoid":
            y = nn.sigmoid(y)
        elif self.activation == "softmax2d":
            y = jax.nn.softmax(y, axis=-1)
        return y.astype(jnp.float32)


def _unetseg_factory(
    scale: int = 1,
    encoder_name: str = "resnet50",
    encoder_weights: str | None = None,
    in_ch: int = 3,
    classes: int = 1,
    activation: str | None = None,
    **kwargs,
):
    if encoder_weights not in (None, "none"):
        raise ValueError(
            "unetsegmentation: pretrained SMP encoders (encoder_weights="
            f"{encoder_weights!r}) need downloaded weights, unavailable in this "
            "zero-egress deployment; set encoder_weights: null to train from "
            "scratch (documented divergence)"
        )
    return UnetSegmentation(in_ch=in_ch, classes=classes, activation=activation, **kwargs)


ARCH_REGISTRY.register(_unetseg_factory, name="unetsegmentation")
