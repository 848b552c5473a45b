"""DIS — Direct Image Supersampling: minimal fast conv SR (flax/NHWC).

Parity: reference traiNNer/archs/dis_arch.py:74-214 (DIS + dis_balanced/
dis_fast factories): PReLU conv head, FastResBlocks (or depthwise-separable
LightBlocks), fusion conv + feature residual, staged pixel-shuffle
upsampler with PReLU, bilinear global residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, PReLU, pixel_shuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class FastResBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.channels, 3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = PReLU(self.channels, name="act")(y)
        return Conv2d(self.channels, 3, use_bias=False, dtype=self.dtype, name="conv2")(y) + x


class LightBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.channels, 3, feature_group_count=self.channels,
                   use_bias=False, dtype=self.dtype, name="depthwise")(x)
        y = Conv2d(self.channels, 1, padding=0, use_bias=False, dtype=self.dtype,
                   name="pointwise")(y)
        return x + PReLU(self.channels, name="act")(y)


class DIS(nn.Module):
    scale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    num_features: int = 32
    num_blocks: int = 4
    use_depthwise: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        s = self.scale
        if s == 1:
            base = x
        else:
            b, h, w, c = x.shape
            base = jax.image.resize(x, (b, h * s, w * s, c), "linear")
        feat = PReLU(self.num_features, name="head_act")(
            Conv2d(self.num_features, 3, dtype=self.dtype, name="head")(x)
        )
        y = feat
        blk = LightBlock if self.use_depthwise else FastResBlock
        for i in range(self.num_blocks):
            y = blk(self.num_features, dtype=self.dtype, name=f"body_{i}")(y)
        y = Conv2d(self.num_features, 3, dtype=self.dtype, name="fusion")(y) + feat
        r, stage = s, 0
        while r > 1:
            f = 3 if r % 3 == 0 else 2
            y = Conv2d(self.num_features * f * f, 3, dtype=self.dtype,
                       name=f"up_{stage}")(y)
            y = PReLU(self.num_features, name=f"up_act_{stage}")(pixel_shuffle(y, f))
            r //= f
            stage += 1
        out = Conv2d(self.out_channels, 3, dtype=self.dtype, name="tail")(y)
        return (out + base).astype(jnp.float32)


def _dis_factory(num_blocks):
    def factory(scale: int = 4, **kwargs):
        kwargs.setdefault("num_blocks", num_blocks)
        return DIS(scale=scale, **kwargs)

    return factory


SPANDREL_REGISTRY.register(_dis_factory(12), name="dis_balanced")
SPANDREL_REGISTRY.register(_dis_factory(8), name="dis_fast")
