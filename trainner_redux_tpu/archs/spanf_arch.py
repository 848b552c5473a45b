"""SPANF — fast SPAN variant with plain (pre-fused) convs (flax/NHWC).

Parity: reference traiNNer/archs/spanf_arch.py:127-205 (SPANF + spanf
factory): depthwise conv_near feature path at LR, five SPAB1 blocks (plain
3x3 convs + SiLU, parameter-free sigmoid-similarity attention on
equal-channel blocks), 1x1 concat fusion, conv to scale^2 channels, pixel
shuffle. No re-parameterization — this is the inference-shaped variant.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class SPAB1(nn.Module):
    in_ch: int
    mid_ch: int | None = None
    out_ch: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.mid_ch or self.in_ch
        out = self.out_ch or self.in_ch
        y1 = Conv2d(mid, 3, dtype=self.dtype, name="c1_r")(x)
        y2 = Conv2d(mid, 3, dtype=self.dtype, name="c2_r")(nn.silu(y1))
        y3 = Conv2d(out, 3, dtype=self.dtype, name="c3_r")(nn.silu(y2))
        if self.in_ch == out:
            sim_att = nn.sigmoid(y3) - 0.5
            return (y3 + x) * sim_att
        return y3


class SPANF(nn.Module):
    scale: int = 4
    num_in_ch: int = 3
    num_out_ch: int = 3
    feature_channels: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        s, cin, fc = self.scale, self.num_in_ch, self.feature_channels
        near_w = self.param(
            "conv_near_kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, cin * s * s), jnp.float32,
        )
        out_feature = lax.conv_general_dilated(
            x, near_w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=cin,
        )
        b1 = SPAB1(cin, fc, fc, dtype=self.dtype, name="block_1")(x)
        b = b1
        for i in range(2, 6):
            b = SPAB1(fc, dtype=self.dtype, name=f"block_{i}")(b)
        cat = jnp.concatenate([out_feature, b, b1], axis=-1)
        y = Conv2d(fc, 1, padding=0, dtype=self.dtype, name="conv_cat")(cat)
        y = Conv2d(cin * s * s, 3, dtype=self.dtype, name="conv_2")(y)
        return pixel_shuffle(y, s).astype(jnp.float32)


def _spanf_factory(scale: int = 4, **kwargs):
    kwargs.pop("bias", None)
    return SPANF(scale=scale, **kwargs)


ARCH_REGISTRY.register(_spanf_factory, name="spanf")
