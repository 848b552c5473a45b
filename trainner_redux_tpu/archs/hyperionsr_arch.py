"""HyperionSR — dual-attention + gated-FFN SR net (flax/NHWC).

Parity: reference traiNNer/archs/hyperionsr_arch.py:173-202 (HyperionSR +
S/M/L/XL variants): HyperionBlock = GroupNorm(1) -> spatial gate -> SE
channel attention (+res), GroupNorm(1) -> gated FFN (+res); residual groups
with long skip, pixelshuffle tail.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ChannelAttention(nn.Module):
    num_feat: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = Conv2d(max(1, self.num_feat // self.reduction), 1, padding=0,
                   dtype=self.dtype, name="du_0")(z)
        z = nn.gelu(z, approximate=False)
        z = Conv2d(self.num_feat, 1, padding=0, dtype=self.dtype, name="du_1")(z)
        return x * nn.sigmoid(z)


class HyperionBlock(nn.Module):
    num_feat: int
    ffn_expansion: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        gate = Conv2d(1, 1, padding=0, dtype=self.dtype, name="spatial_gate")(y)
        y = y * nn.sigmoid(gate)
        y = ChannelAttention(self.num_feat, dtype=self.dtype, name="ca")(y)
        x = y + res
        res = x
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        hidden = self.num_feat * self.ffn_expansion
        y = Conv2d(hidden * 2, 1, padding=0, dtype=self.dtype, name="project_in")(y)
        y1, y2 = y[..., :hidden], y[..., hidden:]
        y = Conv2d(self.num_feat, 1, padding=0, dtype=self.dtype, name="project_out")(
            nn.gelu(y1, approximate=False) * y2
        )
        return y + res


class HyperionSR(nn.Module):
    scale: int = 4
    in_chans: int = 3
    num_feat: int = 64
    num_groups: int = 4
    num_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        shallow = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_in")(x)
        y = shallow
        for gi in range(self.num_groups):
            g_in = y
            for bi in range(self.num_blocks):
                y = HyperionBlock(self.num_feat, dtype=self.dtype,
                                  name=f"body_{gi}_b{bi}")(y)
            y = y + g_in
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="fusion")(y) + shallow
        y = Conv2d(self.num_feat * self.scale**2, 3, dtype=self.dtype, name="upsampler")(y)
        y = pixel_shuffle(y, self.scale)
        return Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_out")(y).astype(jnp.float32)


def _hyperion_factory(num_feat, num_groups, num_blocks):
    def factory(scale: int = 4, **kwargs):
        return HyperionSR(
            scale=scale, num_feat=num_feat, num_groups=num_groups, num_blocks=num_blocks
        )

    return factory


ARCH_REGISTRY.register(_hyperion_factory(48, 3, 3), name="hyperionsr_s")
ARCH_REGISTRY.register(_hyperion_factory(64, 4, 4), name="hyperionsr_m")
ARCH_REGISTRY.register(_hyperion_factory(128, 5, 5), name="hyperionsr_l")
ARCH_REGISTRY.register(_hyperion_factory(160, 6, 6), name="hyperionsr_xl")
ARCH_REGISTRY.register(HyperionSR, name="hyperionsr")
