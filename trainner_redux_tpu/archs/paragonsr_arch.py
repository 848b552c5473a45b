"""ParagonSR — hybrid CNN with reparam gated FFN and magic-kernel upsample
(flax/NHWC).

Parity: reference traiNNer/archs/paragonsr_arch.py:245-421 (ParagonSR +
anime/nano/tiny/xs/s/m/l/xl variants): ParagonBlock = GroupNorm(1) →
InceptionDWConv2d context (+LayerScale residual), GroupNorm(1) → GatedFFN
whose spatial mixer is a reparameterizable depthwise conv (3x3 + 1x1 + dw3x3
branches, fused to one dw 3x3 at eval), residual groups, MagicKernelSharp2021
upsample + conv tail.
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, mish
from trainner_redux_tpu.archs.moesr_arch import InceptionDWConv2d
from trainner_redux_tpu.archs.munet_arch import _magic_upsample
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ReparamDWConv(nn.Module):
    """Depthwise 3x3 + 1x1 + dw3x3 branches; single fused dw 3x3 at eval
    (reference ReparamConvV2 with groups == channels)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        d = self.dim
        init = nn.initializers.lecun_normal()
        k3 = self.param("conv3x3_kernel", init, (3, 3, 1, d), jnp.float32)
        b3 = self.param("conv3x3_bias", nn.initializers.zeros, (d,), jnp.float32)
        k1 = self.param("conv1x1_kernel", init, (1, 1, 1, d), jnp.float32)
        b1 = self.param("conv1x1_bias", nn.initializers.zeros, (d,), jnp.float32)
        kd = self.param("dw_conv3x3_kernel", init, (3, 3, 1, d), jnp.float32)
        bd = self.param("dw_conv3x3_bias", nn.initializers.zeros, (d,), jnp.float32)

        def dw(inp, w, b, pad):
            y = lax.conv_general_dilated(
                inp, w.astype(inp.dtype), (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=d,
            )
            return y + b.astype(inp.dtype)

        if train:
            return dw(x, k3, b3, 1) + dw(x, k1, b1, 0) + dw(x, kd, bd, 1)
        fused_w = k3 + jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0))) + kd
        return dw(x, fused_w, b3 + b1 + bd, 1)


class GatedFFN(nn.Module):
    dim: int
    expansion_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        hidden = int(self.dim * self.expansion_ratio)
        g = Conv2d(hidden, 1, padding=0, dtype=self.dtype, name="project_in_g")(x)
        i = Conv2d(hidden, 1, padding=0, dtype=self.dtype, name="project_in_i")(x)
        g = ReparamDWConv(hidden, dtype=self.dtype, name="spatial_mixer")(g, train)
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="project_out")(
            mish(g) * i
        )


class ParagonBlock(nn.Module):
    dim: int
    ffn_expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ls1 = self.param("ls1_gamma", nn.initializers.constant(1e-5), (self.dim,), jnp.float32)
        ls2 = self.param("ls2_gamma", nn.initializers.constant(1e-5), (self.dim,), jnp.float32)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        y = InceptionDWConv2d(self.dim, dtype=self.dtype, name="context")(y)
        x = x + y * ls1.astype(x.dtype)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        y = GatedFFN(self.dim, self.ffn_expansion, dtype=self.dtype, name="transformer")(y, train)
        return x + y * ls2.astype(x.dtype)


class ParagonSR(nn.Module):
    scale: int = 4
    in_chans: int = 3
    num_feat: int = 64
    num_groups: int = 6
    num_blocks: int = 6
    ffn_expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        shallow = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_in")(x)
        y = shallow
        for gi in range(self.num_groups):
            g_in = y
            for bi in range(self.num_blocks):
                y = ParagonBlock(self.num_feat, self.ffn_expansion, dtype=self.dtype,
                                 name=f"body_{gi}_b{bi}")(y, train)
            y = y + g_in
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_fuse")(y) + shallow
        y = _magic_upsample(y, self.scale)
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="upsampler")(y)
        return Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_out")(y).astype(jnp.float32)


def _paragon_factory(num_feat, num_groups, num_blocks, ffn):
    def factory(scale: int = 4, **kwargs):
        return ParagonSR(
            scale=scale, num_feat=num_feat, num_groups=num_groups,
            num_blocks=num_blocks, ffn_expansion=ffn,
        )

    return factory


ARCH_REGISTRY.register(_paragon_factory(28, 2, 3, 1.5), name="paragonsr_anime")
ARCH_REGISTRY.register(_paragon_factory(24, 3, 2, 1.5), name="paragonsr_nano")
ARCH_REGISTRY.register(_paragon_factory(32, 3, 2, 2.0), name="paragonsr_tiny")
ARCH_REGISTRY.register(_paragon_factory(48, 4, 4, 2.0), name="paragonsr_xs")
ARCH_REGISTRY.register(_paragon_factory(64, 6, 6, 2.0), name="paragonsr_s")
ARCH_REGISTRY.register(_paragon_factory(96, 8, 8, 2.0), name="paragonsr_m")
ARCH_REGISTRY.register(_paragon_factory(128, 10, 10, 2.0), name="paragonsr_l")
ARCH_REGISTRY.register(_paragon_factory(160, 12, 12, 2.0), name="paragonsr_xl")
ARCH_REGISTRY.register(ParagonSR, name="paragonsr")
