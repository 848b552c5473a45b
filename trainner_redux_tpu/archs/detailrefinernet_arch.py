"""DetailRefinerNet — 1x refinement net with SE attention and group fusion
(flax/NHWC).

Parity: reference traiNNer/archs/detailrefinernet_arch.py:45-105
(DetailRefinerNet): shallow conv, num_groups chains of SE residual blocks,
1x1 fusion over concatenated group outputs, residual reconstruction.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class SELayer(nn.Module):
    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(
            max(1, self.channel // self.reduction), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="fc1",
        )(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(
            self.channel, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="fc2",
        )(y)
        return x * nn.sigmoid(y)[:, None, None, :]


class EnhancedRefinementBlock(nn.Module):
    num_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = Conv2d(self.num_features, 3, dtype=self.dtype, name="conv1")(x)
        res = nn.gelu(res, approximate=False)
        res = Conv2d(self.num_features, 3, dtype=self.dtype, name="conv2")(res)
        res = SELayer(self.num_features, dtype=self.dtype, name="se")(res)
        return x + res


class DetailRefinerNet(nn.Module):
    in_ch: int = 3
    out_ch: int = 3
    num_features: int = 64
    num_groups: int = 4
    num_blocks_per_group: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        shortcut = x
        y = Conv2d(self.num_features, 3, dtype=self.dtype, name="initial_conv")(x)
        group_outputs = []
        for gi in range(self.num_groups):
            for bi in range(self.num_blocks_per_group):
                y = EnhancedRefinementBlock(
                    self.num_features, dtype=self.dtype, name=f"groups_{gi}_b{bi}"
                )(y)
            group_outputs.append(y)
        fused = Conv2d(self.num_features, 1, padding=0, dtype=self.dtype, name="fusion_conv")(
            jnp.concatenate(group_outputs, axis=-1)
        )
        residual = Conv2d(self.out_ch, 3, dtype=self.dtype, name="final_conv")(fused)
        return (shortcut + residual).astype(jnp.float32)


def _drn_factory(scale: int = 1, **kwargs):
    if scale != 1:
        raise ValueError("DetailRefinerNet is a 1x refinement network")
    return DetailRefinerNet(**kwargs)


ARCH_REGISTRY.register(_drn_factory, name="detailrefinernet")
