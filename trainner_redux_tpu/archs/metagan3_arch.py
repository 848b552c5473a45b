"""MetaGAN3 — dual-path spectral-norm feature discriminator (flax/NHWC).

Parity: reference traiNNer/archs/metagan3_arch.py:164-193 (MetaGAN3): stem
(two stride-2 SN convs + GroupNorm), three stride-2 stages of DualPathBlocks
(spectral-norm gated conv with Inception depthwise mixer + dilated context
block d2/d4/d8 + 4-direction shift conv, 1x1 fusion). Outputs the final
feature map (the GAN loss consumes features, as in the reference).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, SNConv2d
from trainner_redux_tpu.archs.moesr_arch import InceptionDWConv2d
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class DilatedContextBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        x2 = Conv2d(d, 3, feature_group_count=d, dilation=2, dtype=self.dtype,
                    name="conv2")(x)
        x4 = Conv2d(d, 3, feature_group_count=d, dilation=4, dtype=self.dtype,
                    name="conv4")(x)
        x8 = Conv2d(d, 3, feature_group_count=d, dilation=8, dtype=self.dtype,
                    name="conv8")(x)
        return Conv2d(d, 1, padding=0, dtype=self.dtype, name="fuse")(
            jnp.concatenate([x2, x4, x8], axis=-1)
        )


class ShiftConv(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = jnp.zeros_like(x[:, :, :1, :])
        zh = jnp.zeros_like(x[:, :1, :, :])
        shifts = [
            x,
            jnp.concatenate([x[:, :, 1:, :], z], axis=2),   # shift left
            jnp.concatenate([z, x[:, :, :-1, :]], axis=2),  # shift right
            jnp.concatenate([x[:, 1:, :, :], zh], axis=1),  # shift up
            jnp.concatenate([zh, x[:, :-1, :, :]], axis=1), # shift down
        ]
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fuse")(
            jnp.concatenate(shifts, axis=-1)
        )


class GatedConvBlock(nn.Module):
    dim: int
    conv_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dim
        hidden = d * 2
        conv_ch = int(self.conv_ratio * d)
        shortcut = x
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(x)
        y = SNConv2d(hidden, 1, padding=0, dtype=self.dtype, name="conv1")(y, train)
        i, c = y[..., : hidden - conv_ch], y[..., hidden - conv_ch :]
        c = InceptionDWConv2d(conv_ch, dtype=self.dtype, name="depthwise")(c)
        y = SNConv2d(d, 1, padding=0, dtype=self.dtype, name="conv2")(
            jnp.concatenate([i, c], axis=-1), train
        )
        return shortcut + y


class DualPathBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        lcl = GatedConvBlock(self.dim, dtype=self.dtype, name="local")(x, train)
        glb = DilatedContextBlock(self.dim, dtype=self.dtype, name="global_context")(x)
        sft = ShiftConv(self.dim, dtype=self.dtype, name="shift")(x)
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fusion")(
            jnp.concatenate([lcl, glb, sft], axis=-1)
        )


class MetaGAN3(nn.Module):
    in_ch: int = 3
    dims: tuple = (64, 128, 192, 256)
    blocks: tuple = (2, 3, 5, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        d0 = self.dims[0]
        y = nn.silu(SNConv2d(d0 // 2, 3, stride=2, padding=1, dtype=self.dtype,
                             name="stem_conv1")(x, train))
        y = SNConv2d(d0, 3, stride=2, padding=1, dtype=self.dtype,
                     name="stem_conv2")(y, train)
        y = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="stem_norm")(y)
        for si in range(len(self.blocks) - 1):
            y = SNConv2d(self.dims[si + 1], 3, stride=2, padding=1, dtype=self.dtype,
                         name=f"stage{si}_down")(y, train)
            for bi in range(self.blocks[si]):
                y = DualPathBlock(self.dims[si + 1], dtype=self.dtype,
                                  name=f"stage{si}_b{bi}")(y, train)
        return y.astype(jnp.float32)


def _metagan3_factory(**kwargs):
    for k in ("dims", "blocks"):
        if k in kwargs:
            kwargs[k] = tuple(kwargs[k])
    return MetaGAN3(**kwargs)


ARCH_REGISTRY.register(_metagan3_factory, name="metagan3")
