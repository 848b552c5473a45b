"""ArtCNN (flax/NHWC) — plain residual CNN for anime/art SR.

Parity: /root/reference/traiNNer/archs/artcnn_arch.py:8-183 (ArtCNN +
artcnn_r16f96 / r8f64 / r8f48 presets).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ResBlock(nn.Module):
    filters: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = nn.relu(Conv2d(self.filters, self.kernel_size, dtype=self.dtype, name="conv0")(x))
        res = nn.relu(Conv2d(self.filters, self.kernel_size, dtype=self.dtype, name="conv1")(res))
        res = Conv2d(self.filters, self.kernel_size, dtype=self.dtype, name="conv2")(res)
        return x + res


class ArtCNN(nn.Module):
    in_ch: int = 3
    scale: int = 4
    filters: int = 96
    n_block: int = 16
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        feat = Conv2d(self.filters, self.kernel_size, dtype=self.dtype, name="conv0")(x)
        res = feat
        for i in range(self.n_block):
            res = ResBlock(self.filters, self.kernel_size, dtype=self.dtype, name=f"block_{i}")(res)
        res = Conv2d(self.filters, self.kernel_size, dtype=self.dtype, name="res_conv")(res)
        feat = feat + res
        out = Conv2d(
            self.in_ch * self.scale**2, self.kernel_size, dtype=self.dtype, name="up_conv"
        )(feat)
        return pixel_shuffle(out, self.scale).astype(jnp.float32)


def _artcnn_factory(filters: int, n_block: int):
    def factory(scale: int = 4, in_ch: int = 3, filters: int = filters,
                n_block: int = n_block, kernel_size: int = 3, **kwargs) -> ArtCNN:
        kwargs.pop("act", None)
        return ArtCNN(
            in_ch=in_ch, scale=scale, filters=filters, n_block=n_block,
            kernel_size=kernel_size, **kwargs,
        )

    return factory


ARCH_REGISTRY.register(_artcnn_factory(96, 16), name="artcnn")
ARCH_REGISTRY.register(_artcnn_factory(96, 16), name="artcnn_r16f96")
ARCH_REGISTRY.register(_artcnn_factory(64, 8), name="artcnn_r8f64")
ARCH_REGISTRY.register(_artcnn_factory(48, 8), name="artcnn_r8f48")
