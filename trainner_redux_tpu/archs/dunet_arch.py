"""DUnet discriminator (parity: /root/reference/traiNNer/archs/dunet_arch.py:22):
spectral-normalized U-Net with Mish activations and DySample upsamplers."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    DySample,
    Dtype,
    SNConv2d,
    mish,
)
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class Down(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = SNConv2d(self.dim * 2, 3, stride=2, padding=1, dtype=self.dtype, name="conv")(
            x, train
        )
        return mish(x)


class Up(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # local_radius=1: the discriminator is train-only and randomly
        # initialized (no checkpoint-inference parity at stake); the tight
        # window measured +55% GAN train throughput (span_s_gan 26.7 ->
        # 41.4 img/s) and ~4x faster compile vs radius 2
        x = DySample(
            self.dim, self.dim, scale=2, groups=4, end_convolution=False,
            local_radius=1, dtype=self.dtype, name="dysample",
        )(x, train)
        return SNConv2d(self.dim // 2, 3, padding=1, dtype=self.dtype, name="conv")(x, train)


@ARCH_REGISTRY.register()
class DUnet(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        nf = self.num_feat
        x = x.astype(self.dtype)
        x0 = Conv2d(nf, 3, dtype=self.dtype, name="in_to_dim")(x)
        x1 = Down(nf, dtype=self.dtype, name="e_x1")(x0, train)
        x2 = Down(nf * 2, dtype=self.dtype, name="e_x2")(x1, train)
        x3 = Down(nf * 4, dtype=self.dtype, name="e_x3")(x2, train)
        u = Up(nf * 8, dtype=self.dtype, name="up1")(x3, train) + x2
        u = Up(nf * 4, dtype=self.dtype, name="up2")(u, train) + x1
        u = Up(nf * 2, dtype=self.dtype, name="up3")(u, train) + x0

        out = mish(SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="end_conv0")(u, train))
        out = mish(SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="end_conv1")(out, train))
        out = Conv2d(1, 3, dtype=self.dtype, name="end_conv2")(out)
        out = out.astype(jnp.float32)
        if return_features:
            return out, [x1, x2, x3, u]
        return out
