"""Sebica — tiny bidirectional-attention SR net (flax/NHWC).

Parity: /root/reference/traiNNer/archs/sebica_arch.py:8-180 (CSA spatial +
bidirectional ECA-style channel attention, conv/FFN mixers, sebica /
sebica_mini presets).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import BatchNormNoStats
from trainner_redux_tpu.ops.resize import resize
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class CSA(nn.Module):
    channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        avg_out = x.mean(axis=-1, keepdims=True)
        max_out = x.max(axis=-1, keepdims=True)
        sw = nn.sigmoid(
            Conv2d(1, 7, use_bias=False, dtype=self.dtype, name="spatial")(
                jnp.concatenate([avg_out, max_out], axis=-1)
            )
        )
        # Reference sebica_arch.py:44-67: the channel branch degenerates.
        # y = mean(x, HW) is fed as a 3D (B,1,C) tensor into
        # AdaptiveAvgPool2d(1), which treats it as an unbatched (C,H,W)
        # volume and pools the whole (1,C) plane -> one scalar per sample
        # (the global mean of x). The k=3 Conv1d then sees a length-1
        # sequence under zero padding, so only its CENTER tap contributes,
        # and both .flip(dims=[1]) calls act on size-1 dims (no-ops). Net
        # effect: channel_weight = (sigmoid(kf[1]*s) + sigmoid(kb[1]*s))/2,
        # a per-sample scalar. Replicated exactly for checkpoint parity.
        s_mean = x.mean(axis=(1, 2, 3), keepdims=True)
        k_f = self.param(
            "ca_forward", nn.initializers.lecun_normal(), (self.kernel_size, 1), jnp.float32
        )[:, 0]
        k_b = self.param(
            "ca_backward", nn.initializers.lecun_normal(), (self.kernel_size, 1), jnp.float32
        )[:, 0]
        mid = self.kernel_size // 2
        y_f = nn.sigmoid(k_f[mid].astype(x.dtype) * s_mean)
        y_b = nn.sigmoid(k_b[mid].astype(x.dtype) * s_mean)
        cw = (y_f + y_b) / 2.0
        return x * sw * cw


class SebicaAttn(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        n = self.channels
        out = Conv2d(n * 2, 1, dtype=self.dtype, name="pre_0")(x)
        out = nn.relu(BatchNormNoStats(dtype=self.dtype, name="pre_bn0")(out, train))
        out = Conv2d(n, 3, dtype=self.dtype, name="pre_1")(out)
        out = nn.relu(BatchNormNoStats(dtype=self.dtype, name="pre_bn1")(out, train))
        out = BatchNormNoStats(dtype=self.dtype, name="norm1")(out, train)
        out = CSA(n, dtype=self.dtype, name="attn")(out)
        ffn = Conv2d(n * 2, 1, dtype=self.dtype, name="ffn_0")(out)
        ffn = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="ffn_bn0")(ffn, train), approximate=False)
        ffn = Conv2d(n, 1, dtype=self.dtype, name="ffn_1")(ffn)
        out = out + BatchNormNoStats(dtype=self.dtype, name="ffn_bn1")(ffn, train)
        out = BatchNormNoStats(dtype=self.dtype, name="norm2")(out, train)
        return out + x


class Sebica(nn.Module):
    scale: int = 4
    N: int = 16
    n_blocks: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        head = Conv2d(self.N, 3, dtype=self.dtype, name="head")(x)
        head = nn.relu(BatchNormNoStats(dtype=self.dtype, name="head_bn")(head, train))
        body = head
        for i in range(self.n_blocks):
            body = SebicaAttn(self.N, dtype=self.dtype, name=f"body_{i}")(body, train)
        out = Conv2d(3 * self.scale**2, 1, dtype=self.dtype, name="tail")(body)
        out = pixel_shuffle(out, self.scale)
        base = resize(x, (h * self.scale, w * self.scale), mode="bilinear", antialias=False)
        return (out + base).astype(jnp.float32)


@ARCH_REGISTRY.register(name="sebica")
def sebica(scale: int = 4, N: int = 16, **kw) -> Sebica:
    return Sebica(scale=scale, N=N, n_blocks=6, **kw)


@ARCH_REGISTRY.register(name="sebica_mini")
def sebica_mini(scale: int = 4, N: int = 8, **kw) -> Sebica:
    return Sebica(scale=scale, N=N, n_blocks=6, **kw)
