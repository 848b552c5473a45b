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


def _conv1d_channels(y: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """ECA-style 1D conv across the channel axis; y: (B, C), kernel (k,)."""
    import jax

    k = kernel.shape[0]
    pad = (k - 1) // 2
    yp = jnp.pad(y[:, :, None], ((0, 0), (pad, pad), (0, 0)))
    return jax.lax.conv_general_dilated(
        yp, kernel[:, None, None], (1,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )[:, :, 0]


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
        y = x.mean(axis=(1, 2))  # (B, C)
        k_f = self.param(
            "ca_forward", nn.initializers.lecun_normal(), (self.kernel_size, 1), jnp.float32
        )[:, 0]
        k_b = self.param(
            "ca_backward", nn.initializers.lecun_normal(), (self.kernel_size, 1), jnp.float32
        )[:, 0]
        y_f = nn.sigmoid(_conv1d_channels(y, k_f.astype(y.dtype)))
        y_b = nn.sigmoid(_conv1d_channels(y[:, ::-1], k_b.astype(y.dtype)))[:, ::-1]
        cw = ((y_f + y_b) / 2.0)[:, None, None, :]
        return x * sw * cw


class SebicaAttn(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.channels
        out = Conv2d(n * 2, 1, dtype=self.dtype, name="pre_0")(x)
        out = nn.relu(BatchNormNoStats(dtype=self.dtype, name="pre_bn0")(out))
        out = Conv2d(n, 3, dtype=self.dtype, name="pre_1")(out)
        out = nn.relu(BatchNormNoStats(dtype=self.dtype, name="pre_bn1")(out))
        out = BatchNormNoStats(dtype=self.dtype, name="norm1")(out)
        out = CSA(n, dtype=self.dtype, name="attn")(out)
        ffn = Conv2d(n * 2, 1, dtype=self.dtype, name="ffn_0")(out)
        ffn = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="ffn_bn0")(ffn), approximate=False)
        ffn = Conv2d(n, 1, dtype=self.dtype, name="ffn_1")(ffn)
        out = out + BatchNormNoStats(dtype=self.dtype, name="ffn_bn1")(ffn)
        out = BatchNormNoStats(dtype=self.dtype, name="norm2")(out)
        return out + x


class Sebica(nn.Module):
    scale: int = 4
    N: int = 16
    n_blocks: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        head = Conv2d(self.N, 3, dtype=self.dtype, name="head")(x)
        head = nn.relu(BatchNormNoStats(dtype=self.dtype, name="head_bn")(head))
        body = head
        for i in range(self.n_blocks):
            body = SebicaAttn(self.N, dtype=self.dtype, name=f"body_{i}")(body)
        out = Conv2d(3 * self.scale**2, 1, dtype=self.dtype, name="tail")(body)
        out = pixel_shuffle(out, self.scale)
        base = resize(x, (h * self.scale, w * self.scale), mode="bilinear", antialias=False)
        return (out + base).astype(jnp.float32)


@ARCH_REGISTRY.register(name="sebica")
def sebica(scale: int = 4, N: int = 16, **kw) -> Sebica:
    return Sebica(scale=scale, N=N, n_blocks=6, **kw)


@ARCH_REGISTRY.register(name="sebica_mini")
def sebica_mini(scale: int = 4, N: int = 8, **kw) -> Sebica:
    return Sebica(scale=scale, N=N, n_blocks=4, **kw)
