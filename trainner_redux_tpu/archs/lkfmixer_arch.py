"""LKFMixer — Large Kernel Feature Mixer (flax/NHWC).

Parity: /root/reference/traiNNer/archs/lkfmixer_arch.py:11-356 (PLKB
separable Kx1/1xK partial large-kernel convs, FFB fusion, FDB distillation,
SFMB spatial modulation, FSB selection; lkfmixer_t/b/l presets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.ops.resize import resize
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _gelu(x):
    return nn.gelu(x, approximate=False)


class PLKB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        sc = int(self.channels * self.split_factor)
        x1, x2 = x[..., :sc], x[..., sc:]
        k = self.large_kernel
        x1 = Conv2d(sc, (1, k), feature_group_count=sc, dtype=self.dtype, name="dw_1xk")(x1)
        x1 = Conv2d(sc, (k, 1), feature_group_count=sc, dtype=self.dtype, name="dw_kx1")(x1)
        out = jnp.concatenate([x1, x2], axis=-1)
        return _gelu(Conv2d(self.channels, 1, dtype=self.dtype, name="conv1")(out))


class FFB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = Conv2d(
            self.channels, 3, feature_group_count=self.channels, dtype=self.dtype,
            name="dw3",
        )(x)
        x2 = PLKB(self.channels, self.large_kernel, self.split_factor, dtype=self.dtype, name="plkb")(x)
        return _gelu(Conv2d(self.channels, 1, dtype=self.dtype, name="conv1")(x1 + x2))


class FDB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        args = (c, self.large_kernel, self.split_factor)
        d1 = _gelu(Conv2d(c // 2, 1, dtype=self.dtype, name="c1_d")(x))
        r1 = FFB(*args, dtype=self.dtype, name="c1_r")(x)
        d2 = _gelu(Conv2d(c // 2, 1, dtype=self.dtype, name="c2_d")(r1))
        r2 = FFB(*args, dtype=self.dtype, name="c2_r")(r1)
        d3 = _gelu(Conv2d(c // 2, 1, dtype=self.dtype, name="c3_d")(r2))
        r3 = FFB(*args, dtype=self.dtype, name="c3_r")(r2)
        r4 = _gelu(Conv2d(c // 2, 1, dtype=self.dtype, name="c4")(r3))
        out = jnp.concatenate([d1, d2, d3, r4], axis=-1)
        return Conv2d(c, 1, dtype=self.dtype, name="c5")(out)


class SFMB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        x1 = PLKB(c, self.large_kernel, self.split_factor, dtype=self.dtype, name="plkb")(x)
        x2_1 = nn.sigmoid(x.mean(axis=(1, 2), keepdims=True))
        # 8x max-pool -> dwconv -> 1x1 -> bilinear back
        h, w = x.shape[1], x.shape[2]
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge") if (ph or pw) else x
        pooled = jax.lax.reduce_window(
            xp, -jnp.inf, jax.lax.max, (1, 8, 8, 1), (1, 8, 8, 1), "VALID"
        )
        pooled = Conv2d(c, 3, feature_group_count=c, dtype=self.dtype, name="dw3")(pooled)
        pooled = _gelu(Conv2d(c, 1, dtype=self.dtype, name="conv1_1")(pooled))
        x2_2 = resize(pooled, (h, w), mode="bilinear", antialias=False)
        x2 = x2_1 * x2_2
        return _gelu(Conv2d(c, 1, dtype=self.dtype, name="conv1_2")(x1 + x2))


class FSB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        x1 = PLKB(c, self.large_kernel, self.split_factor, dtype=self.dtype, name="plkb")(x)
        x2 = Conv2d(c, 3, feature_group_count=c, dtype=self.dtype, name="dw3")(x)
        fused = _gelu(
            Conv2d(c, 1, dtype=self.dtype, name="conv1_1")(
                jnp.concatenate([x1, x2], axis=-1)
            )
        )
        weight = nn.sigmoid(fused)
        return x1 * weight + x2 * (1 - weight)


class FMB(nn.Module):
    channels: int
    large_kernel: int
    split_factor: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        args = (self.channels, self.large_kernel, self.split_factor)
        out = FDB(*args, dtype=self.dtype, name="fdb")(x)
        out = SFMB(*args, dtype=self.dtype, name="sfmb")(out)
        out = FSB(*args, dtype=self.dtype, name="fsb")(out)
        return out + x


class LKFMixer(nn.Module):
    in_channels: int = 3
    channels: int = 40
    out_channels: int = 3
    upscale: int = 4
    num_block: int = 6
    large_kernel: int = 31
    split_factor: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        ph = (8 - h % 8) % 8
        pw = (8 - w % 8) % 8
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        feat = Conv2d(self.channels, 3, dtype=self.dtype, name="conv_first")(x)
        out = feat
        for i in range(self.num_block):
            out = FMB(
                self.channels, self.large_kernel, self.split_factor,
                dtype=self.dtype, name=f"layers_{i}",
            )(out)
        out = _gelu(
            Conv2d(
                self.channels, 3, feature_group_count=self.channels, dtype=self.dtype,
                name="conv",
            )(out)
        )
        up = Conv2d(
            self.out_channels * self.upscale**2, 3, dtype=self.dtype, name="upsampler"
        )(out + feat)
        up = pixel_shuffle(up, self.upscale)
        return up[:, : h * self.upscale, : w * self.upscale, :].astype(jnp.float32)


def _lkf_factory(channels: int, num_block: int):
    def factory(scale: int = 4, in_channels: int = 3, channels: int = channels,
                out_channels: int = 3, num_block: int = num_block,
                large_kernel: int = 31, split_factor: float = 0.25, **kw) -> LKFMixer:
        return LKFMixer(
            in_channels=in_channels, channels=channels, out_channels=out_channels,
            upscale=scale, num_block=num_block, large_kernel=large_kernel,
            split_factor=split_factor, **kw,
        )

    return factory


ARCH_REGISTRY.register(_lkf_factory(40, 6), name="lkfmixer_t")
ARCH_REGISTRY.register(_lkf_factory(48, 8), name="lkfmixer_b")
ARCH_REGISTRY.register(_lkf_factory(64, 12), name="lkfmixer_l")
