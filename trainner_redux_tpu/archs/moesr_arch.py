"""MoESR2 — "Mamba-out Excitation SR": gated CNN blocks + multi-scale gate
(flax/NHWC).

Parity: reference traiNNer/archs/moesr_arch.py:147-190 (MoESR2): channel-first
LayerNorm, MambaOut GatedCNNBlock with InceptionDWConv2d token mixer (split
into identity / square dw / 1xK band / Kx1 band branches), MSG down-gate-up
residual, UniUpsample tail (conv / pixelshuffledirect / pixelshuffle /
nearest+conv / dysample — reference arch_util.py UniUpsample).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    DySample,
    Dtype,
    mish,
    pixel_shuffle,
    pixel_unshuffle,
)
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis only (torch MoESR LayerNorm)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        u = xf.mean(axis=-1, keepdims=True)
        s = jnp.square(xf - u).mean(axis=-1, keepdims=True)
        xn = (xf - u) / jnp.sqrt(s + self.eps)
        return (w * xn + b).astype(x.dtype)


class InceptionDWConv2d(nn.Module):
    in_ch: int
    square_kernel: int = 3
    band_kernel: int = 11
    branch_ratio: float = 0.125
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gc = int(self.in_ch * self.branch_ratio)
        idc = self.in_ch - 3 * gc
        x_id = x[..., :idc]
        x_hw = x[..., idc : idc + gc]
        x_w = x[..., idc + gc : idc + 2 * gc]
        x_h = x[..., idc + 2 * gc :]
        y_hw = Conv2d(
            gc, self.square_kernel, feature_group_count=gc, dtype=self.dtype,
            name="dwconv_hw",
        )(x_hw)
        y_w = Conv2d(
            gc, (1, self.band_kernel), feature_group_count=gc, dtype=self.dtype,
            name="dwconv_w",
        )(x_w)
        y_h = Conv2d(
            gc, (self.band_kernel, 1), feature_group_count=gc, dtype=self.dtype,
            name="dwconv_h",
        )(x_h)
        return jnp.concatenate([x_id, y_hw, y_w, y_h], axis=-1)


class GatedCNNBlock(nn.Module):
    dim: int
    expansion_ratio: float = 8 / 3
    conv_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        hidden = int(self.expansion_ratio * self.dim)
        conv_ch = int(self.conv_ratio * self.dim)
        y = ChannelLayerNorm(self.dim, name="norm")(x)
        y = Conv2d(hidden * 2, 3, dtype=self.dtype, name="fc1")(y)
        g = y[..., :hidden]
        i = y[..., hidden : 2 * hidden - conv_ch]
        c = y[..., 2 * hidden - conv_ch :]
        c = InceptionDWConv2d(conv_ch, dtype=self.dtype, name="conv")(c)
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="fc2")(mish(g) * jnp.concatenate([i, c], axis=-1))
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return mish(y) * gamma.astype(x.dtype) + shortcut


class MSG(nn.Module):
    """Down 2x -> 3 gated blocks -> up 2x, residual."""

    dim: int
    expansion_msg: float = 1.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.dim // 4, 3, dtype=self.dtype, name="down_conv")(x)
        y = pixel_unshuffle(y, 2)
        y = nn.leaky_relu(y, 0.1)
        for k in range(3):
            y = GatedCNNBlock(
                self.dim, self.expansion_msg, dtype=self.dtype, name=f"gated_{k}"
            )(y)
        y = Conv2d(self.dim * 4, 3, dtype=self.dtype, name="up_conv")(y)
        y = pixel_shuffle(y, 2)
        y = nn.leaky_relu(y, 0.1)
        return y + x


class UniUpsample(nn.Module):
    """Reference arch_util.py:231-300 UniUpsample (V1).

    conv / pixelshuffledirect / pixelshuffle / nearest+conv are identical to
    UniUpsampleV3 (golden-validated), so those modes delegate to it — this
    also fixes two V1 bugs vs the reference (missing LeakyReLU after the
    pixelshuffle pre-conv; nearest+conv must conv at low resolution BEFORE
    the nearest upsample). V1 dysample has no mid-dim pre-conv: it applies
    DySample on in_dim directly (reference arch_util.py:294-295).
    """

    mode: str
    scale: int
    dim: int
    out_ch: int
    mid_dim: int = 64
    group: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        if self.mode == "dysample" and self.scale != 1:
            return DySample(
                x.shape[-1], self.out_ch, self.scale, self.group,
                dtype=self.dtype, name="c0",
            )(x)
        from trainner_redux_tpu.archs.arch_util import UniUpsampleV3

        inner = UniUpsampleV3(
            mode=self.mode, scale=self.scale, out_dim=self.out_ch,
            mid_dim=self.mid_dim, group=self.group, dtype=self.dtype,
        )
        nn.share_scope(self, inner)  # params live directly under this module
        return inner(x)


class MoESR2(nn.Module):
    scale: int = 4
    in_ch: int = 3
    out_ch: int = 3
    dim: int = 64
    n_blocks: int = 9
    n_block: int = 4
    expansion_factor: float = 8 / 3
    expansion_msg: float = 1.5
    upsampler: str = "pixelshuffledirect"
    upsample_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        scale = 1 if self.upsampler == "conv" else self.scale
        ph, pw = (2 - h0 % 2) % 2, (2 - w0 % 2) % 2
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_dim")(y)
        feat = y
        for bi in range(self.n_blocks):
            for k in range(self.n_block):
                feat = GatedCNNBlock(
                    self.dim, self.expansion_factor, dtype=self.dtype,
                    name=f"blocks_{bi}_g{k}",
                )(feat)
            feat = MSG(
                self.dim, self.expansion_msg, dtype=self.dtype, name=f"blocks_{bi}_msg"
            )(feat)
        y = feat + y
        out = UniUpsample(
            self.upsampler, scale, self.dim, self.out_ch, self.upsample_dim,
            dtype=self.dtype, name="upscale",
        )(y, train)
        return out[:, : h0 * scale, : w0 * scale, :].astype(jnp.float32)


def _moesr_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return MoESR2(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_moesr_factory(), name="moesr2")
