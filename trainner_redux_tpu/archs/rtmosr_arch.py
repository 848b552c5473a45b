"""RTMoSR — real-time gated-CNN SR with heavy re-parameterization (flax/NHWC).

Parity: reference traiNNer/archs/rtmosr_arch.py:389-492 (RTMoSR +
rtmosr_l/rtmosr_ul factories): RepConv (SeqConv3x3 + plain 3x3 + Conv3XC,
alpha-blended; fused to one 3x3 at eval), OmniShift (identity + depthwise
1x1/3x3/5x5, fused to one depthwise 5x5 at eval), MambaOut-style
GatedCNNBlock with RMSNorm, ParPixelUnshuffle branch and CSE channel
attention, optional input pixel-unshuffle (unshuffle_mod), bilinear-free
nearest residual via F.interpolate default.

TPU notes: re-param fusion composes kernels with einsums at trace time —
the eval graph is literally one conv per RepConv/OmniShift; the train graph
keeps the decomposed branches for their optimization dynamics.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    mish,
    pixel_shuffle,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.span_arch import Conv3XC
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _dwconv(x, w, b):
    """Depthwise conv, w: (k, k, 1, C) HWIO with groups=C."""
    import jax.lax as lax

    k = w.shape[0]
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )
    return y + b.astype(x.dtype)


class SeqConv3x3(nn.Module):
    """1x1 -> (pad borders with the 1x1 bias) -> 3x3 VALID; fuses to one 3x3."""

    in_ch: int
    out_ch: int
    depth_multiplier: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        mid = int(self.out_ch * self.depth_multiplier)
        k0 = self.param("k0", nn.initializers.truncated_normal(0.02), (1, 1, self.in_ch, mid), jnp.float32)
        b0 = self.param("b0", nn.initializers.zeros, (mid,), jnp.float32)
        k1 = self.param("k1", nn.initializers.truncated_normal(0.02), (3, 3, mid, self.out_ch), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        if train:
            y0 = jnp.einsum("bhwc,cm->bhwm", x, k0[0, 0].astype(x.dtype)) + b0.astype(x.dtype)
            y0 = jnp.pad(y0, ((0, 0), (1, 1), (1, 1), (0, 0)))
            border = jnp.pad(
                jnp.ones(y0.shape[1:3], x.dtype)[None, :, :, None] * 0,
                ((0, 0), (0, 0), (0, 0), (0, 0)),
            )
            mask = jnp.zeros((y0.shape[1], y0.shape[2]), x.dtype)
            mask = mask.at[0, :].set(1).at[-1, :].set(1).at[:, 0].set(1).at[:, -1].set(1)
            y0 = y0 + mask[None, :, :, None] * b0.astype(x.dtype)
            del border
            import jax.lax as lax

            return lax.conv_general_dilated(
                y0, k1.astype(x.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b1.astype(x.dtype)
        # fused 3x3: compose 1x1 into 3x3 (reference rep_params, rtmosr_arch.py:175)
        rk = jnp.einsum("im,hwmo->hwio", k0[0, 0], k1)
        rb = jnp.einsum("m,hwmo->o", b0, k1) + b1
        import jax.lax as lax

        return lax.conv_general_dilated(
            x, rk.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + rb.astype(x.dtype)


class RepConv(nn.Module):
    in_ch: int
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (3,), jnp.float32)
        a = alpha.astype(x.dtype)
        x1 = SeqConv3x3(self.in_ch, self.out_ch, 2, name="conv1")(x, train)
        x2 = Conv2d(self.out_ch, 3, dtype=self.dtype, name="conv2")(x)
        # reference rtmosr Conv3XC defaults to gain=2 (rtmosr_arch.py:46)
        x3 = Conv3XC(self.in_ch, self.out_ch, gain=2, dtype=self.dtype, name="conv3")(x, train)
        return a[0] * x1 + a[1] * x2 + a[2] * x3


class OmniShift(nn.Module):
    """identity + depthwise 1x1/3x3/5x5, alpha-blended; one dw 5x5 at eval."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        d = self.dim
        init = nn.initializers.truncated_normal(0.02)
        k1 = self.param("k1", init, (1, 1, 1, d), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros, (d,), jnp.float32)
        k3 = self.param("k3", init, (3, 3, 1, d), jnp.float32)
        b3 = self.param("b3", nn.initializers.zeros, (d,), jnp.float32)
        k5 = self.param("k5", init, (5, 5, 1, d), jnp.float32)
        b5 = self.param("b5", nn.initializers.zeros, (d,), jnp.float32)
        a1 = self.param("alpha1", nn.initializers.ones, (d,), jnp.float32)
        a2 = self.param("alpha2", nn.initializers.ones, (d,), jnp.float32)
        a3 = self.param("alpha3", nn.initializers.ones, (d,), jnp.float32)
        a4 = self.param("alpha4", nn.initializers.ones, (d,), jnp.float32)
        if train:
            out = (
                a1.astype(x.dtype) * x
                + a2.astype(x.dtype) * _dwconv(x, k1, b1)
                + a3.astype(x.dtype) * _dwconv(x, k3, b3)
                + a4.astype(x.dtype) * _dwconv(x, k5, b5)
            )
            return out
        ident = jnp.zeros((5, 5, 1, d)).at[2, 2, 0].set(1.0)
        fused_w = (
            a1 * ident
            + a2 * jnp.pad(k1, ((2, 2), (2, 2), (0, 0), (0, 0)))
            + a3 * jnp.pad(k3, ((1, 1), (1, 1), (0, 0), (0, 0)))
            + a4 * k5
        )
        fused_b = a2 * b1 + a3 * b3 + a4 * b5
        return _dwconv(x, fused_w, fused_b)


class CSELayer(nn.Module):
    dim: int
    reduction: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = Conv2d(max(1, self.dim // self.reduction), 1, padding=0, dtype=self.dtype, name="fc1")(z)
        z = nn.relu(z)
        z = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fc2")(z)
        return x * nn.hard_sigmoid(z)


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        offset = self.param("offset", nn.initializers.zeros, (self.dim,), jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True))
        xn = x / (rms + self.eps).astype(x.dtype)
        return scale.astype(x.dtype) * xn + offset.astype(x.dtype)


class ParPixelUnshuffle(nn.Module):
    in_dim: int
    out_dim: int
    down: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        pu = pixel_unshuffle(x, self.down)
        d = self.down
        pooled = nn.max_pool(x, (d, d), strides=(d, d))
        return pu + RepConv(self.in_dim, self.out_dim, dtype=self.dtype, name="poll")(pooled, train)


class GatedCNNBlock(nn.Module):
    dim: int
    expansion_ratio: float = 8 / 3
    conv_ratio: float = 1.0
    dccm: bool = True
    se: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        shortcut = x
        hidden = int(self.expansion_ratio * self.dim)
        conv_ch = int(self.conv_ratio * self.dim)
        y = RMSNorm(self.dim, name="norm")(x)
        y = RepConv(self.dim, hidden * 2, dtype=self.dtype, name="fc1")(y, train)
        g = y[..., :hidden]
        i = y[..., hidden : 2 * hidden - conv_ch]
        c = y[..., 2 * hidden - conv_ch :]
        c = ParPixelUnshuffle(self.dim, self.dim * 4, 2, dtype=self.dtype, name="conv_pu")(c, train)
        c = OmniShift(self.dim * 4, name="conv_shift")(c, train)
        if self.se:
            c = CSELayer(self.dim * 4, dtype=self.dtype, name="conv_se")(c)
        c = pixel_shuffle(c, 2)
        y = mish(g) * jnp.concatenate([i, c], axis=-1)
        if self.dccm:
            y = RepConv(hidden, self.dim, dtype=self.dtype, name="fc2")(y, train)
        else:
            y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fc2")(y)
        return mish(y) + shortcut


class RTMoSR(nn.Module):
    scale: int = 2
    dim: int = 32
    ffn_expansion: float = 2.0
    n_blocks: int = 2
    unshuffle_mod: bool = False
    dccm: bool = True
    se: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        scale = self.scale
        unshuffle = 0
        if self.scale < 4 and self.unshuffle_mod:
            if self.scale == 3:
                raise ValueError("unshuffle_mod does not support 3x")
            unshuffle = 4 // self.scale
            scale = 4
        pad_mult = (unshuffle if unshuffle else 1) * 2
        ph = (pad_mult - h0 % pad_mult) % pad_mult
        pw = (pad_mult - w0 % pad_mult) % pad_mult
        out = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        if unshuffle:
            out = pixel_unshuffle(out, unshuffle)
        out = RepConv(out.shape[-1], self.dim, dtype=self.dtype, name="to_feat")(out, train)
        for bi in range(self.n_blocks):
            out = GatedCNNBlock(
                self.dim, self.ffn_expansion, dccm=self.dccm, se=self.se,
                dtype=self.dtype, name=f"body_{bi}",
            )(out, train)
        out = RepConv(self.dim, 3 * scale**2, dtype=self.dtype, name="to_img")(out, train)
        out = pixel_shuffle(out, scale)
        out = out[:, : h0 * self.scale, : w0 * self.scale, :]
        up = jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)
        return (out + up).astype(jnp.float32)


def _rtmosr_factory(**defaults):
    def factory(scale: int = 2, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return RTMoSR(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_rtmosr_factory(unshuffle_mod=False, se=True), name="rtmosr")
ARCH_REGISTRY.register(
    _rtmosr_factory(unshuffle_mod=True, dccm=True, se=True, ffn_expansion=2.0),
    name="rtmosr_l",
)
ARCH_REGISTRY.register(
    _rtmosr_factory(unshuffle_mod=True, dccm=False, se=True, ffn_expansion=1.5),
    name="rtmosr_ul",
)
