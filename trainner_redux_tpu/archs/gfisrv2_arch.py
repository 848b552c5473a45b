"""GFISRv2 — gated Fourier-Inception SR (flax/NHWC).

Parity: reference traiNNer/archs/gfisrv2_arch.py:689-745 (GFISRV2): gated
CNN blocks whose Inception mixer rotates four branches per depth (FourierUnit
spectral mixing + square/band depthwise convs), SiLU activations, conv
refinement head, optional pixel-unshuffle input, UniUpsample tail. FFTs run
in fp32 with RMS pre/post norms.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    UniUpsampleV3,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.mosrv2_arch import ChannelRMSNorm
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class FourierUnit(nn.Module):
    ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))
        y = jnp.concatenate([f.real, f.imag], axis=-1).astype(x.dtype)  # (b,h,wf,2c)
        y = ChannelRMSNorm(2 * c, name="rn")(y)
        y = y + Conv2d(2 * c, 3, feature_group_count=2 * c, dtype=self.dtype,
                       name="fpe")(y)
        y = Conv2d(2 * self.ch, 1, padding=0, dtype=self.dtype, name="fdc")(y)
        y = nn.gelu(y, approximate=False)
        # the reference re-views the fdc output as (b, c, 2, h, wf)
        # (gfisrv2_arch.py:585): re/im are INTERLEAVED per channel here,
        # unlike the block layout on the way in
        re, im = y[..., 0::2], y[..., 1::2]
        out = jnp.fft.irfft2((re + 1j * im).astype(jnp.complex64), s=(h, w), axes=(1, 2))
        return ChannelRMSNorm(self.ch, name="post_norm")(out.astype(x.dtype))


class RotatingInception(nn.Module):
    """Four branches (Fourier / square dw / 1xK dw / Kx1 dw) rotated by
    `shift`, channel split rotated accordingly."""

    in_ch: int
    shift: int = 0
    square_kernel: int = 3
    band_kernel: int = 11
    branch_ratio: float = 0.125
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gc = int(self.in_ch * self.branch_ratio)
        idc = self.in_ch - 3 * gc
        sizes = [idc, gc, gc, gc]

        def make_branch(kind: int, ch: int, name: str):
            if kind == 0:
                return FourierUnit(ch, dtype=self.dtype, name=name)
            if kind == 1:
                return Conv2d(ch, self.square_kernel, feature_group_count=ch,
                              dtype=self.dtype, name=name)
            if kind == 2:
                return Conv2d(ch, (1, self.band_kernel), feature_group_count=ch,
                              dtype=self.dtype, name=name)
            return Conv2d(ch, (self.band_kernel, 1), feature_group_count=ch,
                          dtype=self.dtype, name=name)

        outs = []
        start = 0
        for slot in range(4):
            kind = (self.shift + slot) % 4
            ch = sizes[kind]
            sl = x[..., start : start + ch]
            start += ch
            outs.append(make_branch(kind, ch, f"branch_{slot}")(sl))
        return jnp.concatenate(outs, axis=-1)


class GatedCNNBlockF(nn.Module):
    dim: int
    expansion_ratio: float = 8 / 3
    shift: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.expansion_ratio * self.dim)
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        y = ChannelRMSNorm(self.dim, name="norm")(x)
        y = Conv2d(hidden * 2, 3, dtype=self.dtype, name="fc1")(y)
        g = y[..., :hidden]
        i = y[..., hidden : 2 * hidden - self.dim]
        c = y[..., 2 * hidden - self.dim :]
        c = RotatingInception(self.dim, self.shift, dtype=self.dtype, name="conv")(c)
        y = nn.silu(g) * jnp.concatenate([i, c], axis=-1)
        y = nn.silu(Conv2d(self.dim, 3, dtype=self.dtype, name="fc2")(y))
        return y * gamma.astype(x.dtype) + x


class GFISRV2(nn.Module):
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 3
    dim: int = 48
    expansion_ratio: float = 8 / 3
    upsampler: str = "pixelshuffledirect"
    mid_dim: int = 32
    pixel_unshuffle_mod: bool = False
    n_blocks: int = 24
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        scale = self.scale
        down = 0
        if self.pixel_unshuffle_mod and self.scale in (1, 2):
            down = 4 // self.scale
            scale = 4
        pad = down * 2 if down else 2
        ph, pw = (pad - h0 % pad) % pad, (pad - w0 % pad) % pad
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        if down:
            y = pixel_unshuffle(y, down)
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_dim")(y)
        feat = y
        for i in range(self.n_blocks):
            feat = GatedCNNBlockF(
                self.dim, self.expansion_ratio, shift=i, dtype=self.dtype,
                name=f"body_{i}",
            )(feat)
        feat = nn.silu(Conv2d(self.dim * 2, 3, dtype=self.dtype, name="refine_0")(feat))
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="refine_1")(feat)
        y = feat + y
        out = UniUpsampleV3(
            mode=self.upsampler, scale=scale, out_dim=self.out_nc,
            mid_dim=self.mid_dim, dtype=self.dtype, name="upscale",
        )(y)
        return out[:, : h0 * self.scale, : w0 * self.scale, :].astype(jnp.float32)


def _gfisr_factory(scale: int = 4, **kwargs):
    if "pixel_unshuffle" in kwargs:
        kwargs["pixel_unshuffle_mod"] = kwargs.pop("pixel_unshuffle")
    return GFISRV2(scale=scale, **kwargs)


ARCH_REGISTRY.register(_gfisr_factory, name="gfisrv2")
