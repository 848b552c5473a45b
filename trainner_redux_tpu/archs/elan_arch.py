"""ELAN — Efficient Long-range Attention Network (flax/NHWC).

Parity: /root/reference/traiNNer/archs/elan_arch.py (ShiftConv :28-108,
LFE :110, GMSA :139, ELAB :234, ELAN :310 with elan/elan_light presets):
channel-group shift convolutions, group multi-scale window self-attention
(q=v shared attention maps reusable across `n_share` following blocks).

TPU notes: the shift "conv" is expressed as zero-padded shifts on channel
groups + a 1x1 conv (pure data movement + GEMM) instead of a masked 3x3
conv; the window attention is einsum on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import BatchNormNoStats
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Zero-padded spatial shift: out[i,j] = x[i+dy, j+dx] (borders -> 0),
    matching the reference's fixed 3x3 shift conv (zero conv padding, NOT
    circular — ShiftConv2d1, elan_arch.py:56-85)."""
    z = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x.shape[1], x.shape[2]
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(z, 1 + dy, h, axis=1), 1 + dx, w, axis=2
    )


def _channel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """5-group spatial shift: left/right/up/down/identity (ShiftConv2d1)."""
    c = x.shape[-1]
    g = c // 5
    parts = [
        _shift2d(x[..., 0 * g : 1 * g], 0, 1),   # left (samples x+1)
        _shift2d(x[..., 1 * g : 2 * g], 0, -1),  # right
        _shift2d(x[..., 2 * g : 3 * g], 1, 0),   # up (samples y+1)
        _shift2d(x[..., 3 * g : 4 * g], -1, 0),  # down
        x[..., 4 * g :],
    ]
    return jnp.concatenate(parts, axis=-1)


class ShiftConv(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return Conv2d(self.out_channels, 1, dtype=self.dtype, name="conv1x1")(
            _channel_shift(x)
        )


class LFE(nn.Module):
    out_channels: int
    exp_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ShiftConv(self.out_channels * self.exp_ratio, dtype=self.dtype, name="conv0")(x)
        y = nn.relu(y)
        return ShiftConv(self.out_channels, dtype=self.dtype, name="conv1")(y)


def _win_attention(x2c: jnp.ndarray, wsize: int, prev_atn=None):
    """x2c: (B,H,W,2c) -> (y (B,H,W,c), atn). q=v shared window attention."""
    b, h, w, cc = x2c.shape
    c = cc // 2 if prev_atn is None else cc
    nwh, nww = h // wsize, w // wsize

    def part(v):
        v = v.reshape(b, nwh, wsize, nww, wsize, -1)
        return v.transpose(0, 1, 3, 2, 4, 5).reshape(b * nwh * nww, wsize * wsize, -1)

    if prev_atn is None:
        q = part(x2c[..., :c])
        v = part(x2c[..., c:])
        atn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, q, preferred_element_type=jnp.float32),
            axis=-1,
        ).astype(x2c.dtype)
    else:
        v = part(x2c)
        atn = prev_atn
    y = jnp.einsum("bnm,bmc->bnc", atn, v)
    y = y.reshape(b, nwh, nww, wsize, wsize, -1).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, h, w, -1), atn


class GMSA(nn.Module):
    channels: int
    shifts: int = 0
    window_sizes: tuple = (4, 8, 16)
    calc_attn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, prev_atns=None, train: bool = True):
        c = self.channels
        factor = 2 if self.calc_attn else 1
        y = Conv2d(c * factor, 1, dtype=self.dtype, name="project_inp")(x)
        y = BatchNormNoStats(dtype=self.dtype, name="bn")(y, train)
        split = c * factor // 3
        ys, atns = [], []
        for idx, wsize in enumerate(self.window_sizes):
            xi = y[..., idx * split : (idx + 1) * split]
            if self.shifts > 0:
                xi = jnp.roll(xi, (-wsize // 2, -wsize // 2), axis=(1, 2))
            yi, atn = _win_attention(
                xi, wsize, None if prev_atns is None else prev_atns[idx]
            )
            if self.shifts > 0:
                yi = jnp.roll(yi, (wsize // 2, wsize // 2), axis=(1, 2))
            ys.append(yi)
            atns.append(atn)
        out = Conv2d(c, 1, dtype=self.dtype, name="project_out")(
            jnp.concatenate(ys, axis=-1)
        )
        return out, atns


class ELAB(nn.Module):
    channels: int
    exp_ratio: int = 2
    shifts: int = 0
    window_sizes: tuple = (4, 8, 16)
    shared_depth: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        atn = None
        for i in range(1 + self.shared_depth):
            x = LFE(self.channels, self.exp_ratio, dtype=self.dtype, name=f"lfe_{i}")(x) + x
            y, atn = GMSA(
                self.channels, self.shifts, self.window_sizes, calc_attn=(i == 0),
                dtype=self.dtype, name=f"gmsa_{i}",
            )(x, None if i == 0 else atn, train)
            x = y + x
        return x


@ARCH_REGISTRY.register(name="elan")
class ELAN(nn.Module):
    scale: int = 4
    colors: int = 3
    rgb_range: int = 255
    norm: bool = False
    window_sizes: tuple = (4, 8, 16)
    m_elan: int = 36
    c_elan: int = 180
    n_share: int = 0
    r_expand: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        # pad to the LCM-ish multiple of all window sizes
        import math

        mult = math.lcm(*self.window_sizes)
        ph = (mult - in_h % mult) % mult
        pw = (mult - in_w % mult) % mult
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        if self.norm:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype) * self.rgb_range
            x = x - mean

        feat = Conv2d(self.c_elan, 3, dtype=self.dtype, name="head")(x)
        res = feat
        n_blocks = self.m_elan // (1 + self.n_share)
        for i in range(n_blocks):
            res = ELAB(
                self.c_elan, self.r_expand, 0 if (i + 1) % 2 == 1 else 1,
                tuple(self.window_sizes), self.n_share, dtype=self.dtype,
                name=f"body_{i}",
            )(res, train)
        res = res + feat
        out = Conv2d(
            self.colors * self.scale**2, 3, dtype=self.dtype, name="tail"
        )(res)
        out = pixel_shuffle(out, self.scale)
        if self.norm:
            out = out + mean
        return out[:, : in_h * self.scale, : in_w * self.scale, :].astype(jnp.float32)


@ARCH_REGISTRY.register(name="elan_light")
def elan_light(scale: int = 4, **kwargs) -> ELAN:
    kwargs.setdefault("m_elan", 24)
    kwargs.setdefault("c_elan", 60)
    kwargs.setdefault("n_share", 1)
    return ELAN(scale=scale, **kwargs)
