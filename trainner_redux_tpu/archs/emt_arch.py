"""EMT — Efficient Mixed Transformer SR (flax/NHWC).

Parity: reference traiNNer/archs/emt_arch.py:567-633 (EMT): DF2K mean
shift, mixed transformer blocks where the first n_GTLs layers per block use
striped-window self-attention (SWSA: q/v from a 1x1 conv + batch-norm,
attention weights from q·qᵀ, channel-split across (32,8)/(8,32) windows
with alternating shifts) and the rest use PixelMixer token mixing
(circular 4-direction pixel shifts, batch-normed residual); Shift-Conv 1x1
MLPs with Swish; pixelshuffle tail.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import BatchNormNoStats
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY

_DF2K_MEAN = (0.4690, 0.4490, 0.4036)


def _shift_mask(c: int, mode: str = "+") -> np.ndarray:
    """ShiftConv2d1x1 fixed depthwise mask (3,3,1,C HWIO)."""
    m = np.zeros((3, 3, 1, c), np.float32)
    g = c // 5
    if mode == "+":
        pos = [(1, 2), (1, 0), (2, 1), (0, 1)]
    else:
        pos = [(0, 0), (0, 2), (2, 0), (2, 2)]
    for i, (r, cc) in enumerate(pos):
        m[r, cc, 0, i * g : (i + 1) * g] = 1.0
    m[1, 1, 0, 4 * g :] = 1.0
    return m


def _mixer_mask(c: int, margin: int = 1) -> np.ndarray:
    """PixelMixer fixed depthwise mask (k,k,1,C HWIO), interleaved groups."""
    k = 2 * margin + 1
    m = np.zeros((k, k, 1, c), np.float32)
    m[0, margin, 0, 3::5] = 1.0
    m[-1, margin, 0, 2::5] = 1.0
    m[margin, 0, 0, 1::5] = 1.0
    m[margin, -1, 0, 0::5] = 1.0
    m[margin, margin, 0, 4::5] = 1.0
    return m


def _dw_fixed(x: jnp.ndarray, mask: np.ndarray, pad_mode: str) -> jnp.ndarray:
    k = mask.shape[0]
    p = k // 2
    if pad_mode == "wrap":
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="wrap")
        padding = "VALID"
    else:
        padding = [(p, p), (p, p)]
    return lax.conv_general_dilated(
        x, jnp.asarray(mask, x.dtype), (1, 1), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=x.shape[-1],
    )


class ShiftConvMlp(nn.Module):
    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = _dw_fixed(x, _shift_mask(x.shape[-1]), "zero")
        y = Conv2d(self.hidden, 1, padding=0, dtype=self.dtype, name="fc1")(y)
        y = nn.silu(y)  # Swish
        y = _dw_fixed(y, _shift_mask(self.hidden), "zero")
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fc2")(y)


class SWSA(nn.Module):
    """Striped-window self-attention: weights from q·qᵀ over q/v pairs."""

    dim: int
    num_heads: int
    window_list: tuple = ((32, 8), (8, 32))
    shift_list: tuple | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        qkv = Conv2d(c * 2, 1, padding=0, dtype=self.dtype, name="attn_conv")(x)
        qkv = BatchNormNoStats(dtype=self.dtype, name="attn_bn")(qkv, train)
        n_win = len(self.window_list)
        per = 2 * c // n_win
        outs = []
        for wi, wsz in enumerate(self.window_list):
            sl = qkv[..., wi * per : (wi + 1) * per]
            wh, ww = wsz
            shift = self.shift_list[wi] if self.shift_list is not None else (0, 0)
            ph, pw = (wh - h % wh) % wh, (ww - w % ww) % ww
            if ph or pw:
                sl = jnp.pad(sl, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            if shift != (0, 0):
                sl = jnp.roll(sl, shift, axis=(1, 2))
            hp, wp = sl.shape[1], sl.shape[2]
            nh = self.num_heads
            cs = per // 2  # channels per q/v slice
            hd = cs // nh
            # (b, nh*wh, nw*ww, 2*nh*hd) -> windows
            sl = sl.reshape(b, hp // wh, wh, wp // ww, ww, 2, nh, hd)
            sl = sl.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(
                2, -1, wh * ww, hd
            )
            q, v = sl[0], sl[1]
            attn = jnp.einsum("bnc,bmc->bnm", q, q, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bnm,bmc->bnc", attn, v)
            out = out.reshape(b, hp // wh, wp // ww, nh, wh, ww, hd)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, cs)
            if shift != (0, 0):
                out = jnp.roll(out, (-shift[0], -shift[1]), axis=(1, 2))
            outs.append(out[:, :h, :w, :])
        y = jnp.concatenate(outs, axis=-1)
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="proj")(y)


class TokenMixer(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        y = _dw_fixed(x, _mixer_mask(x.shape[-1]), "wrap") - x
        return BatchNormNoStats(dtype=self.dtype, name="norm")(y, train)


class EMT(nn.Module):
    scale: int = 4
    num_in_ch: int = 3
    num_out_ch: int = 3
    upsampler: str = "pixelshuffle"
    dim: int = 60
    n_blocks: int = 6
    n_layers: int = 6
    num_heads: int = 3
    mlp_ratio: int = 2
    n_gtls: int = 2
    window_list: tuple = ((32, 8), (8, 32))
    shift_list: tuple = ((16, 4), (4, 16))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        # reference MeanShift hardcodes rgb_range=255 (emt_arch.py:585-586):
        # sub_mean(x) = x - 255*mean even though inputs are 0-1
        mean = jnp.asarray(_DF2K_MEAN, x.dtype) * 255.0
        y = x - mean
        head = Conv2d(self.dim, 3, dtype=self.dtype, name="head")(y)
        body = head
        for bi in range(self.n_blocks):
            for li in range(self.n_layers):
                if li > self.n_gtls - 1:
                    sa = TokenMixer(self.dim, dtype=self.dtype,
                                    name=f"body_{bi}_sa{li}")
                    body = body + sa(body, train)
                else:
                    sa = SWSA(
                        self.dim, self.num_heads, tuple(map(tuple, self.window_list)),
                        tuple(map(tuple, self.shift_list)) if (li + 1) % 2 == 0 else None,
                        dtype=self.dtype, name=f"body_{bi}_sa{li}",
                    )
                    body = body + sa(body, train)
                body = body + ShiftConvMlp(
                    self.dim, self.dim * self.mlp_ratio, dtype=self.dtype,
                    name=f"body_{bi}_mlp{li}",
                )(body)
        body = body + head

        if self.upsampler == "pixelshuffledirect":
            out = Conv2d(self.num_out_ch * self.scale**2, 3, dtype=self.dtype,
                         name="tail")(body)
            out = pixel_shuffle(out, self.scale)
        else:
            s, stage = self.scale, 0
            while s > 1:
                f = 3 if s % 3 == 0 else 2
                body = Conv2d(self.dim * f * f, 3, dtype=self.dtype,
                              name=f"tail_{stage}")(body)
                body = pixel_shuffle(body, f)
                s //= f
                stage += 1
            out = Conv2d(self.num_out_ch, 3, dtype=self.dtype, name="tail_last")(body)
        return (out + mean).astype(jnp.float32)


def _emt_factory(scale: int = 4, **kwargs):
    if "n_GTLs" in kwargs:
        kwargs["n_gtls"] = kwargs.pop("n_GTLs")
    for k in ("window_list", "shift_list"):
        if k in kwargs:
            kwargs[k] = tuple(tuple(v) for v in kwargs[k])
    return EMT(scale=scale, **kwargs)


ARCH_REGISTRY.register(_emt_factory, name="emt")
