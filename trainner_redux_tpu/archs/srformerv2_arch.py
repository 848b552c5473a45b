"""SRFormerV2 — permuted self-attention v2 with decoupled squeeze dim
(flax/NHWC).

Parity: reference traiNNer/archs/srformerv2_arch.py:1325-1638 (SRFormerv2 +
srformerv2 factory): PSA where K/V compress each 2x2 group into one token
with channels folded into a decoupled squeeze_dim*4 width while Q keeps
full resolution; aligned relative position bias (permuted-window table
upsampled to full queries); dual-scale shift masks (full-res queries vs
half-res keys); ConvFFN with a 5x5 depthwise branch; SwinIR-style shell.
"""

from __future__ import annotations

import math

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


@functools.lru_cache(maxsize=64)
def _aligned_index(pws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(pws), np.arange(pws), indexing="ij"), 0)
    cf = coords.reshape(2, -1)
    rel = (cf[:, :, None] - cf[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += pws - 1
    rel[:, :, 1] += pws - 1
    rel[:, :, 0] *= 2 * pws - 1
    idx = rel.sum(-1)  # (pws^2, pws^2)
    idx = idx.reshape(pws, pws, 1, 1, pws * pws)
    idx = np.tile(idx, (1, 1, 2, 2, 1)).transpose(0, 2, 1, 3, 4)
    return idx.reshape(4 * pws * pws, pws * pws)


@functools.lru_cache(maxsize=64)
def _psa_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    if shift == 0:
        return None

    def labels(hh, ww, win, sh):
        img = np.zeros((hh, ww), np.float32)
        cnt = 0
        sl = (slice(0, -win), slice(-win, -sh), slice(-sh, None))
        for a in sl:
            for b in sl:
                img[a, b] = cnt
                cnt += 1
        m = img.reshape(hh // win, win, ww // win, win).transpose(0, 2, 1, 3)
        return m.reshape(-1, win * win)

    full = labels(h, w, ws, shift)
    perm = labels(h // 2, w // 2, ws // 2, shift // 2)
    attn = full[:, :, None] - perm[:, None, :]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class PSAv2(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    squeeze_dim: int = 45
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        # x: (B*nW, n, c)
        b_, n, c = x.shape
        ws = self.window_size
        pws = ws // 2
        nh = self.num_heads
        sq4 = self.squeeze_dim * 4
        hd = sq4 // nh

        kv = nn.Dense(self.squeeze_dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      param_dtype=jnp.float32, name="kv")(x)
        kv = kv.reshape(b_, pws, 2, pws, 2, 2, self.squeeze_dim)
        kv = kv.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b_, n // 4, 2, nh, hd)
        kv = kv.transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        q = nn.Dense(sq4, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, name="q")(x)
        q = q.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)

        scale = (self.dim // nh) ** -0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        table = self.param(
            "relative_position_bias_table", nn.initializers.truncated_normal(0.02),
            ((2 * pws - 1) ** 2, nh), jnp.float32,
        )
        idx = jnp.asarray(_aligned_index(pws))
        bias = table[idx.reshape(-1)].reshape(n, n // 4, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)
            attn = attn.reshape(b_ // nw, nw, nh, n, n // 4) + m[None, :, None]
            attn = attn.reshape(b_, nh, n, n // 4)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, sq4)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


@functools.lru_cache(maxsize=64)
def _swin_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    if shift == 0:
        return None
    img = np.zeros((h, w), np.float32)
    cnt = 0
    sl = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for a in sl:
        for b in sl:
            img[a, b] = cnt
            cnt += 1
    m = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    attn = m[:, :, None] - m[:, None, :]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class SwinBlockV2(nn.Module):
    """Plain Swin block (window 12, Mlp FFN) inserted at layer positions
    0/3/6 in the reference's BasicLayer (srformerv2_arch.py:996-1015)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift_size
        nh = self.num_heads
        hd = c // nh

        from trainner_redux_tpu.ops.pallas.fused_block import (
            fused_attn_block,
            fused_block_interpret,
            fused_block_supported,
            fused_ln_mlp,
        )

        hidden = int(self.dim * self.mlp_ratio)
        if nh * hd == c and fused_block_supported(h, w, ws, c, nh, hidden):
            # full fused-block path (same two kernels as swinir_arch
            # SwinBlock; this block's qkv/proj/bias live at block level,
            # not under an "attn" child — stubs mirror that tree)
            from trainner_redux_tpu.archs.fused_block_util import (
                DenseParams,
                LNParams,
            )
            from trainner_redux_tpu.archs.swinir_arch import (
                _relative_position_index,
            )
            from trainner_redux_tpu.ops.pallas.window_attention import (
                shift_mask_kinds,
            )

            n = ws * ws
            g1, be1 = LNParams(c, name="norm1")()
            wq, bq = DenseParams(c, 3 * c, True, name="qkv")()
            wp, bp = DenseParams(c, c, True, name="proj")()
            table = self.param(
                "relative_position_bias_table",
                nn.initializers.truncated_normal(0.02),
                ((2 * ws - 1) ** 2, nh),
                jnp.float32,
            )
            bias = jnp.take(
                table, jnp.asarray(_relative_position_index(ws)).reshape(-1), axis=0
            ).reshape(n, n, nh).transpose(2, 0, 1)
            if shift:
                masks = jnp.asarray(shift_mask_kinds(ws, shift))
                bias_kinds = bias[None] + masks[:, None]
            else:
                bias_kinds = bias[None]
            g2, be2 = LNParams(c, name="norm2")()
            w1, b1 = DenseParams(c, hidden, True, name="mlp_fc1")()
            w2, b2 = DenseParams(hidden, c, True, name="mlp_fc2")()
            ones = jnp.ones((b,), jnp.float32)
            interp = fused_block_interpret()
            xc = x.astype(self.dtype)
            if shift:
                xc = jnp.roll(xc, (-shift, -shift), axis=(1, 2))
            z = fused_attn_block(
                xc, g1, be1, wq, bq, wp, bp, bias_kinds, ones, nh, hd, ws,
                1e-5, interp,
            )
            if shift:
                z = jnp.roll(z, (shift, shift), axis=(1, 2))
            return fused_ln_mlp(z, g2, be2, w1, b1, w2, b2, ones, ws, 1e-5, interp)

        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        win = y.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(-1, ws * ws, c)
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(win)
        bw_, n, _ = win.shape
        qkv = qkv.reshape(bw_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param(
            "relative_position_bias_table", nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh), jnp.float32,
        )
        coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"), 0)
        cf = coords.reshape(2, -1)
        rel = (cf[:, :, None] - cf[:, None, :]).transpose(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        idx = rel.sum(-1)
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, nh).transpose(2, 0, 1)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        mask = _swin_mask(h, w, ws, shift)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw_ // nw, nw, nh, n, n) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(bw_, nh, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw_, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        y = out.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, h, w, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + z


class PSABlockV2(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    squeeze_dim: int
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        # the reference does NOT clamp the shift for small inputs (the usual
        # Swin clamp is commented out in PSA_Block, srformerv2_arch.py:703-707)
        shift = self.shift_size
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        win = y.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(-1, ws * ws, c)
        att = PSAv2(self.dim, ws, self.num_heads, self.squeeze_dim, dtype=self.dtype,
                    name="attn")(win, _psa_mask(h, w, ws, shift))
        y = att.reshape(b, h // ws, w // ws, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, h, w, c)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = z + nn.gelu(
            Conv2d(hidden, 5, feature_group_count=hidden, dtype=self.dtype,
                   name="mlp_dw")(z),
            approximate=False,
        )
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + z


class SRFormerV2(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 240
    depths: tuple = (4,) * 6
    num_heads: tuple = (8,) * 6
    window_size: int = 36
    squeeze_dim: int = 60
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    num_feat: int = 64
    img_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range
        # the reference's BasicLayer interleaves plain window-12 Swin blocks
        # at positions 0/3/6 among the PSA blocks (srformerv2_arch.py:996-1015);
        # the Swin window clamps to the configured img_size when smaller
        swin_ws = 12 if self.img_size > 12 else self.img_size
        # pad to a multiple BOTH window sizes divide: identical to the
        # reference for its configs (default ws=36 is already a multiple of
        # 12) and, unlike the reference, keeps window sizes that are not
        # multiples of 12 runnable instead of crashing at the hidden Swin
        # blocks' partition
        mult = self.window_size * swin_ws // math.gcd(self.window_size, swin_ws)
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        # patch_norm=True: LayerNorm after patch embedding
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="patch_norm")(feat)
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            group_in = body
            kinds: list = [("psa", 0 if i % 2 == 0 else self.window_size // 2)
                           for i in range(depth)]
            for pos in (0, 3, 6):
                kinds.insert(min(pos, len(kinds)), ("swin", 0))
            for bi, (kind, shift) in enumerate(kinds):
                if kind == "psa":
                    body = PSABlockV2(
                        self.embed_dim, heads, self.window_size, shift,
                        self.squeeze_dim, self.mlp_ratio, dtype=self.dtype,
                        name=f"layers_{li}_b{bi}",
                    )(body)
                else:
                    body = SwinBlockV2(
                        self.embed_dim, heads, swin_ws, shift, self.mlp_ratio,
                        dtype=self.dtype, name=f"layers_{li}_b{bi}",
                    )(body)
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name=f"layers_{li}_conv")(body)
            body = body + group_in
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        s = self.upscale
        if self.upsampler == "pixelshuffledirect":
            out = Conv2d(self.in_chans * s * s, 3, dtype=self.dtype, name="upsample")(feat)
            out = pixel_shuffle(out, s)
        else:
            y = nn.leaky_relu(Conv2d(self.num_feat, 3, dtype=self.dtype,
                                     name="conv_before_upsample")(feat), 0.01)
            r, stage = s, 0
            while r > 1:
                f = 3 if r % 3 == 0 else 2
                y = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype,
                           name=f"upsample_{stage}")(y)
                y = pixel_shuffle(y, f)
                r //= f
                stage += 1
            out = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(y)
        out = out / self.img_range + mean
        return out[:, : h0 * s, : w0 * s, :].astype(jnp.float32)


def _srformerv2_factory(scale: int = 4, **kwargs):
    for k in ("resi_connection", "use_checkpoint"):
        kwargs.pop(k, None)
    for k in ("depths", "num_heads"):
        if k in kwargs:
            kwargs[k] = tuple(kwargs[k])
    return SRFormerV2(upscale=scale, **kwargs)


ARCH_REGISTRY.register(_srformerv2_factory, name="srformerv2")
