"""HiT family — Hierarchical Transformer SR (HiT-SIR / HiT-SNG / HiT-SRF),
flax/NHWC.

Parity: reference traiNNer/archs/hit_sir_arch.py:810-1110 (+ hit_sng/srf
siblings): spatial-channel correlation (SCC) attention — q/v from a gated
dual-feature extractor, spatial branch correlates queries against
base-window-pooled values (learned pooling + dynamic relative position bias
MLP averaged over pooled offsets, NO softmax), channel branch does C x C
correlation; per-depth hierarchical window sizes (base * [0.5,1,2,4,6,8]);
post-norm block layout (norm after correlation and after FFN). Variants:
SIR/SNG use the plain MLP FFN (SNG pads attn dims to head multiples), SRF
uses a ConvFFN with a 5x5 depthwise branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class DFE(nn.Module):
    """Dual feature extraction: bottleneck conv gate * linear projection."""

    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        c = x.shape[-1]
        mid = max(1, c // 5)
        y = nn.leaky_relu(Conv2d(mid, 1, padding=0, dtype=self.dtype, name="conv0")(x), 0.2)
        y = nn.leaky_relu(Conv2d(mid, 3, dtype=self.dtype, name="conv1")(y), 0.2)
        y = Conv2d(self.out_features, 1, padding=0, dtype=self.dtype, name="conv2")(y)
        lin = Conv2d(self.out_features, 1, padding=0, dtype=self.dtype, name="linear")(x)
        return y * lin


class DynamicPosBias(nn.Module):
    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, biases: jnp.ndarray) -> jnp.ndarray:
        pd = self.dim // 4
        y = nn.Dense(pd, dtype=self.dtype, param_dtype=jnp.float32, name="pos_proj")(biases)
        for i in (1, 2):
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"pos{i}_ln")(y)
            y = nn.Dense(pd, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"pos{i}_fc")(nn.relu(y))
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="pos3_ln")(y)
        return nn.Dense(self.num_heads, dtype=self.dtype, param_dtype=jnp.float32,
                        name="pos3_fc")(nn.relu(y))


class NGramWindowAttention(nn.Module):
    """Plain Swin W-MSA over ngram x ngram context tokens (hit_sng_arch
    NGramWindowAttention, :372-487)."""

    dim: int
    num_heads: int
    window: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bw, n, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * self.window[0] - 1) * (2 * self.window[1] - 1), nh), jnp.float32,
        )
        idx = _rel_index(self.window[0], self.window[1])
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(n, n, nh).transpose(2, 0, 1)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class NGramContext(nn.Module):
    """Bidirectional 2-gram window context (hit_sng_arch.py:488-619)."""

    dim: int
    window: tuple
    ngram: int
    num_heads: int
    dtype: Dtype = jnp.float32

    def _seq_refl_pad(self, u: jnp.ndarray, back: bool) -> jnp.ndarray:
        # u: (B, wh, ww, D/2); ngram=2 -> pad one row/col, filled by the
        # reflected interior (seq_refl_win_pad)
        g = self.ngram
        if g == 1:
            return u
        if not back:
            u = jnp.pad(u, ((0, 0), (0, g - 1), (0, g - 1), (0, 0)))
            u = u.at[:, -(g - 1):, :, :].set(u[:, -2 * g + 1 : -g, :, :])
            u = u.at[:, :, -(g - 1):, :].set(u[:, :, -2 * g + 1 : -g, :])
        else:
            u = jnp.pad(u, ((0, 0), (g - 1, 0), (g - 1, 0), (0, 0)))
            u = u.at[:, : g - 1, :, :].set(u[:, g : 2 * g - 1, :, :])
            u = u.at[:, :, : g - 1, :].set(u[:, :, g : 2 * g - 1, :])
        return u

    def _sliding_attn(self, u: jnp.ndarray, attn: nn.Module) -> jnp.ndarray:
        # u: (B, wh+g-1, ww+g-1, D/2) -> per-window g x g context tokens
        g = self.ngram
        b, hp, wp, d = u.shape
        wh, ww = hp - g + 1, wp - g + 1
        # gather sliding windows: out[i*g+a, j*g+b] = u[i+a, j+b]
        rows = (np.arange(wh)[:, None] + np.arange(g)[None, :]).reshape(-1)
        cols = (np.arange(ww)[:, None] + np.arange(g)[None, :]).reshape(-1)
        slide = u[:, rows][:, :, cols]  # (B, wh*g, ww*g, D/2)
        win = slide.reshape(b, wh, g, ww, g, d).transpose(0, 1, 3, 2, 4, 5)
        win = win.reshape(b * wh * ww, g * g, d)
        ctx = attn(win).reshape(b, wh, ww, g, g, d)
        return ctx.mean(axis=(3, 4))  # AvgPool(g) over the context tokens

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, ph, pw, D) -> (B, wh, ww, D) context per window
        b, ph, pw, d = x.shape
        wh, ww = ph // self.window[0], pw // self.window[1]
        uni_k = self.param(
            "unigram_kernel", nn.initializers.lecun_normal(),
            (self.window[0], self.window[1], 2, 1), jnp.float32,
        )
        uni_b = self.param("unigram_bias", nn.initializers.zeros, (1,), jnp.float32)
        # channel pairs (2j, 2j+1) -> one unigram map each
        xp = x.reshape(b, ph, pw, d // 2, 2)
        xp = xp.transpose(0, 3, 1, 2, 4).reshape(b * (d // 2), ph, pw, 2)
        import jax.lax as lax

        uni = lax.conv_general_dilated(
            xp, uni_k.astype(x.dtype), (self.window[0], self.window[1]), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + uni_b.astype(x.dtype)
        uni = uni.reshape(b, d // 2, wh, ww).transpose(0, 2, 3, 1)  # (B, wh, ww, D/2)

        attn = NGramWindowAttention(
            d // 2, self.num_heads, (self.ngram, self.ngram), dtype=self.dtype,
            name="ngram_attn",
        )
        fwd = self._sliding_attn(self._seq_refl_pad(uni, False), attn)
        bwd = self._sliding_attn(self._seq_refl_pad(uni, True), attn)
        ctx = jnp.concatenate([fwd, bwd], axis=-1)  # (B, wh, ww, D)
        ctx = Conv2d(d, 1, padding=0, dtype=self.dtype, name="merge")(ctx)
        return ctx


def _rel_index(hs: int, ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(hs), np.arange(ws), indexing="ij"), 0)
    cf = coords.reshape(2, -1)
    rel = cf[:, :, None] - cf[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += hs - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class SCC(nn.Module):
    """Spatial-channel correlation with hierarchical windows."""

    dim: int
    base_win: tuple
    window: tuple
    num_heads: int
    pad_heads: bool = False  # SNG rounds head_dim up
    ngram: int = 0  # SNG injects 2-gram window context before partitioning
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        wh, ww = self.window
        bh, bw = min(wh, self.base_win[0]), min(ww, self.base_win[1])
        nh = self.num_heads
        head_dim = self.dim // (2 * nh)
        if self.pad_heads and self.dim % (2 * nh) > 0:
            head_dim += 1
        attn_dim = head_dim * 2 * nh

        qv = DFE(attn_dim, dtype=self.dtype, name="qv")(x)
        if self.ngram:
            ctx = NGramContext(
                attn_dim, self.window, self.ngram, nh, dtype=self.dtype,
                name="ngram_context",
            )(qv)  # (B, nWh, nWw, attn_dim)
            qv = qv.reshape(b, h // wh, wh, w // ww, ww, attn_dim)
            qv = qv + ctx[:, :, None, :, None, :]
            qv = qv.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, attn_dim)
        else:
            # window partition -> (B*nW, L, attn_dim)
            qv = qv.reshape(b, h // wh, wh, w // ww, ww, attn_dim)
            qv = qv.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, attn_dim)
        bw_, L, _ = qv.shape
        qv = qv.reshape(bw_, L, 2, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, v = qv[0], qv[1]  # (B', nh, L, hd)

        # ---- spatial self-correlation
        rh, rw = wh // bh, ww // bw
        vp = v.reshape(bw_, nh, bh, rh, bw, rw, head_dim)
        vp = vp.transpose(0, 1, 2, 4, 6, 3, 5).reshape(bw_, nh, bh * bw, head_dim, rh * rw)
        vp = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32,
                      name="spatial_linear")(vp)[..., 0]  # (B', nh, bL, hd)
        corr = jnp.einsum("bhnc,bhmc->bhnm", q, vp,
                          preferred_element_type=jnp.float32) / head_dim

        ph = np.arange(1 - wh, wh)
        pw = np.arange(1 - ww, ww)
        biases = np.stack(np.meshgrid(ph, pw, indexing="ij"), 0).reshape(2, -1).T
        pos = DynamicPosBias(self.dim // 4, nh, dtype=self.dtype, name="pos")(
            jnp.asarray(biases, jnp.float32)
        )  # ((2wh-1)(2ww-1), nh)
        idx = _rel_index(wh, ww)
        bias = pos[jnp.asarray(idx.reshape(-1))].reshape(L, L, nh)
        bias = bias.reshape(L, bh, rh, bw, rw, nh)
        bias = bias.transpose(0, 1, 3, 5, 2, 4).reshape(L, bh * bw, nh, rh * rw)
        bias = bias.mean(-1).transpose(2, 0, 1)  # (nh, L, bL)
        corr = corr + bias[None].astype(corr.dtype)
        xs = jnp.einsum("bhnm,bhmc->bhnc", corr.astype(self.dtype), vp)
        xs = xs.transpose(0, 2, 1, 3).reshape(bw_, L, nh * head_dim)

        # ---- channel self-correlation (single head over concatenated heads)
        qc = q.transpose(0, 2, 1, 3).reshape(bw_, L, nh * head_dim)
        vc = v.transpose(0, 2, 1, 3).reshape(bw_, L, nh * head_dim)
        ccorr = jnp.einsum("bnc,bnd->bcd", qc, vc,
                           preferred_element_type=jnp.float32) / L
        xc = jnp.einsum("bcd,bnd->bnc", ccorr.astype(self.dtype), vc)

        y = jnp.concatenate([xs, xc], axis=-1)  # (B', L, attn_dim)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(y)
        # window reverse
        y = y.reshape(b, h // wh, w // ww, wh, ww, self.dim)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.dim)


class HiTBlock(nn.Module):
    dim: int
    num_heads: int
    base_win: tuple
    window: tuple
    mlp_ratio: float = 2.0
    ffn_type: str = "mlp"  # 'mlp' (SIR/SNG) or 'convffn' (SRF)
    pad_heads: bool = False
    ngram: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        wh, ww = self.window
        shortcut = x
        # SNG pads to DOUBLE the window size (hit_sng_arch.py:774) so the
        # ngram context always sees >= 2x2 windows
        mh, mw = (wh * 2, ww * 2) if self.ngram else (wh, ww)
        ph, pw = (mh - h % mh) % mh, (mw - w % mw) % mw
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        y = SCC(self.dim, self.base_win, self.window, self.num_heads,
                self.pad_heads, self.ngram, dtype=self.dtype, name="correlation")(xp)
        y = y[:, :h, :w, :]
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(y)
        x = shortcut + y
        hidden = int(self.dim * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(x)
        z = nn.gelu(z, approximate=False)
        if self.ffn_type == "convffn":
            z = z + nn.gelu(
                Conv2d(hidden, 5, feature_group_count=hidden, dtype=self.dtype,
                       name="mlp_dw")(z),
                approximate=False,
            )
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(z)
        return x + z


class HiT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 60
    depths: tuple = (6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6)
    base_win_size: tuple = (8, 8)
    mlp_ratio: float = 2.0
    hier_win_ratios: tuple = (0.5, 1, 2, 4, 6, 8)
    img_range: float = 1.0
    upsampler: str = "pixelshuffledirect"
    ffn_type: str = "mlp"
    pad_heads: bool = False
    ngram: int = 0
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        if x.shape[-1] == 3:
            x = (x - mean) * self.img_range

        win_hs = [int(self.base_win_size[0] * r) for r in self.hier_win_ratios]
        win_ws = [int(self.base_win_size[1] * r) for r in self.hier_win_ratios]

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        # patch_norm=True: LayerNorm right after patch embedding
        # (hit_sir_arch.py:896-900)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="patch_norm")(feat)
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            group_in = body
            for bi in range(depth):
                body = HiTBlock(
                    self.embed_dim, heads, tuple(self.base_win_size),
                    (win_hs[bi], win_ws[bi]), self.mlp_ratio, self.ffn_type,
                    self.pad_heads, self.ngram, dtype=self.dtype,
                    name=f"layers_{li}_b{bi}",
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
        elif self.upsampler == "pixelshuffle":
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
        else:  # restoration (scale 1)
            res = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(feat)
            out = x + res
        out = out / self.img_range + mean
        return out[:, : h0 * s, : w0 * s, :].astype(jnp.float32)


def _hit_factory(ffn_type: str, pad_heads: bool, ngram: int = 0):
    def factory(scale: int = 4, **kwargs):
        for k in ("img_size", "expansion_factor", "resi_connection", "in_chans"):
            kwargs.pop(k, None)
        for k in ("depths", "num_heads", "base_win_size", "hier_win_ratios"):
            if k in kwargs:
                kwargs[k] = tuple(kwargs[k])
        return HiT(upscale=scale, ffn_type=ffn_type, pad_heads=pad_heads,
                   ngram=ngram, **kwargs)

    return factory


ARCH_REGISTRY.register(_hit_factory("mlp", False), name="hit_sir")
ARCH_REGISTRY.register(_hit_factory("mlp", True, ngram=2), name="hit_sng")
ARCH_REGISTRY.register(_hit_factory("convffn", False), name="hit_srf")
