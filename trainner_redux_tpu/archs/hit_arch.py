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
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        wh, ww = self.window
        shortcut = x
        ph, pw = (wh - h % wh) % wh, (ww - w % ww) % ww
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        y = SCC(self.dim, self.base_win, self.window, self.num_heads,
                self.pad_heads, dtype=self.dtype, name="correlation")(xp)
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
        body = feat
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            group_in = body
            for bi in range(depth):
                body = HiTBlock(
                    self.embed_dim, heads, tuple(self.base_win_size),
                    (win_hs[bi], win_ws[bi]), self.mlp_ratio, self.ffn_type,
                    self.pad_heads, dtype=self.dtype, name=f"layers_{li}_b{bi}",
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


def _hit_factory(ffn_type: str, pad_heads: bool):
    def factory(scale: int = 4, **kwargs):
        for k in ("img_size", "expansion_factor", "resi_connection", "in_chans"):
            kwargs.pop(k, None)
        for k in ("depths", "num_heads", "base_win_size", "hier_win_ratios"):
            if k in kwargs:
                kwargs[k] = tuple(kwargs[k])
        return HiT(upscale=scale, ffn_type=ffn_type, pad_heads=pad_heads, **kwargs)

    return factory


ARCH_REGISTRY.register(_hit_factory("mlp", False), name="hit_sir")
ARCH_REGISTRY.register(_hit_factory("mlp", True), name="hit_sng")
ARCH_REGISTRY.register(_hit_factory("convffn", False), name="hit_srf")
