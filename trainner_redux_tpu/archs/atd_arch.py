"""ATD — Adaptive Token Dictionary SR transformer (flax/NHWC).

Parity: the reference's spandrel-backed atd/atd_light factories
(/root/reference/traiNNer/archs/atd_arch.py:9-103), implementing ATD (Zhang
et al., CVPR 2024): each layer combines (1) shifted-window self-attention,
(2) cross-attention against a learned token dictionary (queries/keys in a
reduced dim), and (3) adaptive-category MSA where tokens are grouped by
their most-similar dictionary entry; the dictionary refreshes between layers
from similarity-weighted token pooling.

TPU notes: the category grouping uses a single argsort + gather with static
shapes (tokens pad to a category_size multiple with masked attention), so
the whole data-dependent clustering stays inside one compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import (
    WindowAttention,
    _attn_mask,
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class ATDCrossAttention(nn.Module):
    """Token-dictionary cross attention; returns (out, similarity)."""

    dim: int
    num_tokens: int
    reducted_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, td: jnp.ndarray):
        # x: (B, N, C); td: (B, M, C)
        b, n, c = x.shape
        rd = self.reducted_dim
        q = nn.Dense(rd, dtype=self.dtype, param_dtype=jnp.float32, name="wq")(x)
        k = nn.Dense(rd, dtype=self.dtype, param_dtype=jnp.float32, name="wk")(td)
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="wv")(td)
        scale = self.param("scale", nn.initializers.zeros, (1,), jnp.float32)
        # normalized similarity logits with learned temperature (official uses
        # l2-normalized q/k with a learned logit scale)
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        logits = jnp.einsum("bnr,bmr->bnm", qn, kn, preferred_element_type=jnp.float32)
        logits = logits * jnp.exp(scale.astype(logits.dtype))
        sim = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", sim.astype(self.dtype), v)
        return out, sim


class AdaptiveCategoryMSA(nn.Module):
    """Group tokens by argmax dictionary similarity; MSA within fixed-size
    chunks of the category-sorted sequence."""

    dim: int
    num_heads: int
    category_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, sim: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        cs = min(self.category_size, n)
        nh = self.num_heads
        hd = c // nh
        pad = (cs - n % cs) % cs
        n_pad = n + pad

        category = jnp.argmax(sim, axis=-1)  # (B, N)
        order = jnp.argsort(category, axis=-1)  # stable sort by category
        inv_order = jnp.argsort(order, axis=-1)

        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv_sorted = jnp.take_along_axis(qkv, order[..., None], axis=1)
        if pad:
            qkv_sorted = jnp.pad(qkv_sorted, ((0, 0), (0, pad), (0, 0)))
        groups = n_pad // cs
        qkv_g = qkv_sorted.reshape(b * groups, cs, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv_g[0], qkv_g[1], qkv_g[2]

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (hd**-0.5), k, preferred_element_type=jnp.float32
        )
        if pad:
            # mask out padded key positions (only the last chunk has them)
            key_valid = jnp.arange(n_pad) < n
            key_valid = key_valid.reshape(groups, cs)
            mask = jnp.where(key_valid, 0.0, -1e9)  # (groups, cs)
            mask = jnp.tile(mask[None], (b, 1, 1)).reshape(b * groups, 1, 1, cs)
            attn = attn + mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_pad, c)[:, :n]
        out = jnp.take_along_axis(out, inv_order[..., None], axis=1)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class ConvFFN(nn.Module):
    dim: int
    mlp_ratio: float
    kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        hidden = int(c * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y_img = y.reshape(b, h, w, hidden)
        y_img = Conv2d(
            hidden, self.kernel_size, feature_group_count=hidden, dtype=self.dtype,
            name="dwconv",
        )(y_img)
        y = y + y_img.reshape(b, n, hidden)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)


class ATDLayer(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    num_tokens: int
    reducted_dim: int
    category_size: int
    mlp_ratio: float
    convffn_kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, td: jnp.ndarray, train: bool):
        # x: (B, H, W, C); td: (B, M, C)
        b, h, w, c = x.shape
        n = h * w
        ws = self.window_size
        shift = self.shift if min(h, w) > ws else 0

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        xn_seq = xn.reshape(b, n, c)

        # (1) shifted window self-attention
        xs = jnp.roll(xn, (-shift, -shift), axis=(1, 2)) if shift else xn
        from trainner_redux_tpu.ops.pallas.window_attention import (
            fused_window_mhsa_supported,
        )

        attn_mod = WindowAttention(
            self.dim, ws, self.num_heads, dtype=self.dtype, name="attn_win"
        )
        if fused_window_mhsa_supported(h, w, ws, self.dim, self.num_heads):
            x_win = attn_mod(xs, None, fused_shift=shift)
        else:
            win = window_partition(xs, ws)
            x_win = window_reverse(
                attn_mod(win, _attn_mask(h, w, ws, shift)), ws, h, w
            )
        if shift:
            x_win = jnp.roll(x_win, (shift, shift), axis=(1, 2))

        # (2) token-dictionary cross-attention
        x_atd, sim = ATDCrossAttention(
            self.dim, self.num_tokens, self.reducted_dim, dtype=self.dtype, name="attn_atd"
        )(xn_seq, td)

        # (3) adaptive-category MSA
        x_aca = AdaptiveCategoryMSA(
            self.dim, self.num_heads, self.category_size, dtype=self.dtype, name="attn_aca"
        )(xn_seq, sim)

        x = shortcut + x_win + (x_atd + x_aca).reshape(b, h, w, c)

        yn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = ConvFFN(
            self.dim, self.mlp_ratio, self.convffn_kernel_size, dtype=self.dtype, name="convffn"
        )(yn.reshape(b, n, c), h, w)
        x = x + y.reshape(b, h, w, c)

        # adaptive dictionary refresh: sigma-gated blend of old dictionary and
        # similarity-weighted token pooling
        sigma = self.param("sigma", nn.initializers.zeros, (self.num_tokens, 1), jnp.float32)
        weights = sim / jnp.maximum(sim.sum(axis=1, keepdims=True), 1e-8)  # (B,N,M) col-norm
        pooled = jnp.einsum(
            "bnm,bnc->bmc", weights.astype(self.dtype), x.reshape(b, n, c)
        )
        gate = nn.sigmoid(sigma).astype(td.dtype)
        td_new = gate * td + (1.0 - gate) * pooled
        return x, td_new


class ATDGroup(nn.Module):
    dim: int
    depth: int
    num_heads: int
    window_size: int
    num_tokens: int
    reducted_dim: int
    category_size: int
    mlp_ratio: float
    convffn_kernel_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b = x.shape[0]
        td0 = self.param(
            "token_dict",
            nn.initializers.truncated_normal(0.02),
            (self.num_tokens, self.dim),
            jnp.float32,
        )
        td = jnp.tile(td0[None].astype(x.dtype), (b, 1, 1))
        res = x
        for i in range(self.depth):
            x, td = ATDLayer(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.num_tokens, self.reducted_dim, self.category_size,
                self.mlp_ratio, self.convffn_kernel_size, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, td, train)
        x = Conv2d(self.dim, 3, dtype=self.dtype, name="conv")(x)
        return x + res


class ATD(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 210
    depths: tuple = (6,) * 6
    num_heads: tuple = (6,) * 6
    window_size: int = 16
    category_size: int = 256
    num_tokens: int = 128
    reducted_dim: int = 20
    convffn_kernel_size: int = 5
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        if x.shape[-1] == 3:
            x = (x - mean) * self.img_range
        ws = self.window_size
        ph = (ws - in_h % ws) % ws
        pw = (ws - in_w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        body = feat
        for gi, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            body = ATDGroup(
                self.embed_dim, depth, heads, ws, self.num_tokens, self.reducted_dim,
                self.category_size, self.mlp_ratio, self.convffn_kernel_size,
                dtype=self.dtype, name=f"groups_{gi}",
            )(body, train)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        if self.upsampler == "pixelshuffledirect":
            out = Conv2d(3 * self.upscale**2, 3, dtype=self.dtype, name="up_direct")(feat)
            out = pixel_shuffle(out, self.upscale)
        else:
            feat = nn.leaky_relu(
                Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(feat), 0.01
            )
            s = self.upscale
            stage = 0
            while s > 1:
                f = 3 if s % 3 == 0 else 2
                feat = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype, name=f"upsample_{stage}")(feat)
                feat = pixel_shuffle(feat, f)
                s //= f
                stage += 1
            out = Conv2d(3, 3, dtype=self.dtype, name="conv_last")(feat)
        if out.shape[-1] == 3:
            out = out / self.img_range + mean
        return out[:, : in_h * self.upscale, : in_w * self.upscale, :].astype(jnp.float32)


def _atd_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "in_chans", "resi_connection"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depths"] = tuple(cfg["depths"])
        cfg["num_heads"] = tuple(cfg["num_heads"])
        cfg["mlp_ratio"] = float(cfg.get("mlp_ratio", 2))
        return ATD(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(
    _atd_factory(
        embed_dim=210, depths=(6,) * 6, num_heads=(6,) * 6, window_size=16,
        category_size=256, num_tokens=128, reducted_dim=20, convffn_kernel_size=5,
        mlp_ratio=2,
    ),
    name="atd",
)
SPANDREL_REGISTRY.register(
    _atd_factory(
        embed_dim=48, depths=(6,) * 4, num_heads=(6,) * 4, window_size=16,
        category_size=128, num_tokens=64, reducted_dim=8, convffn_kernel_size=7,
        mlp_ratio=1, upsampler="pixelshuffledirect",
    ),
    name="atd_light",
)
