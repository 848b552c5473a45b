"""GRL — Global-Regional-Local image restoration transformer (flax/NHWC).

Parity: the reference's spandrel-backed grl_b/grl_s/grl_t factories
(/root/reference/traiNNer/archs/grl_arch.py) pin the configuration surface
(embed_dim 180/128/64, depths (4,4,8,8,8,4,4)/(4,)*4, window 32, stripe
64x64, anchor_window_down_factor 4, qkv_proj_type "linear",
anchor_proj_type "avgpool" [parameterless], anchor_one_stage, out_proj_type
"linear", conv_type "1conv", local_connection, stripe_shift). Module
composition mirrors the upstream GRL repo (ofsoundof/GRL-Image-Restoration
models/grl.py — the layout spandrel checkpoints carry):

EfficientMixAttnTransformerBlock = norm1 -> MixedAttention (one qkv Linear
over the FULL dim whose q/k/v each split channel-wise into a window half
and an anchored-stripe half; Swin-v2-style COSINE attention, each attention
scaled+biased by an AffineTransform: clamped exp(logit_scale) plus a
log-spaced-coordinate CPB MLP bias; anchored stripe attention is the
low-rank two-softmax product attn1 @ (attn2 @ v) with parameterless
avg-pooled anchors; out proj Linear) + CAB local connection, then
norm2 -> MLP(fc1/fc2). Stages carry a trailing 3x3 conv; shell =
conv_first / norm_start / layers / norm_end / conv_after_body / upsampler.

Documented divergences: stripe shifts use jnp.roll without the upstream's
boundary attention masks (wrap-around stripes attend across the seam), and
the relative-coordinate log normalization follows Swin-v2's published
formula. table_/index_/mask_ checkpoint buffers are recomputed statically.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import window_partition, window_reverse
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


@lru_cache(maxsize=64)
def _cpb_table_index(
    h1: int, w1: int, h2: int, w2: int, df: int
) -> tuple[np.ndarray, np.ndarray]:
    """Static CPB inputs for attention between an (h1, w1) token grid and an
    (h2, w2) grid sampled at stride df (df=1: same grid). Returns
    (table (T, 2) float32 log-normalized displacements, index (n1, n2) int32).
    """
    p1 = np.stack(
        np.meshgrid(np.arange(h1), np.arange(w1), indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float64)
    p2 = np.stack(
        np.meshgrid(np.arange(h2), np.arange(w2), indexing="ij"), -1
    ).reshape(-1, 2).astype(np.float64)
    p2 = p2 * df + (df - 1) / 2.0  # centers of the pooled cells
    rel = p1[:, None, :] - p2[None, :, :]  # (n1, n2, 2)
    flat = rel.reshape(-1, 2)
    table, inverse = np.unique(flat, axis=0, return_inverse=True)
    # Swin-v2 log-spaced normalization to [-8, 8] then sign*log2(|x|+1)/log2(8)
    denom = np.maximum(np.abs(table).max(axis=0, keepdims=True), 1.0)
    t = table * (8.0 / denom)
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8.0)
    return (
        t.astype(np.float32),
        inverse.reshape(p1.shape[0], p2.shape[0]).astype(np.int32),
    )


class AffineTransform(nn.Module):
    """Swin-v2 attention affine: clamped-exp logit scale + CPB MLP bias."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, attn: jnp.ndarray, table: np.ndarray,
                 index: np.ndarray) -> jnp.ndarray:
        nh = self.num_heads
        logit_scale = self.param(
            "logit_scale",
            lambda _k, s, d: jnp.full(s, math.log(10.0), d),
            (nh, 1, 1), jnp.float32,
        )
        scale = jnp.exp(jnp.minimum(logit_scale, math.log(100.0)))
        attn = attn * scale[None].astype(attn.dtype)
        t = jnp.asarray(table)
        bias_t = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                          name="cpb0")(t)
        bias_t = nn.Dense(nh, use_bias=False, dtype=self.dtype,
                          param_dtype=jnp.float32, name="cpb1")(nn.relu(bias_t))
        idx = jnp.asarray(index)
        bias = jnp.take(bias_t, idx.reshape(-1), axis=0)
        bias = bias.reshape(idx.shape[0], idx.shape[1], nh).transpose(2, 0, 1)
        return attn + bias[None].astype(attn.dtype)


def _cosine_attn(q, k, eps=1e-12):
    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), eps)
    return jnp.einsum("bhnd,bhmd->bhnm", qn, kn,
                      preferred_element_type=jnp.float32)


def _heads(z, nh):
    b, n, c = z.shape
    return z.reshape(b, n, nh, c // nh).transpose(0, 2, 1, 3)


def _unheads(z):
    b, nh, n, hd = z.shape
    return z.transpose(0, 2, 1, 3).reshape(b, n, nh * hd)


class MixedAttention(nn.Module):
    """Upstream MixedAttention: one full-dim qkv Linear; window half through
    cosine window attention (attn_transform), stripe half through anchored
    stripe attention (attn_transform1/2, avg-pooled anchors); out proj."""

    dim: int
    num_heads_window: int
    num_heads_stripe: int
    window_size: int
    stripe_size: tuple
    down_factor: int
    do_shift: bool
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        half = c // 2
        ws = min(self.window_size, min(h, w))
        sh = min(self.stripe_size[0], h)
        sw = min(self.stripe_size[1], w)
        df = self.down_factor

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # ---- window half (no shift in GRL's window branch) ----
        nh_w = self.num_heads_window
        outs = []
        qw = window_partition(q[..., :half], ws)
        kw = window_partition(k[..., :half], ws)
        vw = window_partition(v[..., :half], ws)
        attn = _cosine_attn(_heads(qw, nh_w), _heads(kw, nh_w))
        table, index = _cpb_table_index(ws, ws, ws, ws, 1)
        attn = AffineTransform(nh_w, dtype=self.dtype, name="attn_transform_w")(
            attn, table, index
        )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        ow = _unheads(jnp.einsum("bhnm,bhmd->bhnd", attn, _heads(vw, nh_w)))
        outs.append(window_reverse(ow, ws, h, w))

        # ---- anchored stripe half ----
        nh_s = self.num_heads_stripe
        shift = (sh // 2, sw // 2) if self.do_shift else (0, 0)
        qs, ks, vs = (t[..., half:] for t in (q, k, v))
        xs = x[..., half:]
        if shift != (0, 0):
            qs, ks, vs, xs = (
                jnp.roll(t, (-shift[0], -shift[1]), axis=(1, 2))
                for t in (qs, ks, vs, xs)
            )
        anchor = nn.avg_pool(xs, (df, df), strides=(df, df))

        def stripes(z, wh, ww):
            bb, hh, www, cc = z.shape
            z = z.reshape(bb, hh // wh, wh, www // ww, ww, cc)
            return z.transpose(0, 1, 3, 2, 4, 5).reshape(-1, wh * ww, cc)

        q_ = _heads(stripes(qs, sh, sw), nh_s)
        k_ = _heads(stripes(ks, sh, sw), nh_s)
        v_ = _heads(stripes(vs, sh, sw), nh_s)
        a_ = _heads(stripes(anchor, sh // df, sw // df), nh_s)

        t_qa, i_qa = _cpb_table_index(sh, sw, sh // df, sw // df, df)
        # anchor grid coords sit at pooled-cell centers relative to the fine
        # grid in the q->anchor direction; the anchor->k direction is the
        # same displacement set negated, with the index transposed
        i_ak = np.ascontiguousarray(i_qa.T)
        t_ak = np.ascontiguousarray(-t_qa)

        a1 = AffineTransform(nh_s, dtype=self.dtype, name="attn_transform1")(
            _cosine_attn(q_, a_), t_qa, i_qa
        )
        a1 = jax.nn.softmax(a1.astype(jnp.float32), axis=-1).astype(self.dtype)
        a2 = AffineTransform(nh_s, dtype=self.dtype, name="attn_transform2")(
            _cosine_attn(a_, k_), t_ak, i_ak
        )
        a2 = jax.nn.softmax(a2.astype(jnp.float32), axis=-1).astype(self.dtype)
        os_ = _unheads(jnp.einsum("bhnm,bhmd->bhnd", a1,
                                  jnp.einsum("bhmn,bhnd->bhmd", a2, v_)))
        n_sh, n_sw = h // sh, w // sw
        os_ = os_.reshape(b, n_sh, n_sw, sh, sw, half)
        os_ = os_.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, half)
        if shift != (0, 0):
            os_ = jnp.roll(os_, shift, axis=(1, 2))
        outs.append(os_)

        y = jnp.concatenate(outs, axis=-1)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(y)


class GRLBlock(nn.Module):
    dim: int
    num_heads_window: int
    num_heads_stripe: int
    window_size: int
    stripe_size: tuple
    down_factor: int
    do_shift: bool
    local_connection: bool = True
    mlp_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        y = MixedAttention(
            self.dim, self.num_heads_window, self.num_heads_stripe,
            self.window_size, tuple(self.stripe_size), self.down_factor,
            self.do_shift, dtype=self.dtype, name="attn",
        )(y)
        if self.local_connection:
            cab = nn.gelu(Conv2d(max(1, c // 4), 3, dtype=self.dtype,
                                 name="cab_0")(x), approximate=False)
            cab = Conv2d(c, 3, dtype=self.dtype, name="cab_1")(cab)
            ca = jnp.mean(cab, axis=(1, 2), keepdims=True)
            ca = nn.relu(Conv2d(max(1, c // 16), 1, padding=0, dtype=self.dtype,
                                name="cab_ca0")(ca))
            ca = nn.sigmoid(Conv2d(c, 1, padding=0, dtype=self.dtype,
                                   name="cab_ca1")(ca))
            y = y + cab * ca
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + z


class GRL(nn.Module):
    upscale: int = 4
    in_channels: int = 3
    out_channels: int = 3
    embed_dim: int = 180
    depths: tuple = (4, 4, 8, 8, 8, 4, 4)
    num_heads_window: tuple = (3,) * 7
    num_heads_stripe: tuple = (3,) * 7
    window_size: int = 32
    stripe_size: tuple = (64, 64)
    anchor_window_down_factor: int = 4
    stripe_shift: bool = True
    local_connection: bool = True
    mlp_ratio: float = 2.0
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range
        mult = max(self.window_size, max(self.stripe_size))
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="norm_start")(feat)
        for li, depth in enumerate(self.depths):
            group_in = body
            for bi in range(depth):
                body = GRLBlock(
                    self.embed_dim, self.num_heads_window[li],
                    self.num_heads_stripe[li], self.window_size,
                    tuple(self.stripe_size), self.anchor_window_down_factor,
                    do_shift=self.stripe_shift and bool(bi % 2),
                    local_connection=self.local_connection,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                    name=f"layers_{li}_b{bi}",
                )(body)
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype,
                          name=f"layers_{li}_conv")(body)
            body = body + group_in
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm_end")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        s = self.upscale
        if self.upsampler == "pixelshuffledirect":
            out = Conv2d(self.out_channels * s * s, 3, dtype=self.dtype,
                         name="upsample")(feat)
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
            out = Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv_last")(y)
        else:  # restoration
            out = x + Conv2d(self.out_channels, 3, dtype=self.dtype,
                             name="conv_last")(feat)
        out = out / self.img_range + mean
        return out[:, : h0 * s, : w0 * s, :].astype(jnp.float32)


def _grl_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        drop = ("img_size", "qkv_bias", "qkv_proj_type", "anchor_proj_type",
                "anchor_one_stage", "out_proj_type", "drop_rate", "attn_drop_rate",
                "drop_path_rate", "norm_layer", "pretrained_window_size",
                "pretrained_stripe_size", "conv_type", "init_method",
                "fairscale_checkpoint", "offload_to_cpu", "euclidean_dist",
                "stripe_groups", "qk_scale")
        for k in drop:
            kwargs.pop(k, None)
        cfg.update(kwargs)
        for k in ("depths", "num_heads_window", "num_heads_stripe", "stripe_size"):
            if k in cfg:
                cfg[k] = tuple(cfg[k])
        return GRL(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(_grl_factory(), name="grl_b")
SPANDREL_REGISTRY.register(
    _grl_factory(embed_dim=64, depths=(4, 4, 4, 4), num_heads_window=(2,) * 4,
                 num_heads_stripe=(2,) * 4, local_connection=False,
                 upsampler="pixelshuffledirect"),
    name="grl_t",
)
SPANDREL_REGISTRY.register(
    _grl_factory(embed_dim=128, depths=(4, 4, 4, 4), num_heads_window=(2,) * 4,
                 num_heads_stripe=(2,) * 4, local_connection=False),
    name="grl_s",
)
