"""Swin2SR — SwinV2-based restoration transformer (flax/NHWC).

Parity: the reference's spandrel-backed swin2sr_s/swin2sr_m factories
(/root/reference/traiNNer/archs/swin2sr_arch.py), implementing Swin2SR
(Conde et al., ECCV 2022): SwinV2 attention — cosine similarity with a
learned per-head temperature and a continuous log-spaced position-bias MLP —
with post-normalized residuals; SwinIR-style body/upsampler.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import (
    DropPath,
    _attn_mask,
    _relative_position_index,
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


@lru_cache(maxsize=16)
def _log_coords(ws: int) -> np.ndarray:
    """((2w-1)^2, 2) log-spaced relative coordinates for the CPB MLP."""
    rh = np.arange(-(ws - 1), ws, dtype=np.float64)
    rw = np.arange(-(ws - 1), ws, dtype=np.float64)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1).reshape(-1, 2)
    table = table / (ws - 1) * 8
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.astype(np.float32)


class SwinV2Attention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh

        qkv = nn.Dense(c * 3, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        # cosine attention with clamped learned logit scale
        logit_scale = self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.log(10.0 * jnp.ones(shape, dtype)),
            (nh, 1, 1),
            jnp.float32,
        )
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qn, kn, preferred_element_type=jnp.float32)
        scale = jnp.exp(jnp.minimum(logit_scale, jnp.log(1.0 / 0.01)))
        attn = attn * scale[None]

        # continuous position bias MLP over log-spaced coordinates
        coords = jnp.asarray(_log_coords(self.window_size))
        h1 = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32, name="cpb_fc1")(coords)
        h1 = nn.relu(h1)
        bias_table = nn.Dense(nh, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="cpb_fc2")(h1)
        idx = jnp.asarray(_relative_position_index(self.window_size))
        bias = bias_table[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + (16.0 * jax.nn.sigmoid(bias))[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(b_, nh, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class _AttnParamsV2(nn.Module):
    """Param tree of SwinV2Attention (qkv/logit_scale/CPB MLP/proj) for the
    fused path — scoped names match the unfused module exactly. Runs the
    tiny CPB MLP (static log-coords) and returns its (table_len, nh) bias
    table alongside the raw params."""

    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        from trainner_redux_tpu.archs.fused_block_util import DenseParams

        wq, bq = DenseParams(self.dim, 3 * self.dim, True, name="qkv")()
        logit = self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.log(10.0 * jnp.ones(shape, dtype)),
            (self.num_heads, 1, 1),
            jnp.float32,
        )
        coords = jnp.asarray(_log_coords(self.window_size))
        h1 = nn.Dense(512, dtype=self.dtype, param_dtype=jnp.float32,
                      name="cpb_fc1")(coords)
        h1 = nn.relu(h1)
        table = nn.Dense(self.num_heads, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="cpb_fc2")(h1)
        wp, bp = DenseParams(self.dim, self.dim, True, name="proj")()
        return wq, bq, logit, table, wp, bp


class Swin2Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float
    drop_path: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0

        from trainner_redux_tpu.ops.pallas.fused_block import (
            fused_block_interpret,
        )
        from trainner_redux_tpu.ops.pallas.fused_block_v2 import (
            fused_block_v2_supported,
            fused_cos_attn_block,
            fused_postnorm_mlp,
        )

        hidden = int(self.dim * self.mlp_ratio)
        if fused_block_v2_supported(h, w, ws, self.dim, self.num_heads, hidden):
            # Fully-fused SwinV2 path: post-norm cosine-attention half and
            # post-norm MLP half each run as ONE Pallas kernel. Param tree
            # is identical to the unfused modules (stub declarations), so
            # checkpoints/converters are unaffected. The CPB bias MLP runs
            # outside the kernel (static log-coords -> (nh, n, n) table) and
            # receives gradients through the bias-kind cotangent.
            from trainner_redux_tpu.archs.fused_block_util import (
                DenseParams,
                LNParams,
                droppath_scale,
            )
            from trainner_redux_tpu.ops.pallas.window_attention import (
                shift_mask_kinds,
            )

            nh = self.num_heads
            hd = self.dim // nh
            n = ws * ws
            wq, bq, logit, table, wp, bp = _AttnParamsV2(
                self.dim, ws, nh, dtype=self.dtype, name="attn"
            )()
            g1, be1 = LNParams(self.dim, name="norm1")()
            w1, b1 = DenseParams(self.dim, hidden, True, name="fc1")()
            w2, b2 = DenseParams(hidden, self.dim, True, name="fc2")()
            g2, be2 = LNParams(self.dim, name="norm2")()

            idx = jnp.asarray(_relative_position_index(ws))
            bias = jnp.take(table, idx.reshape(-1), axis=0)
            bias = bias.reshape(n, n, nh).transpose(2, 0, 1)
            bias16 = 16.0 * jax.nn.sigmoid(bias.astype(jnp.float32))
            if shift > 0:
                masks = jnp.asarray(shift_mask_kinds(ws, shift))
                bias_kinds = bias16[None] + masks[:, None]
            else:
                bias_kinds = bias16[None]
            scale = jnp.exp(
                jnp.minimum(logit.reshape(nh), jnp.log(1.0 / 0.01))
            )
            s1 = droppath_scale(self, self.drop_path, train, b)
            s2 = droppath_scale(self, self.drop_path, train, b)
            interp = fused_block_interpret()
            xc = x.astype(self.dtype)
            if shift > 0:
                xc = jnp.roll(xc, (-shift, -shift), axis=(1, 2))
            z = fused_cos_attn_block(
                xc, wq, bq, scale, wp, bp, g1, be1, bias_kinds, s1,
                nh, hd, ws, 1e-5, interp,
            )
            if shift > 0:
                z = jnp.roll(z, (shift, shift), axis=(1, 2))
            return fused_postnorm_mlp(
                z, w1, b1, w2, b2, g2, be2, s2, ws, 1e-5, interp
            )

        shortcut = x
        y = x
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        win = window_partition(y, ws)
        out = SwinV2Attention(self.dim, ws, self.num_heads, dtype=self.dtype, name="attn")(
            win, _attn_mask(h, w, ws, shift)
        )
        y = window_reverse(out, ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        # SwinV2 post-norm residual
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(y)
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, train)

        z = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(z)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(z)
        return x + DropPath(self.drop_path, name="dp2")(z, train)


class Swin2SR(nn.Module):
    upscale: int = 4
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
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
        # patch_embed LayerNorm (patch_norm=True upstream default)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="patch_norm")(feat)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        cursor = 0
        for gi, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            res = body
            for bi in range(depth):
                res = Swin2Block(
                    self.embed_dim, heads, ws, 0 if bi % 2 == 0 else ws // 2,
                    self.mlp_ratio, dpr[cursor + bi], dtype=self.dtype,
                    name=f"layers_{gi}_blocks_{bi}",
                )(res, train)
            res = Conv2d(self.embed_dim, 3, dtype=self.dtype, name=f"layers_{gi}_conv")(res)
            body = body + res
            cursor += depth
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

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


def _swin2sr_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "patch_size", "in_chans", "ape", "patch_norm",
                  "use_checkpoint", "drop_rate", "attn_drop_rate", "qkv_bias",
                  "qk_scale", "resi_connection"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depths"] = tuple(cfg["depths"])
        cfg["num_heads"] = tuple(cfg["num_heads"])
        return Swin2SR(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(
    _swin2sr_factory(embed_dim=180, depths=[6] * 6, num_heads=[6] * 6, window_size=8),
    name="swin2sr_m",
)
SPANDREL_REGISTRY.register(
    _swin2sr_factory(embed_dim=60, depths=[6] * 4, num_heads=[6] * 4, window_size=8),
    name="swin2sr_s",
)
# swin2sr_l preset (reference swin2sr_arch.py:63-90)
SPANDREL_REGISTRY.register(
    _swin2sr_factory(embed_dim=240, depths=[6] * 9, num_heads=[8] * 9, window_size=8),
    name="swin2sr_l",
)
