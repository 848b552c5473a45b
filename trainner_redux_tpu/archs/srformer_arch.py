"""SRFormer — Permuted Self-Attention SR transformer (flax/NHWC).

Parity: the reference's spandrel-backed srformer/srformer_light factories
(/root/reference/traiNNer/archs/srformer_arch.py), implementing SRFormer
(Zhou et al., ICCV 2023): large windows (24) made affordable by PSA — keys/
values compress channels by r^2 and fold the saving into r-times-smaller
spatial windows, so attention cost drops ~r^2 while the receptive field
stays large. Everything else mirrors the SwinIR skeleton.
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
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


@lru_cache(maxsize=32)
def _psa_rel_index(ws: int, pws: int) -> np.ndarray:
    """(ws^2, pws^2) aligned relative-position index (SRFormer convention:
    permuted tokens sit at even coordinates scaled by r)."""
    r = ws // pws
    coords_q = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    coords_k = (
        np.stack(np.meshgrid(np.arange(pws), np.arange(pws), indexing="ij")).reshape(2, -1) * r
        + (r - 1) / 2
    )
    rel = coords_q[:, :, None] - coords_k[:, None, :]
    rel = np.round(rel + (ws - 1)).astype(np.int64)  # [0, 2w-2]
    return rel[0] * (2 * ws - 1) + rel[1]


class PSAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        # x: (B*nW, ws*ws, C)
        b_, n, c = x.shape
        ws = self.window_size
        pws = ws // 2
        r = 2
        nh = self.num_heads
        hd = c // nh
        np_tok = pws * pws

        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        kv = nn.Dense(
            c // 2, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32, name="kv"
        )(x)
        # fold r x r spatial blocks into channels: (ws,ws,2*(c/4)) -> (pws^2, 2, c)
        kv = kv.reshape(b_, pws, r, pws, r, 2, c // 4)
        kv = kv.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b_, np_tok, 2, c)
        k, v = kv[:, :, 0], kv[:, :, 1]

        qh = q.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(b_, np_tok, nh, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(b_, np_tok, nh, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh * (hd**-0.5), kh, preferred_element_type=jnp.float32
        )
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, nh),
            jnp.float32,
        )
        idx = jnp.asarray(_psa_rel_index(ws, pws))
        bias = bias_table[idx.reshape(-1)].reshape(n, np_tok, nh).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            # subsample the key side of the standard mask to permuted tokens
            nw = mask.shape[0]
            m = jnp.asarray(mask).reshape(nw, n, pws, r, pws, r)[:, :, :, 0, :, 0]
            m = m.reshape(nw, n, np_tok)
            attn = attn.reshape(b_ // nw, nw, nh, n, np_tok) + m[None, :, None]
            attn = attn.reshape(b_, nh, n, np_tok)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class SRFormerBlock(nn.Module):
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
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        win = window_partition(x, ws)
        out = PSAttention(self.dim, ws, self.num_heads, dtype=self.dtype, name="attn")(
            win, _attn_mask(h, w, ws, shift)
        )
        x = window_reverse(out, ws, h, w)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path, name="dp1")(x, train)
        hid = int(self.dim * self.mlp_ratio)
        # PSAttention differs from Swin, but the pre-LN MLP half is the
        # shared fused kernel (param names fc1/fc2 here)
        from trainner_redux_tpu.archs.fused_block_util import fused_mlp_residual

        fused = fused_mlp_residual(
            self, x, hid, self.drop_path, train, ws, self.dtype,
            fc1_name="fc1", fc2_name="fc2",
        )
        if fused is not None:
            return fused
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(hid, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class SRFormer(nn.Module):
    upscale: int = 4
    embed_dim: int = 180
    depths: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 24
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
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
        # upstream patch_embed.norm (patch_norm=True default): applied to the
        # body branch only — the conv_first residual stays un-normed
        body = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="patch_norm"
        )(feat)
        total = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        cursor = 0
        for gi, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            res = body
            for bi in range(depth):
                res = SRFormerBlock(
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


def _srformer_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "patch_size", "in_chans", "ape", "patch_norm",
                  "use_checkpoint", "drop_rate", "attn_drop_rate", "qkv_bias", "qk_scale"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depths"] = tuple(cfg["depths"])
        cfg["num_heads"] = tuple(cfg["num_heads"])
        return SRFormer(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(
    _srformer_factory(embed_dim=180, depths=[6] * 6, num_heads=[6] * 6, window_size=24),
    name="srformer",
)
SPANDREL_REGISTRY.register(
    _srformer_factory(
        embed_dim=60, depths=[6] * 4, num_heads=[6] * 4, window_size=16,
        upsampler="pixelshuffledirect",
    ),
    name="srformer_light",
)
