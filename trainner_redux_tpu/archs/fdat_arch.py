"""FDAT — Fast Dual Aggregation Transformer (flax/NHWC).

Parity: /root/reference/traiNNer/archs/fdat_arch.py:17-528 (FDAT with
fdat_tiny/light/medium/large/xl presets): alternating fast spatial-window
attention (learned full (ws^2, ws^2) bias table, no shifts) and fast channel
attention, SimplifiedAIM cross-branch gating, depthwise-mixed FFN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d, Dtype, UniUpsampleV3, pixel_shuffle, pixel_unshuffle,
)
from trainner_redux_tpu.archs.swinir_arch import DropPath, window_partition, window_reverse
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class FastSpatialWindowAttention(nn.Module):
    dim: int
    window_size: int = 8
    num_heads: int = 4
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = c // nh
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        n = ws * ws
        win = window_partition(x, ws)
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32,
            name="qkv",
        )(win)
        qkv = qkv.reshape(-1, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        bias = self.param(
            "bias", nn.initializers.truncated_normal(0.02), (nh, n, n), jnp.float32
        )
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (hd**-0.5), k, preferred_element_type=jnp.float32
        ) + bias[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(-1, n, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        out = window_reverse(out, ws, hp, wp)
        return out[:, :h, :w, :]


class FastChannelAttention(nn.Module):
    dim: int
    num_heads: int = 4
    qkv_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        n = h * w
        temp = self.param("temp", nn.initializers.ones, (nh, 1, 1), jnp.float32)
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32,
            name="qkv",
        )(x).reshape(b, n, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 3, 1)  # (b, nh, hd, n)
        k = qkv[:, :, 1].transpose(0, 2, 3, 1)
        v = qkv[:, :, 2].transpose(0, 2, 3, 1)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jax.nn.softmax(
            (jnp.einsum("bhcn,bhdn->bhcd", q, k, preferred_element_type=jnp.float32)
             * temp[None]).astype(jnp.float32),
            axis=-1,
        ).astype(self.dtype)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v.astype(self.dtype))
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class SimplifiedAIM(nn.Module):
    dim: int
    reduction_ratio: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, attn_feat, conv_feat, interaction_type: str):
        if interaction_type == "spatial_modulates_channel":
            sm = nn.sigmoid(
                Conv2d(1, 1, use_bias=False, dtype=self.dtype, name="sg")(attn_feat)
            )
            return attn_feat + conv_feat * sm
        cm = conv_feat.mean(axis=(1, 2), keepdims=True)
        cm = Conv2d(
            max(1, self.dim // self.reduction_ratio), 1, use_bias=False,
            dtype=self.dtype, name="cg_0",
        )(cm)
        cm = nn.gelu(cm, approximate=False)
        cm = nn.sigmoid(
            Conv2d(self.dim, 1, use_bias=False, dtype=self.dtype, name="cg_1")(cm)
        )
        return attn_feat * cm + conv_feat


class SimplifiedFFN(nn.Module):
    dim: int
    expansion_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hd = int(self.dim * self.expansion_ratio)
        x = nn.Dense(hd, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = Conv2d(hd, 3, feature_group_count=hd, use_bias=False, dtype=self.dtype, name="smix")(x)
        return nn.Dense(
            self.dim, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2"
        )(x)


class SimplifiedDATBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    ffn_exp: float
    aim_re: int
    btype: str
    drop_path: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        n1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="n1")(x)
        if self.btype == "spatial":
            attn = FastSpatialWindowAttention(
                self.dim, self.window_size, self.num_heads, dtype=self.dtype, name="attn"
            )(n1)
            itype = "channel_modulates_spatial"
        else:
            attn = FastChannelAttention(
                self.dim, self.num_heads, dtype=self.dtype, name="attn"
            )(n1)
            itype = "spatial_modulates_channel"
        conv = Conv2d(
            self.dim, 3, feature_group_count=self.dim, use_bias=False,
            dtype=self.dtype, name="conv",
        )(n1)
        conv = nn.gelu(conv, approximate=False)
        fused = SimplifiedAIM(self.dim, self.aim_re, dtype=self.dtype, name="inter")(
            attn, conv, itype
        )
        x = x + DropPath(self.drop_path, name="dp1")(fused, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="n2")(x)
        y = SimplifiedFFN(self.dim, self.ffn_exp, dtype=self.dtype, name="ffn")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


@ARCH_REGISTRY.register(name="fdat")
class FDAT(nn.Module):
    scale: int = 4
    num_in_ch: int = 3
    num_out_ch: int = 3
    embed_dim: int = 120
    num_groups: int = 4
    depth_per_group: int = 3
    num_heads: int = 4
    window_size: int = 8
    ffn_expansion: float = 2.0
    aim_reduction: int = 8
    group_block_pattern: tuple = ("spatial", "channel")
    drop_path_rate: float = 0.1
    img_range: float = 1.0
    unshuffle_mod: bool = False
    upsampler_type: str = "pixelshuffle"
    mid_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]

        unshuffle = 0
        net_scale = self.scale
        if self.unshuffle_mod and self.scale <= 2:
            unshuffle = 4 // self.scale
            net_scale = 4
            ph = (unshuffle - in_h % unshuffle) % unshuffle
            pw = (unshuffle - in_w % unshuffle) % unshuffle
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            x = pixel_unshuffle(x, unshuffle)

        shallow = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)

        depth = self.depth_per_group * len(self.group_block_pattern)
        total = self.num_groups * depth
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        deep = shallow
        for g in range(self.num_groups):
            res = deep
            for i in range(depth):
                res = SimplifiedDATBlock(
                    self.embed_dim, self.num_heads, self.window_size,
                    self.ffn_expansion, self.aim_reduction,
                    self.group_block_pattern[i % len(self.group_block_pattern)],
                    dpr[g * depth + i], dtype=self.dtype,
                    name=f"groups_{g}_blocks_{i}",
                )(res, train)
            deep = Conv2d(
                self.embed_dim, 3, use_bias=False, dtype=self.dtype, name=f"groups_{g}_conv"
            )(res) + deep
        deep = Conv2d(self.embed_dim, 3, use_bias=False, dtype=self.dtype, name="conv_after")(deep)

        feat = deep + shallow
        # reference fdat_arch.py:263: UniUpsampleV3(upsampler_type, scale, ...)
        out = UniUpsampleV3(
            self.upsampler_type, net_scale, self.num_out_ch, self.mid_dim, 4,
            dtype=self.dtype, name="upsampler",
        )(feat)
        return out[:, : in_h * self.scale, : in_w * self.scale, :].astype(jnp.float32)


def _fdat_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        kwargs.pop("img_range", None)
        # reference factory presets default to transpose+conv (fdat_arch.py:323+)
        cfg.setdefault("upsampler_type", "transpose+conv")
        cfg.update(kwargs)
        cfg["group_block_pattern"] = tuple(
            cfg.get("group_block_pattern") or ("spatial", "channel")
        )
        return FDAT(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_fdat_factory(embed_dim=96, num_groups=2, depth_per_group=2), name="fdat_tiny")
ARCH_REGISTRY.register(_fdat_factory(embed_dim=96, num_groups=3, depth_per_group=2), name="fdat_light")
ARCH_REGISTRY.register(_fdat_factory(embed_dim=120, num_groups=4, depth_per_group=3), name="fdat_medium")
ARCH_REGISTRY.register(_fdat_factory(embed_dim=180, num_groups=6, depth_per_group=3), name="fdat_large")
ARCH_REGISTRY.register(_fdat_factory(embed_dim=240, num_groups=8, depth_per_group=3), name="fdat_xl")
