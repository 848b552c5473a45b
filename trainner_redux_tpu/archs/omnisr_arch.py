"""OmniSR — Omni Aggregation Networks for Lightweight SR (flax/NHWC).

Parity: the reference's spandrel-backed omnisr factory
(/root/reference/traiNNer/archs/omnisr_arch.py), implementing OmniSR (Wang
et al., CVPR 2023): OSA blocks that aggregate spatially (block/window
attention then grid attention, MaxViT-style) and across channels (channel
self-attention), glued with MBConv-lite local mixing and gated conv
feed-forwards; OSAG residual groups; pixel-shuffle tail with input residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import (
    WindowAttention,
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


def _grid_partition(x: jnp.ndarray, gs: int) -> jnp.ndarray:
    """MaxViT grid attention: tokens at stride H/gs form one group.
    (B,H,W,C) -> (B*gs*gs windows of size (H/gs * W/gs), C) — implemented by
    transposing the roles of window index and intra-window index."""
    b, h, w, c = x.shape
    x = x.reshape(b, gs, h // gs, gs, w // gs, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (b, h/gs, w/gs, gs, gs, c)
    return x.reshape(-1, gs * gs, c), (h // gs, w // gs)


def _grid_reverse(x: jnp.ndarray, gs: int, dims, h: int, w: int) -> jnp.ndarray:
    nh, nw = dims
    b = x.shape[0] // (nh * nw)
    x = x.reshape(b, nh, nw, gs, gs, -1)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, -1)


class MBConvLite(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.dim, 1, dtype=self.dtype, name="expand")(x)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(self.dim, 3, feature_group_count=self.dim, dtype=self.dtype, name="dw")(y)
        y = nn.gelu(y, approximate=False)
        # squeeze-excite
        se = y.mean(axis=(1, 2), keepdims=True)
        se = Conv2d(max(1, self.dim // 4), 1, dtype=self.dtype, name="se_0")(se)
        se = nn.gelu(se, approximate=False)
        se = nn.sigmoid(Conv2d(self.dim, 1, dtype=self.dtype, name="se_1")(se))
        y = y * se
        return x + Conv2d(self.dim, 1, dtype=self.dtype, name="proj")(y)


class ChannelAttention(nn.Module):
    dim: int
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.heads
        hd = c // nh
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        qkv = Conv2d(c * 3, 1, dtype=self.dtype, name="qkv")(x)
        qkv = Conv2d(
            c * 3, 3, feature_group_count=c * 3, dtype=self.dtype, name="qkv_dw"
        )(qkv)
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1), jnp.float32)

        def heads_t(t):
            return t.reshape(b, h * w, nh, hd).transpose(0, 2, 3, 1)  # (b,nh,hd,n)

        q, k, v = heads_t(q), heads_t(k), heads_t(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jax.nn.softmax(
            (jnp.einsum("bhcn,bhdn->bhcd", q, k, preferred_element_type=jnp.float32)
             * temp[None]).astype(jnp.float32),
            axis=-1,
        ).astype(self.dtype)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v.astype(self.dtype))
        out = out.transpose(0, 3, 1, 2).reshape(b, h, w, c)
        return shortcut + Conv2d(c, 1, dtype=self.dtype, name="proj")(out)


class GatedConvFFN(nn.Module):
    dim: int
    mult: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hd = int(self.dim * self.mult)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        y = Conv2d(hd * 2, 1, dtype=self.dtype, name="proj_in")(x)
        a, g = jnp.split(y, 2, axis=-1)
        g = Conv2d(hd, 3, feature_group_count=hd, dtype=self.dtype, name="dw")(g)
        y = a * nn.gelu(g, approximate=False)
        return shortcut + Conv2d(self.dim, 1, dtype=self.dtype, name="proj_out")(y)


class OSABlock(nn.Module):
    dim: int
    window_size: int = 8
    heads: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ws = self.window_size
        b, h, w, c = x.shape
        x = MBConvLite(self.dim, dtype=self.dtype, name="mbconv")(x)

        # block (window) attention
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm_b")(x)
        win = window_partition(xn, ws)
        attn = WindowAttention(
            self.dim, ws, self.heads, dtype=self.dtype, name="block_attn"
        )(win, None)
        x = x + window_reverse(attn, ws, h, w)

        # grid attention (dilated/global mixing)
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm_g")(x)
        grid, dims = _grid_partition(xn, ws)
        attn = WindowAttention(
            self.dim, ws, self.heads, dtype=self.dtype, name="grid_attn"
        )(grid, None)
        x = x + _grid_reverse(attn, ws, dims, h, w)

        # channel aggregation + gated conv FFNs
        x = ChannelAttention(self.dim, self.heads, dtype=self.dtype, name="channel_attn")(x)
        x = GatedConvFFN(self.dim, dtype=self.dtype, name="ffn1")(x)
        return x


class OSAG(nn.Module):
    dim: int
    block_num: int = 1
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.block_num):
            x = OSABlock(self.dim, self.window_size, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = Conv2d(self.dim, 1, dtype=self.dtype, name="conv")(x)
        return x + res


class OmniSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    upsampling: int = 4
    res_num: int = 5
    block_num: int = 1
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        # grid attention needs dims divisible by ws in both roles
        mult = ws * ws
        ph = (-h) % ws
        pw = (-w) % ws
        # pad so both H/ws and ws divide: pad to multiple of ws is sufficient
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        # additionally ensure (H/ws) % 1 fine; grid partition needs H % ws == 0 only

        residual = Conv2d(self.num_feat, 3, dtype=self.dtype, name="input_conv")(x)
        out = residual
        for i in range(self.res_num):
            out = OSAG(
                self.num_feat, self.block_num, ws, dtype=self.dtype, name=f"residual_layer_{i}"
            )(out)
        out = Conv2d(self.num_feat, 3, dtype=self.dtype, name="output_conv")(out) + residual
        up = Conv2d(
            self.num_out_ch * self.upsampling**2, 3, dtype=self.dtype, name="up_conv"
        )(out)
        up = pixel_shuffle(up, self.upsampling)
        return up[:, : h * self.upsampling, : w * self.upsampling, :].astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def omnisr(
    scale: int = 4, num_in_ch: int = 3, num_out_ch: int = 3, num_feat: int = 64,
    res_num: int = 5, block_num: int = 1, window_size: int = 8, **kw,
) -> OmniSR:
    for k in ("bias", "pe", "ffn_bias"):
        kw.pop(k, None)
    return OmniSR(
        num_in_ch=num_in_ch, num_out_ch=num_out_ch, num_feat=num_feat,
        upsampling=scale, res_num=res_num, block_num=block_num,
        window_size=window_size, **kw,
    )
