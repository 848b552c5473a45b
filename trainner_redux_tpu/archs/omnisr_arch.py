"""OmniSR — Omni Aggregation Networks for Lightweight SR (flax/NHWC).

Parity: the reference's spandrel-backed omnisr factory
(/root/reference/traiNNer/archs/omnisr_arch.py:6-28) pins the configuration
surface (num_feat 64, block_num, pe, window_size 8, res_num 5, bias); the
module composition mirrors the upstream Omni-SR repo (Francis0625/Omni-SR,
components/OSA.py + OSAG.py + esa.py — the layout spandrel checkpoints
carry) so `utils/torch_compat.py` can map checkpoints key-for-key:

OSA_Block.layer (Sequential indices in brackets) =
  [0] MBConv(expansion 1, SE 0.25, residual)          fn.{0,2,4.gate.{1,3},5}
  [2] PreNormResidual(LN, window Attention)           norm / fn.to_qkv /
                                                      fn.rel_pos_bias / fn.to_out.0
  [4] Conv_PreNormResidual(chanLN g/b, Gated_Conv_FeedForward)
  [6] PreNormResidual(LN, grid Attention)
  [8] Conv_PreNormResidual(Gated_Conv_FeedForward)
  [9] Conv_PreNormResidual(Channel_Attention)         per-window channel attn
  [10] Conv_PreNormResidual(Gated_Conv_FeedForward)
  [11] Conv_PreNormResidual(Channel_Attention_grid)
  [12] Conv_PreNormResidual(Gated_Conv_FeedForward)
OSAG = residual_layer.{j<block_num}=OSA_Block, residual_layer.{block_num}=
  1x1 conv, then esa (RLFN-style light ESA) applied after the residual add.
Top level: input / residual_layer.{i} / output / up.0 + PixelShuffle.

TPU notes: window/grid partitions are pure reshape/transpose; attention is
einsum on the MXU with fp32 softmax; the MaxViT relative-position index
formula equals Swin's, so the table layout is shared with swinir_arch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import (
    _relative_position_index,
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


def _grid_partition(x: jnp.ndarray, gs: int):
    """MaxViT grid attention: upstream Rearrange
    'b d (w1 x) (w2 y) -> b x y w1 w2 d' — tokens with the same inner (x, y)
    across the gs*gs outer tiles form one group. (B,H,W,C) -> (B*nG, gs*gs, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, gs, h // gs, gs, w // gs, c)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (b, x, y, w1, w2, c)
    return x.reshape(-1, gs * gs, c), (h // gs, w // gs)


def _grid_reverse(x: jnp.ndarray, gs: int, dims, h: int, w: int) -> jnp.ndarray:
    nh, nw = dims
    b = x.shape[0] // (nh * nw)
    x = x.reshape(b, nh, nw, gs, gs, -1)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, h, w, -1)


class ChannelLayerNormGB(nn.Module):
    """Upstream OSA.py LayerNorm: channel mean/var (biased), g/b affine."""

    dim: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * g + b
        return y.astype(self.dtype)


class MBConvResidual(nn.Module):
    """Upstream MBConv(expansion_rate=1, shrinkage_rate=0.25) with residual."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="expand")(x)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(d, 3, feature_group_count=d, dtype=self.dtype, name="dw")(y)
        y = nn.gelu(y, approximate=False)
        # squeeze-excite: mean -> Linear(no bias) -> SiLU -> Linear(no bias) -> sigmoid
        se = y.mean(axis=(1, 2))
        se = nn.Dense(max(1, int(d * 0.25)), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="se_fc1")(se)
        se = nn.silu(se)
        se = nn.Dense(d, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                      name="se_fc2")(se)
        y = y * nn.sigmoid(se)[:, None, None, :]
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="proj")(y)
        return x + y


class OSAAttention(nn.Module):
    """Upstream Attention: to_qkv/to_out Linears (no bias), dim_head = dim/4,
    optional MaxViT relative-position bias (same table layout as Swin)."""

    dim: int
    window_size: int
    with_pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b_, n, c = x.shape
        hd = c // 4
        nh = c // hd
        qkv = nn.Dense(c * 3, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        if self.with_pe:
            table = self.param(
                "rel_pos_bias",
                nn.initializers.normal(0.02),
                ((2 * self.window_size - 1) ** 2, nh),
                jnp.float32,
            )
            idx = jnp.asarray(_relative_position_index(self.window_size))
            bias = jnp.take(table, idx.reshape(-1), axis=0)
            bias = bias.reshape(n, n, nh).transpose(2, 0, 1)
            attn = attn + bias[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class GatedConvFFN(nn.Module):
    """Upstream Gated_Conv_FeedForward: project_in -> dwconv on BOTH halves
    -> gelu(x1)*x2 -> project_out (all bias-free at mult=1)."""

    dim: int
    mult: float = 1.0
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.mult)
        y = Conv2d(hid * 2, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                   name="project_in")(x)
        y = Conv2d(hid * 2, 3, feature_group_count=hid * 2, use_bias=self.use_bias,
                   dtype=self.dtype, name="dwconv")(y)
        y = nn.gelu(y[..., :hid], approximate=False) * y[..., hid:]
        return Conv2d(self.dim, 1, padding=0, use_bias=self.use_bias,
                      dtype=self.dtype, name="project_out")(y)


class ChannelAttention(nn.Module):
    """Upstream Channel_Attention(_grid): qkv 1x1 + depthwise 3x3, L2-normed
    q/k, learned per-head temperature; attention runs across the per-head
    channel dim within each ps*ps window (grid=False) or each grid group
    (grid=True)."""

    dim: int
    heads: int = 4
    ps: int = 8
    grid: bool = False
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.heads
        hd = c // nh
        ps = self.ps
        qkv = Conv2d(c * 3, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                     name="qkv")(x)
        qkv = Conv2d(c * 3, 3, feature_group_count=c * 3, use_bias=self.use_bias,
                     dtype=self.dtype, name="qkv_dwconv")(qkv)
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1),
                          jnp.float32)
        nx, ny = h // ps, w // ps

        def groups(t: jnp.ndarray) -> jnp.ndarray:
            # upstream Channel_Attention: groups = ps*ps blocks (h w outer),
            # tokens = within-block offsets; _grid variant: groups = inner
            # offsets (ph pw), tokens = the block lattice (h w) — transposed
            # roles. Output (b*nG, nh, hd, n_tokens).
            t = t.reshape(b, nx, ps, ny, ps, c)
            if self.grid:
                t = t.transpose(0, 2, 4, 1, 3, 5).reshape(-1, nx * ny, c)
            else:
                t = t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ps * ps, c)
            n = t.shape[1]
            return t.reshape(-1, n, nh, hd).transpose(0, 2, 3, 1)

        q = groups(qkv[..., :c])
        k = groups(qkv[..., c : 2 * c])
        v = groups(qkv[..., 2 * c :])
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum("bhcn,bhdn->bhcd", q, k,
                          preferred_element_type=jnp.float32) * temp[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhcd,bhdn->bhcn", attn, v.astype(self.dtype))
        n = out.shape[-1]
        out = out.transpose(0, 3, 1, 2).reshape(-1, n, c)  # (b*nG, n, c)
        if self.grid:
            out = out.reshape(b, ps, ps, nx, ny, c).transpose(0, 3, 1, 4, 2, 5)
        else:
            out = out.reshape(b, nx, ny, ps, ps, c).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, h, w, c)
        return Conv2d(c, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                      name="project_out")(out)


class ESA(nn.Module):
    """RLFN-style light enhanced spatial attention (upstream esa.py)."""

    esa_ch: int
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.esa_ch
        c1_ = Conv2d(f, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        c1 = Conv2d(f, 3, stride=2, padding=0, dtype=self.dtype, name="conv2")(c1_)
        vmax = nn.max_pool(c1, (7, 7), strides=(3, 3))
        c3 = Conv2d(f, 3, dtype=self.dtype, name="conv3")(vmax)
        c3 = jax.image.resize(
            c3.astype(jnp.float32), (x.shape[0], x.shape[1], x.shape[2], f), "linear"
        ).astype(self.dtype)
        cf = Conv2d(f, 1, padding=0, dtype=self.dtype, name="conv_f")(c1_)
        c4 = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv4")(c3 + cf)
        return x * nn.sigmoid(c4)


class OSABlock(nn.Module):
    dim: int
    window_size: int = 8
    with_pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ws = self.window_size
        b, h, w, c = x.shape
        d = self.dim
        x = MBConvResidual(d, dtype=self.dtype, name="mbconv")(x)

        # [2] window attention (PreNormResidual, token LN)
        win = window_partition(x, ws)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="block_norm")(win)
        y = OSAAttention(d, ws, self.with_pe, dtype=self.dtype, name="block_attn")(y)
        x = window_reverse(win + y, ws, h, w)
        # [4] gated conv FFN (Conv_PreNormResidual, channel LN)
        x = x + GatedConvFFN(d, dtype=self.dtype, name="ffn1")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="ffn1_norm")(x)
        )
        # [6] grid attention
        grid, dims = _grid_partition(x, ws)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="grid_norm")(grid)
        y = OSAAttention(d, ws, self.with_pe, dtype=self.dtype, name="grid_attn")(y)
        x = _grid_reverse(grid + y, ws, dims, h, w)
        # [8]
        x = x + GatedConvFFN(d, dtype=self.dtype, name="ffn2")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="ffn2_norm")(x)
        )
        # [9] per-window channel attention
        x = x + ChannelAttention(d, 4, ws, grid=False, dtype=self.dtype,
                                 name="channel_attn")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="ca_norm")(x)
        )
        # [10]
        x = x + GatedConvFFN(d, dtype=self.dtype, name="ffn3")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="ffn3_norm")(x)
        )
        # [11] grid channel attention
        x = x + ChannelAttention(d, 4, ws, grid=True, dtype=self.dtype,
                                 name="channel_attn_grid")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="cag_norm")(x)
        )
        # [12]
        x = x + GatedConvFFN(d, dtype=self.dtype, name="ffn4")(
            ChannelLayerNormGB(d, dtype=self.dtype, name="ffn4_norm")(x)
        )
        return x


class OSAG(nn.Module):
    dim: int
    block_num: int = 1
    window_size: int = 8
    with_pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.block_num):
            x = OSABlock(self.dim, self.window_size, self.with_pe,
                         dtype=self.dtype, name=f"blocks_{i}")(x)
        x = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv")(x)
        x = x + res
        return ESA(max(self.dim // 4, 16), self.dim, dtype=self.dtype, name="esa")(x)


class OmniSR(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    upsampling: int = 4
    res_num: int = 5
    block_num: int = 1
    window_size: int = 8
    pe: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        ph, pw = (-h) % ws, (-w) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        residual = Conv2d(self.num_feat, 3, dtype=self.dtype, name="input_conv")(x)
        out = residual
        for i in range(self.res_num):
            out = OSAG(self.num_feat, self.block_num, ws, self.pe,
                       dtype=self.dtype, name=f"residual_layer_{i}")(out)
        out = Conv2d(self.num_feat, 3, dtype=self.dtype, name="output_conv")(out) + residual
        up = Conv2d(
            self.num_out_ch * self.upsampling**2, 3, dtype=self.dtype, name="up_conv"
        )(out)
        up = pixel_shuffle(up, self.upsampling)
        return up[:, : h * self.upsampling, : w * self.upsampling, :].astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def omnisr(
    scale: int = 4, num_in_ch: int = 3, num_out_ch: int = 3, num_feat: int = 64,
    res_num: int = 5, block_num: int = 1, window_size: int = 8, pe: bool = True,
    **kw,
) -> OmniSR:
    for k in ("bias", "ffn_bias"):
        kw.pop(k, None)
    return OmniSR(
        num_in_ch=num_in_ch, num_out_ch=num_out_ch, num_feat=num_feat,
        upsampling=scale, res_num=res_num, block_num=block_num,
        window_size=window_size, pe=pe, **kw,
    )
