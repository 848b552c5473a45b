"""ESC-Real — Emulating Self-attention with Convolution, real-world variant
(flax/NHWC).

Parity: reference traiNNer/archs/escreal_arch.py:421-570 (ESCRealM +
escrealm_xl): shared geo-ensembled 13x13 partial large-kernel filter
(orthogonal init, 8-orientation average), ConvolutionalAttention mixing the
static LK conv with per-sample GAP-generated dynamic 3x3 depthwise kernels,
32x32 window attention with transposed-Swin relative position bias, ConvFFN
stacks, dual skip branch, UniUpsample tail (transpose+conv default lowers to
input-dilated convs).
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn
import numpy as np

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    UniUpsampleV3,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _geo_ensemble(k: jnp.ndarray) -> jnp.ndarray:
    """8-orientation average of an OIHW-like (H, W, I, O) kernel (reference
    escreal_arch.py:399-418)."""
    flips = [
        k,
        k[:, ::-1], k[::-1], k[::-1, ::-1],
    ]
    kr = jnp.rot90(k, -1, axes=(0, 1))
    flips += [kr, kr[:, ::-1], kr[::-1], kr[::-1, ::-1]]
    return sum(flips) / 8.0


def _rpe_bias(table: jnp.ndarray, ws: int) -> jnp.ndarray:
    """Transposed-Swin relative position bias (nh, ws^2, ws^2)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"), 0)
    coords = coords.reshape(2, -1)
    rel = coords[:, None, :] - coords[:, :, None]  # k - q per reference
    rel = rel + ws - 1
    idx = rel[0] * (2 * ws - 1) + rel[1]  # (n, n), [q, k] with k-q offsets
    return table[:, jnp.asarray(idx.reshape(-1))].reshape(table.shape[0], ws * ws, ws * ws)


class ConvFFN(nn.Module):
    dim: int
    kernel_size: int
    exp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.exp_ratio)
        y = nn.gelu(Conv2d(hid, 1, padding=0, dtype=self.dtype, name="proj")(x),
                    approximate=False)
        d = Conv2d(hid, self.kernel_size, feature_group_count=hid, dtype=self.dtype,
                   name="dwc")(y)
        y = nn.gelu(d, approximate=False) + y
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="aggr")(y)


class ConvolutionalAttention(nn.Module):
    pdim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lk_filter: jnp.ndarray) -> jnp.ndarray:
        p = self.pdim
        x1, x2 = x[..., :p], x[..., p:]
        z = jnp.mean(x1, axis=(1, 2), keepdims=True)
        z = nn.gelu(Conv2d(p // 2, 1, padding=0, dtype=self.dtype, name="dwc_proj_0")(z),
                    approximate=False)
        # zero-init final projection (reference zero-inits dwc_proj[-1]) so the
        # dynamic branch starts inactive
        wz = self.param("dwc_proj_w", nn.initializers.zeros, (p // 2, p * 9), jnp.float32)
        bz = self.param("dwc_proj_b", nn.initializers.zeros, (p * 9,), jnp.float32)
        z = jnp.einsum("bhwc,co->bhwo", z, wz.astype(z.dtype)) + bz.astype(z.dtype)
        # torch reshapes (b, p*9) -> (b*p, 1, 3, 3): channel-major p, then kh/kw
        dyn = z.reshape(x.shape[0], p, 3, 3).transpose(0, 2, 3, 1)[:, :, :, None, :]

        def one(xi, ki):
            return lax.conv_general_dilated(
                xi[None], ki.astype(xi.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=p,
            )[0]

        dyn_out = jax.vmap(one)(x1, dyn)
        klk = lk_filter.shape[0]
        stat = lax.conv_general_dilated(
            x1, lk_filter.astype(x.dtype), (1, 1),
            [(klk // 2, klk // 2), (klk // 2, klk // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.concatenate([stat + dyn_out, x2], axis=-1)


class WindowAttentionESC(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = c // nh
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        hp, wp = xp.shape[1], xp.shape[2]
        qkv = Conv2d(c * 3, 1, padding=0, dtype=self.dtype, name="to_qkv")(xp)
        qkv = qkv.reshape(b, hp // ws, ws, wp // ws, ws, 3, nh, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(3, -1, nh, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        table = self.param(
            "relative_position_bias",
            lambda key, shape, dtype=jnp.float32: jax.random.normal(key, shape, dtype) * 0.001,
            (nh, (2 * ws - 1) ** 2), jnp.float32,
        )
        bias = _rpe_bias(table, ws)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.reshape(b, hp // ws, wp // ws, nh, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return Conv2d(c, 1, padding=0, dtype=self.dtype, name="to_out")(out)


class ESCBlock(nn.Module):
    dim: int
    pdim: int
    conv_blocks: int
    window_size: int
    num_heads: int
    exp_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, plk_filter: jnp.ndarray) -> jnp.ndarray:
        skip = x
        y = ChannelLayerNorm(self.dim, name="ln_proj")(x)
        y = ConvFFN(self.dim, 3, 2.0, dtype=self.dtype, name="proj")(y)
        y = y + WindowAttentionESC(
            self.dim, self.window_size, self.num_heads, dtype=self.dtype, name="attn"
        )(ChannelLayerNorm(self.dim, name="ln_attn")(y))
        for i in range(self.conv_blocks):
            z = ChannelLayerNorm(self.dim, name=f"lns_{i}")(y)
            z = ConvFFN(self.dim, 3, self.exp_ratio, dtype=self.dtype,
                        name=f"convffns_{i}")(z)
            z = ConvolutionalAttention(self.pdim, dtype=self.dtype,
                                       name=f"pconvs_{i}_plk")(z, plk_filter)
            z = Conv2d(self.dim, 1, padding=0, dtype=self.dtype,
                       name=f"pconvs_{i}_aggr")(z)
            y = y + z
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="conv_out")(
            ChannelLayerNorm(self.dim, name="ln_out")(y)
        )
        return y + skip


class ESCRealM(nn.Module):
    scale: int = 4
    dim: int = 64
    pdim: int = 16
    kernel_size: int = 13
    n_blocks: int = 10
    conv_blocks: int = 5
    window_size: int = 32
    num_heads: int = 4
    exp_ratio: float = 2.0
    mid_dim: int = 64
    upsampler: str = "transpose+conv"
    unshuffle_mod: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        scale = self.scale
        unshuffle = 0
        if self.unshuffle_mod and self.scale < 3:
            unshuffle = 4 // self.scale
            scale = 4
            pad = unshuffle
            ph, pw = (pad - h0 % pad) % pad, (pad - w0 % pad) % pad
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        xin = pixel_unshuffle(x, unshuffle) if unshuffle else x
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="proj")(xin)

        sk = Conv2d(self.dim * 2, 1, padding=0, dtype=self.dtype, name="skip_0")(xin)
        # reference dw conv uses padding_mode="reflect" (escreal_arch.py:474-478)
        sk = jnp.pad(sk, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        sk = Conv2d(self.dim * 2, 7, padding=0, feature_group_count=self.dim * 2,
                    dtype=self.dtype, name="skip_dw")(sk)
        sk = nn.leaky_relu(sk, 0.2)
        sk = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="skip_1")(sk)

        plk = self.param(
            "plk_filter", nn.initializers.orthogonal(),
            (self.kernel_size, self.kernel_size, self.pdim, self.pdim), jnp.float32,
        )
        plk = _geo_ensemble(plk)
        skip = feat
        for bi in range(self.n_blocks):
            feat = ESCBlock(
                self.dim, self.pdim, self.conv_blocks, self.window_size,
                self.num_heads, self.exp_ratio, dtype=self.dtype, name=f"blocks_{bi}",
            )(feat, plk)
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="last")(feat) + skip + sk

        out = UniUpsampleV3(
            mode=self.upsampler, scale=scale, out_dim=3, mid_dim=self.mid_dim,
            group=4, dtype=self.dtype, name="to_img",
        )(feat)
        return out[:, : h0 * self.scale, : w0 * self.scale, :].astype(jnp.float32)


def _esc_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        kwargs.pop("attn_type", None)
        cfg.update(kwargs)
        return ESCRealM(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_esc_factory(), name="escrealm")
ARCH_REGISTRY.register(
    _esc_factory(dim=128, pdim=32, n_blocks=16, num_heads=8, upsampler="pixelshuffle"),
    name="escrealm_xl",
)
