"""LMLT — Low-to-high Multi-Level (vision) Transformer for SR (flax/NHWC).

Parity: reference traiNNer/archs/lmlt_arch.py:362-489 (LMLT + tiny/base/
large factories): channel LayerNorm, LHSB multi-level windowed attention
(channels chunked into 4 levels, max-pooled pyramid, coarse-to-fine
attention with nearest upsample feedback, aggregated 1x1 + GELU gate),
CCM feed-forward, pixelshuffle tail. Single-head window attention with
depthwise LePE positional encoding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.archs.swinir_arch import window_partition, window_reverse
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class DownsampleViT(nn.Module):
    dim: int
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        win = window_partition(x, ws)  # (b*nW, ws*ws, c)
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(win)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # LePE: depthwise conv over the v windows
        v_img = v.reshape(-1, ws, ws, c)
        lepe = Conv2d(c, 3, feature_group_count=c, dtype=self.dtype, name="get_v")(v_img)
        lepe = lepe.reshape(-1, ws * ws, c)

        attn = jnp.einsum(
            "bnc,bmc->bnm", q * (c**-0.5), k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v) + lepe
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        return window_reverse(out, ws, h, w)


class LHSB(nn.Module):
    dim: int
    n_levels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        cl = c // self.n_levels
        chunks = [x[..., i * cl : (i + 1) * cl] for i in range(self.n_levels)]
        feats = []
        for i, ch in enumerate(chunks):
            if i > 0:
                f = 2**i
                ch = nn.max_pool(ch, (f, f), strides=(f, f))
            feats.append(ch)

        vits = [
            DownsampleViT(cl, dtype=self.dtype, name=f"mfr_{i}")
            for i in range(self.n_levels)
        ]
        outs = []
        for i in reversed(range(self.n_levels)):
            s = vits[i](feats[i])
            up2 = jnp.repeat(jnp.repeat(s, 2, axis=1), 2, axis=2)
            if i > 0:
                feats[i - 1] = feats[i - 1] + up2
            full = jax.image.resize(s, (b, h, w, cl), "nearest")
            outs.append(full)
        agg = Conv2d(c, 1, padding=0, dtype=self.dtype, name="aggr")(
            jnp.concatenate(outs, axis=-1)
        )
        return nn.gelu(agg, approximate=False) * x


class AttBlock(nn.Module):
    dim: int
    ffn_scale: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ChannelLayerNorm(self.dim, name="norm1")(x)
        x = LHSB(self.dim, dtype=self.dtype, name="lhsb")(y) + x
        y = ChannelLayerNorm(self.dim, name="norm2")(x)
        hidden = int(self.dim * self.ffn_scale)
        y = Conv2d(hidden, 3, dtype=self.dtype, name="ccm_0")(y)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="ccm_1")(y)
        return y + x


class LMLT(nn.Module):
    scale: int = 4
    dim: int = 60
    n_blocks: int = 8
    ffn_scale: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mult = 8 * 8  # window_size * deepest downsample
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="to_feat")(y)
        feat = y
        for i in range(self.n_blocks):
            feat = AttBlock(self.dim, self.ffn_scale, dtype=self.dtype, name=f"feats_{i}")(feat)
        y = (feat + y)[:, :h0, :w0, :]
        y = Conv2d(3 * self.scale**2, 3, dtype=self.dtype, name="to_img")(y)
        return pixel_shuffle(y, self.scale).astype(jnp.float32)


def _lmlt_factory(dim):
    def factory(scale: int = 4, **kwargs):
        for k in ("drop_rate", "attn_drop_rate", "drop_path_rate"):
            kwargs.pop(k, None)
        kwargs.setdefault("dim", dim)
        return LMLT(scale=scale, **kwargs)

    return factory


ARCH_REGISTRY.register(_lmlt_factory(36), name="lmlt_tiny")
ARCH_REGISTRY.register(_lmlt_factory(60), name="lmlt_base")
ARCH_REGISTRY.register(_lmlt_factory(84), name="lmlt_large")
