"""MoSRv2 — MambaOut SR v2 (flax/NHWC).

Parity: reference traiNNer/archs/mosrv2_arch.py:127-192 (MoSRv2): gated CNN
blocks with Inception depthwise mixer and RMS/channel LayerNorm, optional
input pixel-unshuffle (unshuffle_mod), conv refinement head, UniUpsample
tail, bilinear upsampled skip connection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    UniUpsampleV3,
    mish,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm, InceptionDWConv2d
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ChannelRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        offset = self.param("offset", nn.initializers.zeros, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True))
        xn = xf / (rms + self.eps)
        return (scale * xn + offset).astype(x.dtype)


class GatedCNNBlockV2(nn.Module):
    """MoSRv2 variant: conv branch fixed at `dim` channels."""

    dim: int
    expansion_ratio: float = 1.5
    rms_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        hidden = int(self.expansion_ratio * self.dim)
        norm_cls = ChannelRMSNorm if self.rms_norm else ChannelLayerNorm
        y = norm_cls(self.dim, name="norm")(x)
        y = Conv2d(hidden * 2, 3, dtype=self.dtype, name="fc1")(y)
        g = y[..., :hidden]
        i = y[..., hidden : 2 * hidden - self.dim]
        c = y[..., 2 * hidden - self.dim :]
        c = InceptionDWConv2d(self.dim, dtype=self.dtype, name="conv")(c)
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="fc2")(
            mish(g) * jnp.concatenate([i, c], axis=-1)
        )
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        return mish(y) * gamma.astype(x.dtype) + shortcut


class MoSRv2(nn.Module):
    scale: int = 4
    in_ch: int = 3
    n_block: int = 24
    dim: int = 64
    upsampler: str = "pixelshuffledirect"
    expansion_ratio: float = 1.5
    mid_dim: int = 32
    unshuffle_mod: bool = True
    rms_norm: bool = False
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
        pad = unshuffle if unshuffle else 1
        ph, pw = (pad - h0 % pad) % pad, (pad - w0 % pad) % pad
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        y = pixel_unshuffle(xp, unshuffle) if unshuffle else xp
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_dim")(y)
        for bi in range(self.n_block):
            y = GatedCNNBlockV2(
                self.dim, self.expansion_ratio, self.rms_norm, dtype=self.dtype,
                name=f"gblocks_{bi}",
            )(y)
        y = mish(Conv2d(self.dim * 2, 3, dtype=self.dtype, name="refine_0")(y))
        y = mish(Conv2d(self.dim, 3, dtype=self.dtype, name="refine_1")(y))
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="refine_2")(y)
        out = UniUpsampleV3(
            mode=self.upsampler, scale=scale, out_dim=self.in_ch,
            mid_dim=self.mid_dim, dtype=self.dtype, name="to_img",
        )(y)
        short = jax.image.resize(
            xp, (xp.shape[0], xp.shape[1] * self.scale, xp.shape[2] * self.scale, xp.shape[3]),
            method="linear",
        ).astype(out.dtype)
        # note: out is at `scale`x of the (possibly unshuffled) grid == self.scale x
        # of the padded input, same as the bilinear skip
        return (out + short)[:, : h0 * self.scale, : w0 * self.scale, :].astype(jnp.float32)


def _mosrv2_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        cfg.update(kwargs)
        return MoSRv2(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_mosrv2_factory(), name="mosrv2")
