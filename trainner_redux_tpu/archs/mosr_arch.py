"""MoSR — Mamba-Out SR (gated CNN blocks), flax/NHWC.

Parity: the reference's spandrel-backed mosr/mosr_t factories
(/root/reference/traiNNer/archs/mosr_arch.py:23-76), implementing the MoSR
architecture (umzi2): MambaOut-style gated CNN blocks — expand, partial
depthwise large-kernel conv, gate multiply, project — with a pixel-shuffle
or DySample tail.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, DySample, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class GatedCNNBlock(nn.Module):
    dim: int
    expansion_ratio: float = 1.5
    conv_ratio: float = 1.0
    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        hidden = int(d * self.expansion_ratio)
        conv_ch = int(d * self.conv_ratio)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = Conv2d(hidden * 2, 3, dtype=self.dtype, name="fc1")(x)
        g, rest = x[..., :hidden], x[..., hidden:]
        i_part, c_part = rest[..., : hidden - conv_ch], rest[..., hidden - conv_ch :]
        c_part = Conv2d(
            conv_ch, self.kernel_size, feature_group_count=conv_ch,
            dtype=self.dtype, name="conv",
        )(c_part)
        x = nn.gelu(g, approximate=False) * jnp.concatenate([i_part, c_part], axis=-1)
        x = Conv2d(d, 1, dtype=self.dtype, name="fc2")(x)
        return x + shortcut


class MoSR(nn.Module):
    upscale: int = 4
    in_ch: int = 3
    out_ch: int = 3
    n_block: int = 24
    dim: int = 64
    upsampler: str = "ps"
    kernel_size: int = 7
    expansion_ratio: float = 1.5
    conv_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="head")(x)
        body = feat
        for i in range(self.n_block):
            body = GatedCNNBlock(
                self.dim, self.expansion_ratio, self.conv_ratio, self.kernel_size,
                dtype=self.dtype, name=f"blocks_{i}",
            )(body)
        feat = feat + body
        if self.upsampler == "dys":
            out = DySample(
                self.dim, self.out_ch, scale=self.upscale, dtype=self.dtype, name="dysample"
            )(feat, train)
        else:  # "ps" / "gps" (geo-ensemble approximated by plain pixelshuffle)
            out = Conv2d(
                self.out_ch * self.upscale**2, 3, dtype=self.dtype, name="tail"
            )(feat)
            out = pixel_shuffle(out, self.upscale)
        return out.astype(jnp.float32)


_UP_MAP = {"pixelshuffle": "ps", "dysample": "dys", "geoensemblepixelshuffle": "gps"}


def _mosr_factory(n_block: int, dim: int):
    def factory(scale: int = 4, in_ch: int = 3, out_ch: int = 3, n_block: int = n_block,
                dim: int = dim, upsampler: str = "pixelshuffle", drop_path: float = 0.0,
                kernel_size: int = 7, expansion_ratio: float = 1.5,
                conv_ratio: float = 1.0, **kw) -> MoSR:
        return MoSR(
            upscale=scale, in_ch=in_ch, out_ch=out_ch, n_block=n_block, dim=dim,
            upsampler=_UP_MAP.get(upsampler, upsampler), kernel_size=kernel_size,
            expansion_ratio=expansion_ratio, conv_ratio=conv_ratio, **kw,
        )

    return factory


ARCH_REGISTRY.register(_mosr_factory(24, 64), name="mosr")
ARCH_REGISTRY.register(_mosr_factory(5, 48), name="mosr_t")
