"""SPANPlus (flax/NHWC) — SPAN with grouped SPAB stages and DySample.

Parity: /root/reference/traiNNer/archs/spanplus_arch.py:159-320 (SPABS,
SpanPlus with spanplus/spanplus_s/spanplus_st/spanplus_sts presets).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, DySample, Dtype, mish, pixel_shuffle
from trainner_redux_tpu.archs.span_arch import Conv3XC
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class SPABPlus(nn.Module):
    """SpanPlus's SPAB variant: Mish activations (reference
    spanplus_arch.py:130-155; SPAN's SPAB uses SiLU). The inplace Mish means
    the end block returns mish(out1)."""

    in_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.in_channels
        out1 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c1_r")(x, train)
        out1_act = mish(out1)
        out2 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c2_r")(out1_act, train)
        out2_act = mish(out2)
        out3 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c3_r")(out2_act, train)
        sim_att = nn.sigmoid(out3) - 0.5
        return (out3 + x) * sim_att, out1_act


class SPABS(nn.Module):
    feature_channels: int
    n_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        fc = self.feature_channels
        out_b1, _ = SPABPlus(fc, dtype=self.dtype, name="block_1")(x, train)
        out = out_b1
        for i in range(self.n_blocks):
            out, _ = SPABPlus(fc, dtype=self.dtype, name=f"block_n_{i}")(out, train)
        out_end, out_x_2 = SPABPlus(fc, dtype=self.dtype, name="block_end")(out, train)
        out_end = Conv3XC(fc, fc, gain=2, dtype=self.dtype, name="conv_2")(out_end, train)
        # reference cat order: [x, out_end, out_b1, mish(out1_of_end)]
        cat = jnp.concatenate([x, out_end, out_b1, out_x_2], axis=-1)
        return Conv2d(fc, 1, dtype=self.dtype, name="conv_cat")(cat)


class SpanPlus(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    blocks: tuple = (4,)
    feature_channels: int = 48
    upscale: int = 4
    upsampler: str = "dys"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        fc = self.feature_channels
        feat = Conv3XC(self.num_in_ch, fc, gain=2, dtype=self.dtype, name="feats_0")(x, train)
        for i, nb in enumerate(self.blocks):
            feat = SPABS(fc, nb, dtype=self.dtype, name=f"feats_{i + 1}")(feat, train)
        if self.upsampler == "ps":
            out = Conv2d(
                self.num_in_ch * self.upscale**2, 3, dtype=self.dtype, name="up_conv"
            )(feat)
            out = pixel_shuffle(out, self.upscale)
        elif self.upsampler == "dys":
            out = DySample(
                fc, self.num_out_ch, scale=self.upscale, dtype=self.dtype, name="dysample"
            )(feat, train)
        else:  # conv, 1x only
            out = Conv2d(self.num_out_ch, 3, dtype=self.dtype, name="up_conv")(feat)
        return out.astype(jnp.float32)


def _spanplus_factory(feature_channels: int, blocks: tuple, upsampler: str):
    def factory(scale: int = 4, num_in_ch: int = 3, num_out_ch: int = 3,
                blocks=blocks, feature_channels: int = feature_channels,
                drop_rate: float = 0.0, upsampler: str = upsampler, **kw) -> SpanPlus:
        return SpanPlus(
            num_in_ch=num_in_ch, num_out_ch=num_out_ch, blocks=tuple(blocks),
            feature_channels=feature_channels, upscale=scale, upsampler=upsampler, **kw,
        )

    return factory


ARCH_REGISTRY.register(_spanplus_factory(48, (4,), "dys"), name="spanplus")
ARCH_REGISTRY.register(_spanplus_factory(32, (2,), "dys"), name="spanplus_s")
ARCH_REGISTRY.register(_spanplus_factory(48, (4,), "ps"), name="spanplus_st")
ARCH_REGISTRY.register(_spanplus_factory(32, (2,), "ps"), name="spanplus_sts")
