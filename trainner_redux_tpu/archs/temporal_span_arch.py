"""TemporalSPAN — multi-frame video SR on the SPAN backbone (flax/NHWC).

Parity: /root/reference/traiNNer/archs/temporal_span_arch.py:269-412.
Input is a clip (B, T, H, W, C); the center frame gets a full-width feature
extractor, history frames get slim ones, features are fused and flow through
the standard SPAB chain to a pixel-shuffle upsampler producing the center
frame at scale x.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.plksr_arch import GroupNormTorch
from trainner_redux_tpu.archs.span_arch import Conv3XC
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class TemporalSPAB(nn.Module):
    """TemporalSPAN's SPAB variant: GroupNorm(8) after every Conv3XC
    (reference temporal_span_arch.py:225-266). The inplace SiLU means the
    returned intermediate is silu(norm1(out1))."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = self.channels
        out1 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c1_r")(x, train)
        out1 = GroupNormTorch(8, dtype=self.dtype, name="norm1")(out1)
        out1_act = nn.silu(out1)
        out2 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c2_r")(out1_act, train)
        out2 = GroupNormTorch(8, dtype=self.dtype, name="norm2")(out2)
        out3 = Conv3XC(c, c, gain=2, dtype=self.dtype, name="c3_r")(nn.silu(out2), train)
        out3 = GroupNormTorch(8, dtype=self.dtype, name="norm3")(out3)
        sim_att = nn.sigmoid(out3) - 0.5
        return (out3 + x) * sim_att, out1_act, sim_att


class TemporalSPAN(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_frames: int = 5
    feature_channels: int = 48
    upscale: int = 4
    bias: bool = True
    history_channels: int = 12

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (B, T, H, W, C)
        b, t, h, w, c = x.shape
        if t != self.num_frames:
            raise ValueError(
                f"Expected input with {self.num_frames} frames, but received {t} frames."
            )
        fc = self.feature_channels
        center = self.num_frames // 2

        feats = []
        hist_idx = 0
        for i in range(t):
            if i == center:
                feats.append(
                    Conv3XC(self.num_in_ch, fc, gain=2, dtype=self.dtype, name="center_conv")(
                        x[:, i], train
                    )
                )
            else:
                feats.append(
                    Conv3XC(
                        self.num_in_ch, self.history_channels, gain=2, dtype=self.dtype,
                        name=f"history_convs_{hist_idx}",
                    )(x[:, i], train)
                )
                hist_idx += 1

        fused = jnp.concatenate(feats, axis=-1)
        total = fc + self.history_channels * (t - 1)
        fused = Conv3XC(total, fc, gain=2, dtype=self.dtype, name="fusion_conv_0")(fused, train)
        out_feature = Conv3XC(fc, fc, gain=2, dtype=self.dtype, name="fusion_conv_1")(
            fused, train
        )

        out_b1, _, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_1")(out_feature, train)
        out_b2, _, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_2")(out_b1, train)
        out_b3, _, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_3")(out_b2, train)
        out_b4, _, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_4")(out_b3, train)
        out_b5, _, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_5")(out_b4, train)
        out_b6, out_b5_2, _ = TemporalSPAB(fc, dtype=self.dtype, name="block_6")(out_b5, train)

        out_b6 = Conv3XC(fc, fc, gain=2, dtype=self.dtype, name="conv_2")(out_b6, train)
        cat = jnp.concatenate([out_feature, out_b6, out_b1, out_b5_2], axis=-1)
        out = Conv2d(fc, 1, dtype=self.dtype, name="conv_cat")(cat)
        out = Conv2d(
            self.num_out_ch * self.upscale**2, 3, dtype=self.dtype, name="upsampler_conv"
        )(out)
        return pixel_shuffle(out, self.upscale).astype(jnp.float32)


@ARCH_REGISTRY.register(name="temporalspan")
def temporalspan(
    scale: int = 4,
    num_in_ch: int = 3,
    num_out_ch: int = 3,
    num_frames: int = 5,
    feature_channels: int = 48,
    bias: bool = True,
    history_channels: int = 12,
    **kwargs,
) -> TemporalSPAN:
    return TemporalSPAN(
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        num_frames=num_frames,
        feature_channels=feature_channels,
        upscale=scale,
        bias=bias,
        history_channels=history_channels,
        **kwargs,
    )
