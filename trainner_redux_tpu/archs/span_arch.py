"""SPAN — Swift Parameter-free Attention Network (flax/NHWC).

Behavior parity with /root/reference/traiNNer/archs/span_arch.py:97-324
(Conv3XC re-parameterized conv :97, SPAB block :214, SPAN :251) and the
factory presets (span :327, span_s :350, span_f32/f64/f96 :373+).

TPU-native notes:
- Training uses the decomposed Conv3XC path (1x1 -> 3x3 -> 1x1 + 1x1 skip),
  which XLA fuses; inference folds the chain into a single 3x3 kernel with
  one einsum per layer (the torch version mutates an `eval_conv` buffer —
  here fusion is a pure function of the params, jit-safe and differentiable).
- The "parameter-free attention" sigmoid gate is elementwise VPU work fused
  into the surrounding convs by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY, SPANDREL_REGISTRY


class Conv3XC(nn.Module):
    """Re-parameterizable conv: train-time 1x1->3x3->1x1 (+1x1 skip), eval-time
    a single fused 3x3 conv computed from the same parameters."""

    c_in: int
    c_out: int
    gain: int = 1
    stride: int = 1
    relu: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        g = self.gain
        zero = jnp.zeros(())
        k1 = self.param(
            "conv0_kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.c_in, self.c_in * g),
            jnp.float32,
        )
        b1 = (self.param("conv0_bias", nn.initializers.zeros, (self.c_in * g,), jnp.float32)
              if self.use_bias else jnp.zeros((self.c_in * g,), jnp.float32))
        k2 = self.param(
            "conv1_kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.c_in * g, self.c_out * g),
            jnp.float32,
        )
        b2 = (self.param("conv1_bias", nn.initializers.zeros, (self.c_out * g,), jnp.float32)
              if self.use_bias else jnp.zeros((self.c_out * g,), jnp.float32))
        k3 = self.param(
            "conv2_kernel",
            nn.initializers.lecun_normal(),
            (1, 1, self.c_out * g, self.c_out),
            jnp.float32,
        )
        b3 = (self.param("conv2_bias", nn.initializers.zeros, (self.c_out,), jnp.float32)
              if self.use_bias else jnp.zeros((self.c_out,), jnp.float32))
        sk_k = self.param(
            "sk_kernel", nn.initializers.lecun_normal(), (1, 1, self.c_in, self.c_out), jnp.float32
        )
        sk_b = (self.param("sk_bias", nn.initializers.zeros, (self.c_out,), jnp.float32)
                if self.use_bias else jnp.zeros((self.c_out,), jnp.float32))

        dt = self.dtype
        dn = ("NHWC", "HWIO", "NHWC")

        if train:
            # pad first (matches the reference: border pixels see conv0's bias)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            y = jax.lax.conv_general_dilated(
                xp.astype(dt), k1.astype(dt), (1, 1), "VALID", dimension_numbers=dn
            ) + b1.astype(dt)
            y = jax.lax.conv_general_dilated(
                y, k2.astype(dt), (self.stride, self.stride), "VALID", dimension_numbers=dn
            ) + b2.astype(dt)
            y = jax.lax.conv_general_dilated(
                y, k3.astype(dt), (1, 1), "VALID", dimension_numbers=dn
            ) + b3.astype(dt)
            sk = jax.lax.conv_general_dilated(
                x.astype(dt),
                sk_k.astype(dt),
                (self.stride, self.stride),
                "VALID",
                dimension_numbers=dn,
            ) + sk_b.astype(dt)
            out = y + sk
        else:
            # fuse 1x1 * 3x3 * 1x1 into one 3x3 kernel (pure function of params)
            w = jnp.einsum("im,hwmn,no->hwio", k1[0, 0], k2, k3[0, 0])
            b = (b1 @ k2.sum((0, 1)) + b2) @ k3[0, 0] + b3
            # center-pad the 1x1 skip kernel into the fused 3x3 (pad instead
            # of scatter-add: same math, and it keeps the graph ONNX-exportable)
            w = w + jnp.pad(sk_k, ((1, 1), (1, 1), (0, 0), (0, 0)))
            b = b + sk_b
            out = jax.lax.conv_general_dilated(
                x.astype(dt),
                w.astype(dt),
                (self.stride, self.stride),
                [(1, 1), (1, 1)],
                dimension_numbers=dn,
            ) + b.astype(dt)

        if self.relu:
            out = nn.leaky_relu(out, negative_slope=0.05)
        return out


class SPAB(nn.Module):
    """Swift parameter-free attention block."""

    in_channels: int
    mid_channels: int | None = None
    out_channels: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        mid = self.mid_channels or self.in_channels
        out_c = self.out_channels or self.in_channels
        out1 = Conv3XC(self.in_channels, mid, gain=2, dtype=self.dtype, name="c1_r")(x, train)
        out1_act = nn.silu(out1)
        out2 = Conv3XC(mid, mid, gain=2, dtype=self.dtype, name="c2_r")(out1_act, train)
        out2_act = nn.silu(out2)
        out3 = Conv3XC(mid, out_c, gain=2, dtype=self.dtype, name="c3_r")(out2_act, train)
        sim_att = jax.nn.sigmoid(out3) - 0.5
        out = (out3 + x) * sim_att
        # the reference's act1 is SiLU(inplace=True) (span_arch.py:232,237):
        # it mutates out1 in place, so the block actually RETURNS silu(out1) —
        # conv_cat consumes the activated tensor (verified by golden fixture)
        return out, out1_act, sim_att


class SPAN(nn.Module):
    """Swift Parameter-free Attention Network for efficient SR."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    feature_channels: int = 48
    upscale: int = 4
    bias: bool = True
    norm: bool = True
    img_range: float = 255.0
    rgb_mean: tuple[float, float, float] = (0.4488, 0.4371, 0.4040)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        fc = self.feature_channels
        if self.norm:
            mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
            x = (x - mean) * self.img_range

        out_feature = Conv3XC(self.num_in_ch, fc, gain=2, dtype=self.dtype, name="conv_1")(
            x, train
        )
        out_b1, _, _ = SPAB(fc, dtype=self.dtype, name="block_1")(out_feature, train)
        out_b2, _, _ = SPAB(fc, dtype=self.dtype, name="block_2")(out_b1, train)
        out_b3, _, _ = SPAB(fc, dtype=self.dtype, name="block_3")(out_b2, train)
        out_b4, _, _ = SPAB(fc, dtype=self.dtype, name="block_4")(out_b3, train)
        out_b5, _, _ = SPAB(fc, dtype=self.dtype, name="block_5")(out_b4, train)
        out_b6, out_b5_2, _ = SPAB(fc, dtype=self.dtype, name="block_6")(out_b5, train)

        out_b6 = Conv3XC(fc, fc, gain=2, dtype=self.dtype, name="conv_2")(out_b6, train)
        cat = jnp.concatenate([out_feature, out_b6, out_b1, out_b5_2], axis=-1)
        out = Conv2d(fc, 1, dtype=self.dtype, name="conv_cat")(cat)
        out = Conv2d(
            self.num_out_ch * self.upscale**2, 3, dtype=self.dtype, name="upsampler_conv"
        )(out)
        # NOTE: the reference applies input normalization but no output
        # de-normalization (span_arch.py:304-325); factories default norm=False.
        output = pixel_shuffle(out, self.upscale)
        return output.astype(jnp.float32)


def _span_factory(feature_channels: int):
    def factory(
        scale: int = 4,
        num_in_ch: int = 3,
        num_out_ch: int = 3,
        feature_channels: int = feature_channels,
        bias: bool = True,
        norm: bool = False,
        img_range: float = 255.0,
        rgb_mean: tuple[float, float, float] = (0.4488, 0.4371, 0.4040),
        **kwargs,
    ) -> SPAN:
        return SPAN(
            num_in_ch=num_in_ch,
            num_out_ch=num_out_ch,
            feature_channels=feature_channels,
            upscale=scale,
            bias=bias,
            norm=norm,
            img_range=img_range,
            rgb_mean=tuple(rgb_mean),
            **kwargs,
        )

    return factory


SPANDREL_REGISTRY.register(_span_factory(52), name="span")
SPANDREL_REGISTRY.register(_span_factory(48), name="span_s")
ARCH_REGISTRY.register(_span_factory(32), name="span_f32")
ARCH_REGISTRY.register(_span_factory(64), name="span_f64")
ARCH_REGISTRY.register(_span_factory(96), name="span_f96")
