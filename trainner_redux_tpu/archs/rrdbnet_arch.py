"""RRDBNet (ESRGAN) generator, flax/NHWC.

Capability parity with the reference's spandrel-backed ESRGAN factories
(/root/reference/traiNNer/archs/rrdbnet_arch.py:10-56): Residual-in-Residual
Dense Blocks, nearest-neighbor x2 upsample stages, and the pixel-unshuffle
trick that turns scale-1/2 models into scale-4 compute (in_nc *= 4^(3-scale)).

TPU notes: dense-block concatenations stay in NHWC so every 3x3 conv hits the
MXU with the channel dim last; bf16 compute; residual scaling of 0.2 keeps
bf16-safe magnitudes.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_unshuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class ResidualDenseBlock(nn.Module):
    num_feat: int = 64
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x1 = lrelu(Conv2d(self.num_grow_ch, 3, dtype=self.dtype, name="conv1")(x))
        x2 = lrelu(
            Conv2d(self.num_grow_ch, 3, dtype=self.dtype, name="conv2")(
                jnp.concatenate([x, x1], -1)
            )
        )
        x3 = lrelu(
            Conv2d(self.num_grow_ch, 3, dtype=self.dtype, name="conv3")(
                jnp.concatenate([x, x1, x2], -1)
            )
        )
        x4 = lrelu(
            Conv2d(self.num_grow_ch, 3, dtype=self.dtype, name="conv4")(
                jnp.concatenate([x, x1, x2, x3], -1)
            )
        )
        x5 = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1)
        )
        return x5 * 0.2 + x


class RRDB(nn.Module):
    num_feat: int
    num_grow_ch: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb1")(x)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb2")(out)
        out = ResidualDenseBlock(self.num_feat, self.num_grow_ch, self.dtype, name="rdb3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    """ESRGAN generator. `shuffle_factor`>1 pixel-unshuffles the input first
    (the scale-1/2 trick), after which the network itself upsamples by 4."""

    num_in_ch: int = 3
    num_out_ch: int = 3
    scale: int = 4
    num_feat: int = 64
    num_block: int = 23
    num_grow_ch: int = 32
    shuffle_factor: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        if self.shuffle_factor > 1:
            # pad to a multiple of shuffle_factor, then space-to-depth
            f = self.shuffle_factor
            pad_h = (f - in_h % f) % f
            pad_w = (f - in_w % f) % f
            if pad_h or pad_w:
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            x = pixel_unshuffle(x, f)

        feat = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_first")(x)
        body = feat
        for i in range(self.num_block):
            body = RRDB(self.num_feat, self.num_grow_ch, self.dtype, name=f"body_{i}")(body)
        body = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_body")(body)
        feat = feat + body

        # upsample: nearest x2 stages (network scale is 4 when shuffled)
        net_scale = self.scale if self.shuffle_factor == 1 else 4
        n_up = int(math.log2(net_scale)) if net_scale > 1 else 0
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        for i in range(n_up):
            feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
            feat = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype, name=f"conv_up{i + 1}")(feat))
        if net_scale == 3:
            feat = jnp.repeat(jnp.repeat(feat, 3, axis=1), 3, axis=2)
            feat = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_up1")(feat))

        feat = lrelu(Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_hr")(feat))
        out = Conv2d(self.num_out_ch, 3, dtype=self.dtype, name="conv_last")(feat)

        if self.shuffle_factor > 1:
            # crop away upsampled padding: final size is exactly scale * input
            out = out[:, : in_h * self.scale, : in_w * self.scale, :]
        return out.astype(jnp.float32)


pixel_unshuffle_scales = (1, 2)


@SPANDREL_REGISTRY.register()
def esrgan(
    scale: int = 4,
    use_pixel_unshuffle: bool = True,
    in_nc: int = 3,
    out_nc: int = 3,
    num_filters: int = 64,
    num_blocks: int = 23,
    **kwargs,
) -> RRDBNet:
    """ESRGAN factory with the reference's pixel-unshuffle scale mapping
    (rrdbnet_arch.py:10-37): scale 2 -> unshuffle x2, scale 1 -> unshuffle x4,
    so the network core always computes at x4."""
    if use_pixel_unshuffle and scale in pixel_unshuffle_scales:
        eff_in_nc = in_nc * 4 ** (3 - scale)
        shuffle_factor = int(math.sqrt(eff_in_nc / out_nc))
        return RRDBNet(
            num_in_ch=eff_in_nc,
            num_out_ch=out_nc,
            scale=scale,
            num_feat=num_filters,
            num_block=num_blocks,
            shuffle_factor=shuffle_factor,
            **kwargs,
        )
    return RRDBNet(
        num_in_ch=in_nc,
        num_out_ch=out_nc,
        scale=scale,
        num_feat=num_filters,
        num_block=num_blocks,
        **kwargs,
    )


@SPANDREL_REGISTRY.register()
def esrgan_lite(
    scale: int = 4,
    use_pixel_unshuffle: bool = True,
    in_nc: int = 3,
    out_nc: int = 3,
    num_filters: int = 32,
    num_blocks: int = 12,
    **kwargs,
) -> RRDBNet:
    return esrgan(
        scale=scale,
        use_pixel_unshuffle=use_pixel_unshuffle,
        in_nc=in_nc,
        out_nc=out_nc,
        num_filters=num_filters,
        num_blocks=num_blocks,
        **kwargs,
    )
