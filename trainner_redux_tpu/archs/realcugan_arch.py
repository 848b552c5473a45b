"""RealCUGAN — UpCunet 2x/3x/4x cascaded UNets (flax/NHWC).

Parity: the reference's spandrel-backed realcugan factory
(/root/reference/traiNNer/archs/realcugan_arch.py:11-36), implementing the
Real-CUGAN anime SR nets: a shallow UNet1 that upsamples via transposed
conv, a deeper UNet2 refiner at output resolution, all convs VALID-padded
with exact crop margins (20 px at output scale) and reflect pre-padding.
`pro` mode rescales the value range (x*0.7+0.15) as the pro checkpoints
expect.

TPU notes: transposed convs are `nn.Conv` with `input_dilation` (XLA lowers
to one conv_general_dilated on the MXU); non-overlapping 2x2-stride-2
deconvs become dense + depth-to-space. The `fast` 2x variant (upstream
UpCunet2x_fast) is the 4x trunk applied to a pixel-unshuffled input:
reflect-pad the FULL-RES input by 38 (dims rounded to multiples of 4) ->
unshuffle(2) -> 12ch at half res (border 19 after unshuffle),
UNet1(64)/UNet2(64), conv_final -> 12ch, crop 1, pixel-shuffle(2) back to
2x, plus a nearest-2x skip of the original input — every crop margin closes
exactly against the 4x shape algebra (D=38+ph/2 in, 2D-76 out = 2*ph).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    pixel_shuffle,
    pixel_unshuffle,
)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class TorchDeconv(nn.Module):
    """torch ConvTranspose2d(k, s, p) semantics: out = (n-1)*s - 2p + k."""

    features: int
    kernel_size: int
    stride: int
    torch_padding: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.torch_padding
        pad = k - 1 - p
        return nn.Conv(
            features=self.features,
            kernel_size=(k, k),
            input_dilation=(s, s),
            padding=[(pad, pad), (pad, pad)],
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class SEBlock(nn.Module):
    in_ch: int
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = Conv2d(
            max(1, self.in_ch // self.reduction), 1, padding=0, dtype=self.dtype,
            name="conv1",
        )(z)
        z = nn.relu(z)
        z = Conv2d(self.in_ch, 1, padding=0, dtype=self.dtype, name="conv2")(z)
        return x * nn.sigmoid(z)


class UNetConv(nn.Module):
    mid_ch: int
    out_ch: int
    se: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(self.mid_ch, 3, padding=0, dtype=self.dtype, name="conv0")(x)
        x = nn.leaky_relu(x, 0.1)
        x = Conv2d(self.out_ch, 3, padding=0, dtype=self.dtype, name="conv1")(x)
        x = nn.leaky_relu(x, 0.1)
        if self.se:
            x = SEBlock(self.out_ch, dtype=self.dtype, name="seblock")(x)
        return x


def _crop(x: jnp.ndarray, m: int) -> jnp.ndarray:
    return x[:, m:-m, m:-m, :]


class UNet1(nn.Module):
    """Shallow UNet; `deconv_k/s/p` select the 2x (4,2,3) or 3x (5,3,2) tail."""

    out_ch: int
    deconv_k: int = 4
    deconv_s: int = 2
    deconv_p: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype, name="conv1")(x)
        x2 = Conv2d(64, 2, stride=2, padding=0, dtype=self.dtype, name="conv1_down")(x1)
        x1 = _crop(x1, 4)
        x2 = nn.leaky_relu(x2, 0.1)
        x2 = UNetConv(128, 64, se=True, dtype=self.dtype, name="conv2")(x2)
        # non-overlapping 2x2-stride-2 deconv == dense + depth-to-space
        x2 = Conv2d(64 * 4, 1, padding=0, dtype=self.dtype, name="conv2_up")(x2)
        x2 = pixel_shuffle(x2, 2)
        x2 = nn.leaky_relu(x2, 0.1)
        x3 = Conv2d(64, 3, padding=0, dtype=self.dtype, name="conv3")(x1 + x2)
        x3 = nn.leaky_relu(x3, 0.1)
        return TorchDeconv(
            self.out_ch, self.deconv_k, self.deconv_s, self.deconv_p,
            dtype=self.dtype, name="conv_bottom",
        )(x3)


class UNet2(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = UNetConv(32, 64, se=False, dtype=self.dtype, name="conv1")(x)
        x2 = Conv2d(64, 2, stride=2, padding=0, dtype=self.dtype, name="conv1_down")(x1)
        x1 = _crop(x1, 16)
        x2 = nn.leaky_relu(x2, 0.1)
        x2 = UNetConv(64, 128, se=True, dtype=self.dtype, name="conv2")(x2)
        x3 = Conv2d(128, 2, stride=2, padding=0, dtype=self.dtype, name="conv2_down")(x2)
        x2 = _crop(x2, 4)
        x3 = nn.leaky_relu(x3, 0.1)
        x3 = UNetConv(256, 128, se=True, dtype=self.dtype, name="conv3")(x3)
        x3 = Conv2d(128 * 4, 1, padding=0, dtype=self.dtype, name="conv3_up")(x3)
        x3 = pixel_shuffle(x3, 2)
        x3 = nn.leaky_relu(x3, 0.1)
        x4 = UNetConv(64, 64, se=True, dtype=self.dtype, name="conv4")(x2 + x3)
        x4 = Conv2d(64 * 4, 1, padding=0, dtype=self.dtype, name="conv4_up")(x4)
        x4 = pixel_shuffle(x4, 2)
        x4 = nn.leaky_relu(x4, 0.1)
        x5 = Conv2d(64, 3, padding=0, dtype=self.dtype, name="conv5")(x1 + x4)
        x5 = nn.leaky_relu(x5, 0.1)
        return Conv2d(self.out_ch, 3, padding=0, dtype=self.dtype, name="conv_bottom")(x5)


def _reflect_pad_to(x: jnp.ndarray, mult: int, border: int) -> jnp.ndarray:
    h, w = x.shape[1], x.shape[2]
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    return jnp.pad(
        x,
        ((0, 0), (border, border + ph), (border, border + pw), (0, 0)),
        mode="reflect",
    )


class UpCunet(nn.Module):
    """scale in {2, 3, 4}; pro rescales the dynamic range."""

    scale: int = 2
    in_chans: int = 3
    out_chans: int = 3
    pro: bool = False
    fast: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        x00 = x
        if self.pro:
            x = x * 0.7 + 0.15

        if self.fast:  # UpCunet2x_fast: the 4x trunk on a pixel-unshuffled input
            # upstream pads the FULL-RES input by 38 (ph/pw rounded up to
            # multiples of 4 so the unshuffled dims stay even) BEFORE
            # PixelUnshuffle(2); reflect padding does not commute with
            # unshuffle, so padding at half resolution diverges from the
            # reference in a border band (ADVICE r3, verified numerically)
            ph = -(-h0 // 4) * 4
            pw = -(-w0 // 4) * 4
            x = jnp.pad(
                x,
                ((0, 0), (38, 38 + ph - h0), (38, 38 + pw - w0), (0, 0)),
                mode="reflect",
            )
            xi = pixel_unshuffle(x, 2)  # (38 + ph/2, 38 + pw/2, 4*in)
            u1_out = UNet1(64, dtype=self.dtype, name="unet1")(xi)
            res = UNet2(64, dtype=self.dtype, name="unet2")(u1_out)
            out = res + _crop(u1_out, 20)
            out = Conv2d(
                self.out_chans * 4, 3, padding=0, dtype=self.dtype, name="conv_final"
            )(out)
            out = _crop(out, 1)
            out = pixel_shuffle(out, 2)
            out = out[:, : h0 * 2, : w0 * 2, :]
            up = jnp.repeat(jnp.repeat(x00, 2, axis=1), 2, axis=2)
            out = out + up[:, : h0 * 2, : w0 * 2, :]
            return out.astype(jnp.float32)

        if self.scale == 3:
            xp = _reflect_pad_to(x, 4, 14)
            u1_out = UNet1(
                self.out_chans, deconv_k=5, deconv_s=3, deconv_p=2,
                dtype=self.dtype, name="unet1",
            )(xp)
            res = UNet2(self.out_chans, dtype=self.dtype, name="unet2")(u1_out)
            out = res + _crop(u1_out, 20)
            out = out[:, : h0 * 3, : w0 * 3, :]
        elif self.scale == 4:
            xp = _reflect_pad_to(x, 2, 19)
            u1_out = UNet1(64, dtype=self.dtype, name="unet1")(xp)
            res = UNet2(64, dtype=self.dtype, name="unet2")(u1_out)
            out = res + _crop(u1_out, 20)
            out = Conv2d(
                self.out_chans * 4, 3, padding=0, dtype=self.dtype, name="conv_final"
            )(out)
            out = _crop(out, 1)
            out = pixel_shuffle(out, 2)
            out = out[:, : h0 * 4, : w0 * 4, :]
            up = jnp.repeat(jnp.repeat(x, 4, axis=1), 4, axis=2)
            out = out + up[:, : h0 * 4, : w0 * 4, :]
        else:  # 2x
            xp = _reflect_pad_to(x, 2, 18)
            u1_out = UNet1(self.out_chans, dtype=self.dtype, name="unet1")(xp)
            res = UNet2(self.out_chans, dtype=self.dtype, name="unet2")(u1_out)
            out = res + _crop(u1_out, 20)
            out = out[:, : h0 * 2, : w0 * 2, :]

        if self.pro:
            out = (out - 0.15) / 0.7
        return out.astype(jnp.float32)


def realcugan(
    scale: int = 4,
    pro: bool = False,
    fast: bool = False,
    in_channels: int = 3,
    out_channels: int = 3,
    **kwargs,
) -> UpCunet:
    if fast and scale != 2:
        raise ValueError("Fast is only supported with a scale of 2.")
    if pro and fast:
        raise ValueError(
            "Pro is not supported with fast enabled, disable pro or disable fast."
        )
    if scale not in (2, 3, 4):
        raise ValueError(f"Scale must be 2, 3, or 4, not: {scale}")
    return UpCunet(
        scale=scale, in_chans=in_channels, out_chans=out_channels, pro=pro, fast=fast
    )


SPANDREL_REGISTRY.register(realcugan, name="realcugan")
