"""CascadedGaze (CGNet) — NAFNet-style 1x restoration U-Net with global
context extractors (flax/NHWC).

Parity: reference traiNNer/archs/cgnet_arch.py:361-469 (CascadedGaze):
CascadedGazeBlock encoders (dw-expanded conv + cascaded strided depthwise-
separable global context branches range-fused via nearest upsample, simple
channel attention, simple-gate FFN with beta/gamma zero-init residuals),
NAFBlock middle/decoder stages, pixel-shuffle ups with skip adds, global
input residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _sg(x: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1] // 2
    return x[..., :c] * x[..., c:]


def _torch_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') parity: src = floor(dst*in/out).
    jax.image.resize('nearest') rounds from half-pixel centers, which picks
    different source pixels for non-integer ratios (the GCE branches emit
    7->16 style upsamples)."""
    import numpy as np

    hi = (np.arange(size[0]) * x.shape[1] // size[0]).astype(np.int32)
    wi = (np.arange(size[1]) * x.shape[2] // size[1]).astype(np.int32)
    return x[:, hi][:, :, wi]


class DWSepConv(nn.Module):
    """Depthwise (k, stride, VALID) + pointwise 1x1."""

    ch: int
    kernel: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(
            self.ch, self.kernel, stride=self.stride, padding=0,
            feature_group_count=self.ch, use_bias=False, dtype=self.dtype,
            name="depthwise",
        )(x)
        return Conv2d(self.ch, 1, padding=0, use_bias=False, dtype=self.dtype,
                      name="pointwise")(y)


class CascadedGazeBlock(nn.Module):
    c: int
    gce_conv: int = 2
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        b, h, w, c = x.shape
        dw = self.c * self.dw_expand
        y = ChannelLayerNorm(self.c, name="norm1")(x)
        y = Conv2d(dw, 1, padding=0, dtype=self.dtype, name="conv1")(y)
        y = Conv2d(dw, 3, feature_group_count=dw, dtype=self.dtype, name="conv2")(y)
        y = nn.gelu(y, approximate=False)

        half = y[..., : dw // 2] + y[..., dw // 2 :]
        if self.gce_conv == 3:
            specs = [(3, 2), (3, 3), (5, 4)]
        else:
            specs = [(3, 2), (3, 3)]
        feats = [y]
        g = half
        for gi, (k, s) in enumerate(specs):
            g = nn.gelu(
                DWSepConv(self.c, k, s, dtype=self.dtype, name=f"gce_{gi}")(g),
                approximate=False,
            )
            feats.append(_torch_nearest(g, (h, w)))
        y = jnp.concatenate(feats, axis=-1)
        sca = Conv2d(y.shape[-1], 1, padding=0, dtype=self.dtype, name="sca")(
            jnp.mean(y, axis=(1, 2), keepdims=True)
        )
        y = y * sca
        y = Conv2d(self.c, 1, padding=0, dtype=self.dtype, name="project_out")(y)

        beta = self.param("beta", nn.initializers.zeros, (self.c,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (self.c,), jnp.float32)
        mid = inp + y * beta.astype(x.dtype)
        y = Conv2d(self.ffn_expand * self.c, 1, padding=0, dtype=self.dtype,
                   name="conv4")(ChannelLayerNorm(self.c, name="norm2")(mid))
        y = _sg(y)
        y = Conv2d(self.c, 1, padding=0, dtype=self.dtype, name="conv5")(y)
        return mid + y * gamma.astype(x.dtype)


class NAFBlock(nn.Module):
    c: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inp = x
        dw = self.c * self.dw_expand
        y = ChannelLayerNorm(self.c, name="norm1")(x)
        y = Conv2d(dw, 1, padding=0, dtype=self.dtype, name="conv1")(y)
        y = Conv2d(dw, 3, feature_group_count=dw, dtype=self.dtype, name="conv2")(y)
        y = _sg(y)
        sca = Conv2d(dw // 2, 1, padding=0, dtype=self.dtype, name="sca")(
            jnp.mean(y, axis=(1, 2), keepdims=True)
        )
        y = y * sca
        y = Conv2d(self.c, 1, padding=0, dtype=self.dtype, name="conv3")(y)
        beta = self.param("beta", nn.initializers.zeros, (self.c,), jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (self.c,), jnp.float32)
        mid = inp + y * beta.astype(x.dtype)
        y = Conv2d(self.ffn_expand * self.c, 1, padding=0, dtype=self.dtype,
                   name="conv4")(ChannelLayerNorm(self.c, name="norm2")(mid))
        y = _sg(y)
        y = Conv2d(self.c, 1, padding=0, dtype=self.dtype, name="conv5")(y)
        return mid + y * gamma.astype(x.dtype)


class CascadedGaze(nn.Module):
    img_channel: int = 3
    width: int = 60
    middle_blk_num: int = 10
    enc_blk_nums: tuple = (2, 2, 4, 6)
    dec_blk_nums: tuple = (2, 2, 2, 2)
    gce_convs: tuple = (3, 3, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mult = 2 ** len(self.enc_blk_nums)
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        inp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))

        y = Conv2d(self.width, 3, dtype=self.dtype, name="intro")(inp)
        chan = self.width
        encs = []
        for li, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                y = CascadedGazeBlock(
                    chan, self.gce_convs[li], dtype=self.dtype, name=f"enc_{li}_b{bi}"
                )(y)
            encs.append(y)
            y = Conv2d(2 * chan, 2, stride=2, padding=0, dtype=self.dtype,
                       name=f"down_{li}")(y)
            chan *= 2
        for bi in range(self.middle_blk_num):
            y = NAFBlock(chan, dtype=self.dtype, name=f"middle_{bi}")(y)
        for li, num in enumerate(self.dec_blk_nums):
            y = Conv2d(chan * 2, 1, padding=0, use_bias=False, dtype=self.dtype,
                       name=f"up_{li}")(y)
            y = pixel_shuffle(y, 2)
            chan //= 2
            y = y + encs[-(li + 1)]
            for bi in range(num):
                y = NAFBlock(chan, dtype=self.dtype, name=f"dec_{li}_b{bi}")(y)
        out = Conv2d(self.img_channel, 3, dtype=self.dtype, name="ending")(y) + inp
        return out[:, :h0, :w0, :].astype(jnp.float32)


def _cgnet_factory(scale: int = 1, **kwargs):
    if scale != 1:
        raise ValueError("CascadedGaze is a 1x restoration network")
    ren = {"enc_blk_nums": "enc_blk_nums", "dec_blk_nums": "dec_blk_nums",
           "GCE_CONVS_nums": "gce_convs"}
    cfg = {}
    for k, v in kwargs.items():
        kk = ren.get(k, k)
        cfg[kk] = tuple(v) if isinstance(v, list) else v
    return CascadedGaze(**cfg)


ARCH_REGISTRY.register(_cgnet_factory, name="cascadedgaze")
ARCH_REGISTRY.register(_cgnet_factory, name="cgnet")
