"""SCUNet (aaf6aa variant) — swin-conv U-Net for image restoration/SR
(flax/NHWC).

Parity: reference traiNNer/archs/scunet_aaf6aa_arch.py:392-666
(SCUNet_aaf6aa): conv head, three ConvTransBlock down stages with stride-2
channel-doubling convs, transformer body, mirrored up path (nearest+conv
Upconv for scale>1, non-overlapping deconv for scale 1), optional residual
conv from the head features, RRDBUpsample tail for SR scales, reflect
pre-padding to multiples of 64 centered on the crop. Training-time Gaussian
noise injection uses a straight-through estimator as in the reference.

Reuses the TSCUNet ConvTransBlock (same SCUNet block family).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.rrdbnet_arch import RRDB
from trainner_redux_tpu.archs.tscunet_arch import ConvTransBlock
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class SCUNetAAF(nn.Module):
    scale: int = 1
    in_nc: int = 3
    out_nc: int = 3
    dim: int = 64
    config: tuple = (2, 2, 2, 2, 2, 2, 2)
    head_dim: int = 32
    window_size: int = 8
    residual: bool = True
    noise_sigma: float = 0.05
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        d = self.dtype
        dim = self.dim
        h0, w0 = x.shape[1], x.shape[2]
        pad_h = (-h0) % 64
        pad_w = (-w0) % 64
        if not train:
            # reference adds 64px extra padding per axis in eval
            # (scunet_aaf6aa_arch.py:633-635)
            pad_h += 64
            pad_w += 64
        top, left = (pad_h + 1) // 2, (pad_w + 1) // 2
        x0 = jnp.pad(
            x, ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0)), mode="reflect"
        )

        def noise(y):
            if not train or self.noise_sigma == 0:
                return y
            n = jax.random.normal(self.make_rng("dropout"), y.shape, y.dtype)
            return y + jax.lax.stop_gradient(n * self.noise_sigma)

        def ct_stage(y, c_dim, n, name):
            for i in range(n):
                y = ConvTransBlock(
                    c_dim, c_dim, self.head_dim, self.window_size, bool(i % 2),
                    dtype=d, name=f"{name}_{i}",
                )(y, train)
                y = noise(y)
            return y

        x1 = Conv2d(dim, 3, use_bias=False, dtype=d, name="m_head")(x0)
        y = ct_stage(x1, dim // 2, self.config[0], "down1")
        x2 = Conv2d(2 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d,
                    name="down1_conv")(y)
        y = ct_stage(x2, dim, self.config[1], "down2")
        x3 = Conv2d(4 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d,
                    name="down2_conv")(y)
        y = ct_stage(x3, 2 * dim, self.config[2], "down3")
        x4 = Conv2d(8 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d,
                    name="down3_conv")(y)
        body = ct_stage(x4, 4 * dim, self.config[3], "body")

        def unet_up(y, out_dim, name):
            if self.scale > 1:
                # Upconv: nearest + conv + lrelu, then conv to out_dim + lrelu
                y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
                y = nn.leaky_relu(Conv2d(y.shape[-1], 3, dtype=d, name=f"{name}_c0")(y), 0.2)
                return nn.leaky_relu(Conv2d(out_dim, 3, dtype=d, name=f"{name}_c1")(y), 0.2)
            # non-overlapping 2x2-stride-2 deconv == dense + depth-to-space
            y = Conv2d(out_dim * 4, 1, padding=0, use_bias=False, dtype=d,
                       name=f"{name}_deconv")(y)
            return pixel_shuffle(y, 2)

        u = unet_up(body + x4, 4 * dim, "up3_conv")
        u = ct_stage(u, 2 * dim, self.config[4], "up3")
        u = unet_up(u + x3, 2 * dim, "up2_conv")
        u = ct_stage(u, dim, self.config[5], "up2")
        u = unet_up(u + x2, dim, "up1_conv")
        u = ct_stage(u, dim // 2, self.config[6], "up1")

        if self.residual:
            x1 = Conv2d(dim, 3, use_bias=False, dtype=d, name="m_res")(x1)
        u = u + x1
        if self.scale > 1:
            for bi in range(2):
                u = RRDB(dim, 32, dtype=d, name=f"m_upsample_rrdb{bi}")(u)
            s = self.scale
            while s > 1:
                u = jnp.repeat(jnp.repeat(u, 2, axis=1), 2, axis=2)
                u = nn.leaky_relu(Conv2d(dim, 3, dtype=d, name=f"m_upsample_c{s}")(u), 0.2)
                s //= 2
            u = nn.leaky_relu(Conv2d(dim, 3, dtype=d, name="m_upsample_out")(u), 0.2)
        out = Conv2d(self.out_nc, 3, use_bias=False, dtype=d, name="m_tail")(u)
        sc = self.scale
        return out[:, top * sc : top * sc + h0 * sc,
                   left * sc : left * sc + w0 * sc, :].astype(jnp.float32)


def _scunet_factory(scale: int = 1, **kwargs):
    if "config" in kwargs:
        kwargs["config"] = tuple(kwargs["config"])
    kwargs.pop("input_resolution", None)
    kwargs.pop("drop_path_rate", None)
    if scale > 1 and scale & (scale - 1):
        raise ValueError("SCUNet scale must be 1 or a power of 2")
    return SCUNetAAF(scale=scale, **kwargs)


ARCH_REGISTRY.register(_scunet_factory, name="scunet_aaf6aa")
