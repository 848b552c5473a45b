"""SpanC (SPAN++) — SPAN body with implicit Fourier multi-scale upsampler
(flax/NHWC).

Parity: reference traiNNer/archs/spanpp_arch.py:367-433 (SpanC): RepConv
head/tail (SeqConv3x3 + 3x3 + Conv3XC re-param blend), six SPAB blocks with
4-way concat fusion, and IGConv — an LIIF/LTE-style implicit kernel
generator that synthesizes, from learned frequency/amplitude embeddings and
cell coordinates, a (3*s^2)-output conv kernel for any integer scale,
followed by pixel shuffle. Scale is static per compiled program (the
reference samples a random scale per training batch; here the training
scale is the configured one — multi-scale training would recompile per
scale bucket).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.rtmosr_arch import RepConv
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class SPABPP(nn.Module):
    """SpanC's SPAB: three RepConvs (not Conv3XC) with SiLU, sigmoid
    similarity attention (reference spanpp_arch.py:219-242). The inplace
    SiLU means the block returns silu(out1)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = self.channels
        out1 = RepConv(c, c, dtype=self.dtype, name="c1_r")(x, train)
        out1_act = nn.silu(out1)
        out2 = RepConv(c, c, dtype=self.dtype, name="c2_r")(out1_act, train)
        out3 = RepConv(c, c, dtype=self.dtype, name="c3_r")(nn.silu(out2), train)
        sim_att = nn.sigmoid(out3) - 0.5
        return (out3 + x) * sim_att, out1_act


def _make_coord(s: int) -> np.ndarray:
    """Cell-center coordinates in [-1, 1], shape (2, s, s); channel 0 is the
    COLUMN (x) coordinate — the reference flips make_coord's last axis
    before use (spanpp_arch.py:244-255, 332-340)."""
    seq = (np.arange(s) + 0.5) / s * 2 - 1
    gy, gx = np.meshgrid(seq, seq, indexing="ij")
    return np.stack([gx, gy], 0).astype(np.float32)


class IGConv(nn.Module):
    dim: int
    kernel_size: int = 3
    implicit_dim: int = 256
    latent_layers: int = 4
    max_scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: int) -> jnp.ndarray:
        k = self.kernel_size
        n = self.dim * k * k
        imp = self.implicit_dim
        half = imp // 2
        freq = self.param("freq", nn.initializers.normal(0.02), (n, imp), jnp.float32)
        amp = self.param("amplitude", nn.initializers.normal(0.02), (n, imp), jnp.float32)
        phase_w = self.param("phase_w", nn.initializers.lecun_normal(), (1, half), jnp.float32)
        phase_b = self.param("phase_b", nn.initializers.zeros, (half,), jnp.float32)

        coords = jnp.asarray(_make_coord(scale))  # (2, s, s)
        f1, f2 = freq[:, :half], freq[:, half:]
        # (n, half, s, s)
        f = f1[:, :, None, None] * coords[0] + f2[:, :, None, None] * coords[1]
        r = jnp.full((1,), 1.0 / min(scale, self.max_scale) * 2.0, jnp.float32)
        phase = (r[:, None] @ phase_w)[0] + phase_b  # (half,)
        f = f + phase[None, :, None, None]
        basis = jnp.concatenate([jnp.cos(jnp.pi * f), jnp.sin(jnp.pi * f)], axis=1)
        z = basis * amp[:, :, None, None]  # (n, imp, s, s)
        # query MLP: 1x1 convs over the implicit channel dim
        z = z.transpose(0, 2, 3, 1)  # (n, s, s, imp)
        for li in range(self.latent_layers):
            z = nn.relu(nn.Dense(imp, dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"qk_{li}")(z))
        z = nn.Dense(3, dtype=self.dtype, param_dtype=jnp.float32, name="qk_out")(z)
        # (n, s, s, 3) -> output channel (rgb, rh, rw) C-major, HWIO kernel
        z = z.reshape(self.dim, k, k, scale, scale, 3)
        kernel = z.transpose(1, 2, 0, 5, 3, 4).reshape(k, k, self.dim, 3 * scale * scale)

        rgb = lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return pixel_shuffle(rgb, scale)


class SpanC(nn.Module):
    scale: int = 2
    num_in_ch: int = 3
    feature_channels: int = 48
    ig_kernel_size: int = 3
    implicit_dim: int = 256
    latent_layers: int = 4
    max_scale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        fc = self.feature_channels
        feat = RepConv(self.num_in_ch, fc, dtype=self.dtype, name="conv0")(x, train)
        b = feat
        b1 = None
        inter = None
        for i in range(1, 7):
            b, out1 = SPABPP(fc, dtype=self.dtype, name=f"block_{i}")(b, train)
            if i == 1:
                b1 = b
            if i == 6:
                inter = out1
        b = RepConv(fc, fc, dtype=self.dtype, name="conv_2")(b, train)
        cat = jnp.concatenate([feat, b, b1, inter], axis=-1)
        y = Conv2d(fc, 1, padding=0, dtype=self.dtype, name="conv_cat")(cat)
        out = IGConv(fc, self.ig_kernel_size, self.implicit_dim, self.latent_layers,
                     self.max_scale, dtype=self.dtype, name="upsampler")(y, self.scale)
        return out.astype(jnp.float32)


def _spanpp_factory(scale: int = 2, **kwargs):
    for k in ("scale_list", "eval_base_scale"):
        kwargs.pop(k, None)
    return SpanC(scale=scale, **kwargs)


ARCH_REGISTRY.register(_spanpp_factory, name="spanc")
ARCH_REGISTRY.register(_spanpp_factory, name="spanpp")
