"""MUNet — multi-branch U-Net discriminator (flax/NHWC).

Parity: reference traiNNer/archs/munet_arch.py:253-404 (MUNet): spectral-norm
U-Net spatial branch with MagicKernelSharp2021 upsampling, gradient branch
(gray finite differences, replicate pad), frequency branch (centered ortho
FFT log-magnitude), bottleneck patch branch, softmax attention fusion, and
a zero-init-gamma full self-attention at the bottleneck.

TPU notes: all shapes are static, so decoder scales are compile-time
constants; the FFT branch runs in fp32 (XLA TPU FFT) and casts back.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Dtype, SNConv2d
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY

_MAGIC = np.asarray([1, 4, 6, 4, 1], np.float32) / 16.0
_MAGIC_SHARP = np.asarray([-1, 0, 9, 16, 9, 0, -1], np.float32) / 32.0


def _dw_sep(x: jnp.ndarray, kh: jnp.ndarray, kv: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise filter (h then v), zero-pad SAME.
    kh: (1, k, 1, C) HWIO; kv: (k, 1, 1, C)."""
    c = x.shape[-1]
    ph, pv = kh.shape[1] // 2, kv.shape[0] // 2
    dn = ("NHWC", "HWIO", "NHWC")
    y = lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1), [(0, 0), (ph, ph)],
                                 dimension_numbers=dn, feature_group_count=c)
    return lax.conv_general_dilated(y, kv.astype(x.dtype), (1, 1), [(pv, pv), (0, 0)],
                                    dimension_numbers=dn, feature_group_count=c)


def _magic_upsample(x: jnp.ndarray, scale: int, alpha: float = 1.0) -> jnp.ndarray:
    """Fixed-constant MagicKernelSharp2021 upsample (used by ParagonSR's
    generator-side upsampler, whose kernels really are frozen constants)."""
    c = x.shape[-1]

    def mk(kernel, horiz):
        shape = (1, len(kernel), 1, c) if horiz else (len(kernel), 1, 1, c)
        return jnp.asarray(
            np.asarray(kernel, np.float32).reshape(
                (1, -1, 1, 1) if horiz else (-1, 1, 1, 1)
            )
            * np.ones(shape, np.float32)
        )

    if alpha > 0.0:
        x = x + alpha * (
            _dw_sep(x, mk(_MAGIC_SHARP, True), mk(_MAGIC_SHARP, False)) - x
        )
    if scale != 1:
        x = jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)
    return _dw_sep(x, mk(_MAGIC, True), mk(_MAGIC, False))


class MagicUpsample(nn.Module):
    """MagicKernelSharp2021Upsample with LEARNABLE-shaped kernel params.

    The kernels are nominally fixed magic constants, but the reference's
    MUNet._init_weights pass re-initializes EVERY nn.Conv2d — including
    these requires_grad=False convs — with kaiming noise
    (munet_arch.py:331-338), so real checkpoints carry arbitrary per-channel
    kernels here. We store them as params (init = the magic constants,
    which is what the upstream author intended) and the converter loads the
    checkpoint values.
    """

    channels: int
    alpha: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, scale: int) -> jnp.ndarray:
        c = self.channels

        def kinit(kernel, horiz):
            shape = (1, len(kernel), 1, c) if horiz else (len(kernel), 1, 1, c)

            def f(_key):
                base = np.asarray(kernel, np.float32)
                return jnp.asarray(
                    base.reshape((1, -1, 1, 1) if horiz else (-1, 1, 1, 1))
                    * np.ones(shape, np.float32)
                )

            return f

        sh_h = self.param("sharpen_h", kinit(_MAGIC_SHARP, True))
        sh_v = self.param("sharpen_v", kinit(_MAGIC_SHARP, False))
        rs_h = self.param("resample_h", kinit(_MAGIC, True))
        rs_v = self.param("resample_v", kinit(_MAGIC, False))
        if self.alpha > 0.0:
            x = x + self.alpha * (_dw_sep(x, sh_h, sh_v) - x)
        if scale != 1:
            x = jnp.repeat(jnp.repeat(x, scale, axis=1), scale, axis=2)
        return _dw_sep(x, rs_h, rs_v)


class UpBlock(nn.Module):
    skip_feat: int
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale = skip.shape[1] // x.shape[1]
        x = MagicUpsample(x.shape[-1], dtype=self.dtype, name="magic_upsample")(x, scale)
        x = SNConv2d(self.skip_feat, 3, use_bias=False, dtype=self.dtype,
                     name="post_upsample_conv")(x, train)
        if x.shape[1:3] != skip.shape[1:3]:
            x = jax.image.resize(x, (x.shape[0], *skip.shape[1:3], x.shape[-1]), "nearest")
        y = jnp.concatenate([x, skip], axis=-1)
        y = SNConv2d(self.skip_feat, 3, use_bias=False, dtype=self.dtype,
                     name="fusion_conv")(y, train)
        return nn.leaky_relu(y, self.slope)


class LocalWindowAttention(nn.Module):
    channels: int
    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        red = max(1, self.channels // self.reduction)
        q = SNConv2d(red, 1, dtype=self.dtype, name="query")(x, train).reshape(b, h * w, red)
        k = SNConv2d(red, 1, dtype=self.dtype, name="key")(x, train).reshape(b, h * w, red)
        v = SNConv2d(c, 1, dtype=self.dtype, name="value")(x, train).reshape(b, h * w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        attn = jax.nn.softmax(
            jnp.einsum("bnr,bmr->bnm", q * (red**-0.5), k,
                       preferred_element_type=jnp.float32).astype(jnp.float32),
            axis=-1,
        ).astype(x.dtype)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        return x + gamma.astype(x.dtype) * out


class AttentionFusion(nn.Module):
    num_branches: int
    num_feat: int
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, branches: list[jnp.ndarray], train: bool) -> jnp.ndarray:
        concat = jnp.concatenate(branches, axis=-1)
        a = SNConv2d(self.num_feat, 1, dtype=self.dtype, name="attn_0")(concat, train)
        a = nn.leaky_relu(a, self.slope)
        a = SNConv2d(self.num_branches, 1, dtype=self.dtype, name="attn_1")(a, train)
        a = jax.nn.softmax(a, axis=-1)
        fused = sum(a[..., i : i + 1] * br for i, br in enumerate(branches))
        fused = SNConv2d(self.num_feat, 3, use_bias=False, dtype=self.dtype,
                         name="fusion_0")(fused, train)
        fused = nn.leaky_relu(fused, self.slope)
        fused = SNConv2d(self.num_feat, 3, use_bias=False, dtype=self.dtype,
                         name="fusion_1")(fused, train)
        return nn.leaky_relu(fused, self.slope)


class MUNet(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    ch_mult: tuple = (1, 2, 4, 8)
    slope: float = 0.2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        nf = self.num_feat
        feat = SNConv2d(nf, 3, dtype=self.dtype, name="in_conv")(x, train)
        skips = [feat]
        enc_ch = [nf]
        for di, mult in enumerate(self.ch_mult):
            feat = SNConv2d(nf * mult, 4, stride=2, padding=1, use_bias=False,
                            dtype=self.dtype, name=f"down_{di}")(feat, train)
            feat = nn.leaky_relu(feat, self.slope)
            skips.append(feat)
            enc_ch.append(nf * mult)

        mid_ch = enc_ch[-1]
        feat = SNConv2d(mid_ch, 3, use_bias=False, dtype=self.dtype, name="mid_0")(feat, train)
        feat = nn.leaky_relu(feat, self.slope)
        feat = SNConv2d(mid_ch, 3, use_bias=False, dtype=self.dtype, name="mid_1")(feat, train)
        feat = nn.leaky_relu(feat, self.slope)
        bottleneck = LocalWindowAttention(mid_ch, dtype=self.dtype, name="self_attn")(feat, train)

        # spatial decoder
        spatial = bottleneck
        for ui, skip in enumerate(reversed(skips[:-1])):
            spatial = UpBlock(skip.shape[-1], self.slope, dtype=self.dtype,
                              name=f"up_{ui}")(spatial, skip, train)

        # gradient branch (replicate-padded gray finite differences)
        gray = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3])
        gy = jnp.concatenate([gray[:, 1:] - gray[:, :-1], gray[:, -1:] - gray[:, -2:-1]], axis=1)
        gx = jnp.concatenate([gray[:, :, 1:] - gray[:, :, :-1], gray[:, :, -1:] - gray[:, :, -2:-1]], axis=2)
        grad = jnp.concatenate([gx, gy], axis=-1)
        grad = SNConv2d(nf // 2, 3, use_bias=False, dtype=self.dtype, name="grad_0")(grad, train)
        grad = nn.leaky_relu(grad, self.slope)
        grad = SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="grad_1")(grad, train)
        grad = nn.leaky_relu(grad, self.slope)

        # frequency branch (centered ortho FFT log magnitude, fp32)
        fft = jnp.fft.fftshift(jnp.fft.fft2(gray[..., 0].astype(jnp.float32), norm="ortho"),
                               axes=(-2, -1))
        mag = jnp.log(jnp.abs(fft) + 1e-8)[..., None].astype(x.dtype)
        freq = SNConv2d(nf // 2, 3, use_bias=False, dtype=self.dtype, name="freq_0")(mag, train)
        freq = nn.leaky_relu(freq, self.slope)
        freq = SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="freq_1")(freq, train)
        freq = nn.leaky_relu(freq, self.slope)

        # patch branch: bottleneck features upsampled to full res
        target_hw = spatial.shape[1:3]
        patch = SNConv2d(nf, 1, dtype=self.dtype, name="patch_reduce")(bottleneck, train)
        patch = nn.leaky_relu(patch, self.slope)
        patch = jax.image.resize(patch, (patch.shape[0], *target_hw, nf), "nearest")
        patch = SNConv2d(nf, 3, dtype=self.dtype, name="patch_upsample")(patch, train)
        patch = nn.leaky_relu(patch, self.slope)

        branches = []
        for br in (spatial, grad, freq, patch):
            if br.shape[1:3] != target_hw:
                br = jax.image.resize(br, (br.shape[0], *target_hw, br.shape[-1]), "linear")
            branches.append(br)
        fused = AttentionFusion(4, nf, self.slope, dtype=self.dtype,
                                name="attention_fusion")(branches, train)
        out = SNConv2d(1, 3, dtype=self.dtype, name="out_conv")(fused, train)
        return out.astype(jnp.float32)


def _munet_factory(**kwargs):
    if "ch_mult" in kwargs:
        kwargs["ch_mult"] = tuple(kwargs["ch_mult"])
    return MUNet(**kwargs)


ARCH_REGISTRY.register(_munet_factory, name="munet")
