"""PLKSR / RealPLKSR — Partial Large Kernel CNN (flax/NHWC).

Parity: the reference's spandrel-backed plksr/plksr_tiny/realplksr factories
(/root/reference/traiNNer/archs/plksr_arch.py:10-70, realplksr_arch.py),
implementing the PLKSR architecture (Lee et al. 2024): per block a
double-conv channel mixer (DCCM), a partial large-kernel conv (only the
first split of channels sees the 17x17 kernel), and element-wise attention;
RealPLKSR adds LayerNorm and a DySample upsampler option.

TPU note: the 17x17 depthwise-style partial conv is a single large-kernel
conv on a channel slice — XLA maps it onto the MXU as an implicit GEMM; no
kernel decomposition needed.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, DySample, Dtype, mish, pixel_shuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class DCCM(nn.Module):
    """Doubled convolutional channel mixer."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv2d(self.dim * 2, 3, dtype=self.dtype, name="conv0")(x)
        x = nn.gelu(x, approximate=False)
        return Conv2d(self.dim, 3, dtype=self.dtype, name="conv1")(x)


class PLKBlock(nn.Module):
    dim: int
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    norm: bool = False  # RealPLKSR uses LayerNorm
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if self.norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x = DCCM(self.dim, dtype=self.dtype, name="channel_mixer")(x)

        # partial large-kernel conv on the first split of channels
        k_ch = int(self.dim * self.split_ratio)
        x1, x2 = x[..., :k_ch], x[..., k_ch:]
        x1 = Conv2d(k_ch, self.kernel_size, dtype=self.dtype, name="lk_conv")(x1)
        x = jnp.concatenate([x1, x2], axis=-1)

        if self.use_ea:
            att = nn.sigmoid(Conv2d(self.dim, 1, dtype=self.dtype, name="ea_conv")(x))
            x = x * att
        x = Conv2d(self.dim, 1, dtype=self.dtype, name="refine")(x)
        return x + shortcut


class PLKSR(nn.Module):
    dim: int = 64
    n_blocks: int = 28
    upscaling_factor: int = 4
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    norm: bool = False
    dysample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        s = self.upscaling_factor
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="head")(x)
        body = feat
        for i in range(self.n_blocks):
            body = PLKBlock(
                self.dim, self.kernel_size, self.split_ratio, self.use_ea, self.norm,
                dtype=self.dtype, name=f"blocks_{i}",
            )(body)
        body = body + feat
        if self.dysample:
            out = DySample(
                self.dim, 3 * 1, scale=s, groups=4, dtype=self.dtype, name="dysample"
            )(body)
            out = Conv2d(3, 3, dtype=self.dtype, name="tail")(out)
        else:
            out = Conv2d(3 * s * s, 3, dtype=self.dtype, name="tail")(body)
            out = pixel_shuffle(out, s)
        # global repeat-residual (PLKSR adds the pixel-repeated input)
        base = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
        return (out + base).astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def plksr(scale: int = 4, dim: int = 64, n_blocks: int = 28, **kw) -> PLKSR:
    kw.pop("kernel_size", None)
    return PLKSR(dim=dim, n_blocks=n_blocks, upscaling_factor=scale, **kw)


@SPANDREL_REGISTRY.register()
def plksr_tiny(scale: int = 4, dim: int = 64, n_blocks: int = 12, **kw) -> PLKSR:
    return PLKSR(dim=dim, n_blocks=n_blocks, upscaling_factor=scale, **kw)


class GroupNormTorch(nn.Module):
    """torch nn.GroupNorm parity on NHWC maps."""

    groups: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        b, h, w, _ = x.shape
        xg = x.astype(jnp.float32).reshape(b, h, w, self.groups, c // self.groups)
        mu = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = jnp.square(xg - mu).mean(axis=(1, 2, 4), keepdims=True)
        xn = ((xg - mu) / jnp.sqrt(var + self.eps)).reshape(b, h, w, c)
        return (xn * scale + bias).astype(x.dtype)


class RealPLKBlock(nn.Module):
    """Reference realplksr_arch.py:74-122: LN -> DCCM(Mish) -> partial LK
    -> EA(3x3 sigmoid gate) -> 1x1 refine -> (GroupNorm if not LN) -> +skip."""

    dim: int
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    norm_groups: int = 4
    use_layer_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        if self.use_layer_norm:
            # reference custom channel LayerNorm, eps 1e-6
            x = nn.LayerNorm(
                epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
            )(x)
        x = Conv2d(self.dim * 2, 3, dtype=self.dtype, name="mixer_0")(x)
        x = mish(x)
        x = Conv2d(self.dim, 3, dtype=self.dtype, name="mixer_1")(x)
        pdim = int(self.dim * self.split_ratio)
        x1 = Conv2d(pdim, self.kernel_size, dtype=self.dtype, name="lk_conv")(
            x[..., :pdim]
        )
        x = jnp.concatenate([x1, x[..., pdim:]], axis=-1)
        if self.use_ea:
            x = x * nn.sigmoid(Conv2d(self.dim, 3, dtype=self.dtype, name="ea_conv")(x))
        x = Conv2d(self.dim, 1, dtype=self.dtype, name="refine")(x)
        if not self.use_layer_norm:
            x = GroupNormTorch(self.norm_groups, dtype=self.dtype, name="gnorm")(x)
        return x + shortcut


class RealPLKSR(nn.Module):
    """Reference realplksr_arch.py:125-186 (local torch implementation)."""

    in_ch: int = 3
    out_ch: int = 3
    dim: int = 64
    n_blocks: int = 28
    upscaling_factor: int = 4
    kernel_size: int = 17
    split_ratio: float = 0.25
    use_ea: bool = True
    norm_groups: int = 4
    upsampler: str = "pixelshuffle"
    layer_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        s = self.upscaling_factor
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="head")(x)
        for i in range(self.n_blocks):
            y = RealPLKBlock(
                self.dim, self.kernel_size, self.split_ratio, self.use_ea,
                self.norm_groups, self.layer_norm, dtype=self.dtype,
                name=f"blocks_{i}",
            )(y)
        y = Conv2d(self.out_ch * s * s, 3, dtype=self.dtype, name="tail")(y)
        # global residual: each input channel repeated s^2 times BEFORE the
        # upsampler (reference realplksr_arch.py:163-183)
        y = y + jnp.repeat(x, s * s, axis=-1)
        if self.upsampler == "dysample" and s != 1:
            groups = self.out_ch if s % 2 != 0 else 4
            out = DySample(
                self.in_ch * s * s, self.out_ch, scale=s, groups=groups,
                end_convolution=True, dtype=self.dtype, name="to_img",
            )(y)
        else:
            out = pixel_shuffle(y, s)
        return out.astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def realplksr(
    scale: int = 4, dim: int = 64, n_blocks: int = 28, upsampler: str = "pixelshuffle",
    layer_norm: bool = True, **kw,
) -> RealPLKSR:
    kw.pop("dropout", None)
    return RealPLKSR(
        dim=dim, n_blocks=n_blocks, upscaling_factor=scale, upsampler=upsampler,
        layer_norm=layer_norm, **kw,
    )


@SPANDREL_REGISTRY.register()
def realplksr_tiny(
    scale: int = 4, dim: int = 64, n_blocks: int = 12, kernel_size: int = 13,
    use_ea: bool = False, **kw,
) -> RealPLKSR:
    kw.pop("dropout", None)
    return RealPLKSR(
        dim=dim, n_blocks=n_blocks, upscaling_factor=scale,
        kernel_size=kernel_size, use_ea=use_ea, **kw,
    )


@SPANDREL_REGISTRY.register()
def realplksr_large(
    scale: int = 4, dim: int = 96, n_blocks: int = 28, **kw,
) -> RealPLKSR:
    kw.pop("dropout", None)
    return RealPLKSR(dim=dim, n_blocks=n_blocks, upscaling_factor=scale, **kw)
