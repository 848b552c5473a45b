"""Shared building blocks for the architecture zoo (flax.linen, NHWC).

TPU-native counterpart of /root/reference/traiNNer/archs/arch_util.py. All
modules run in NHWC (the native TPU conv layout); params are fp32 with a
bf16 compute `dtype` threaded through (mixed precision comes from the dtype
policy, not from a GradScaler).

Checkpoint compatibility: module/param naming is chosen so the torch->flax
converter (utils/torch_compat.py) can map reference state dicts
mechanically (Conv2d weight OIHW -> HWIO transpose, etc.).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel ordering.

    Input (..., H, W, C*r*r) with torch ordering c*(r*r) + r1*r + r2 ->
    output (..., H*r, W*r, C).
    """
    *b, h, w, c = x.shape
    r = scale
    oc = c // (r * r)
    nb = len(b)
    x = x.reshape(*b, h, w, oc, r, r)  # (..., h, w, c, i, j)
    # -> (..., h, i, w, j, c)
    x = jnp.transpose(x, (*range(nb), nb, nb + 3, nb + 1, nb + 4, nb + 2))
    return x.reshape(*b, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC inverse pixel shuffle matching torch.nn.PixelUnshuffle ordering."""
    *b, h, w, c = x.shape
    r = scale
    x = x.reshape(*b, h // r, r, w // r, r, c)
    # torch output channel order: c*(r*r) + r1*r + r2
    x = jnp.transpose(x, (*range(len(b)), len(b), len(b) + 2, len(b) + 4, len(b) + 1, len(b) + 3))
    return x.reshape(*b, h // r, w // r, c * r * r)


class Conv2d(nn.Module):
    """3x3/kxk conv with torch-compatible "same" padding semantics.

    features: output channels. kernel_size int or (kh, kw). stride int.
    padding: int pixels each side (torch convention), or 'SAME'/'VALID'.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int = 1
    padding: int | str | None = None
    use_bias: bool = True
    feature_group_count: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (
            self.kernel_size,
            self.kernel_size,
        )
        if self.padding is None:
            pad: Any = ((ks[0] - 1) // 2 * self.dilation, (ks[0] - 1) // 2 * self.dilation)
            pad = [pad, ((ks[1] - 1) // 2 * self.dilation, (ks[1] - 1) // 2 * self.dilation)]
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding), (self.padding, self.padding)]
        else:
            pad = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_dilation=(self.dilation, self.dilation),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


class PReLU(nn.Module):
    """Channel-wise PReLU (torch nn.PReLU(num_parameters=C))."""

    num_parameters: int = 1
    init: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "weight", nn.initializers.constant(self.init), (self.num_parameters,), jnp.float32
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class LayerNorm2d(nn.Module):
    """LayerNorm over the channel dim of NHWC feature maps (torch LayerNorm(C))."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.LayerNorm(epsilon=self.epsilon, dtype=self.dtype, param_dtype=jnp.float32)(x)


def make_layer(block: Callable[..., nn.Module], num_blocks: int, **kwargs: Any) -> list:
    """Construct a list of `num_blocks` block configs (applied sequentially)."""
    return [block(**kwargs, name=f"{i}") for i in range(num_blocks)]


def bilinear_resize(x: jnp.ndarray, scale: float | None = None, shape: Sequence[int] | None = None, method: str = "bilinear") -> jnp.ndarray:
    """NHWC resize via jax.image (align_corners=False semantics)."""
    n, h, w, c = x.shape
    if shape is None:
        assert scale is not None
        shape = (int(round(h * scale)), int(round(w * scale)))
    return jax.image.resize(x, (n, shape[0], shape[1], c), method=method)


def default_init_scale(scale: float = 0.1):
    """Scaled kaiming-style init used by residual blocks (ESRGAN-style)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
        std = (2.0 / fan_in) ** 0.5 * scale
        return jax.random.normal(key, shape, dtype) * std

    return init


class MeanShift(nn.Module):
    """Subtract/restore dataset mean (img_range scaling), param-free."""

    rgb_mean: tuple[float, float, float] = (0.4488, 0.4371, 0.4040)
    img_range: float = 255.0
    sign: int = -1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.rgb_mean, dtype=x.dtype)
        if self.sign == -1:
            return (x - mean) * self.img_range
        return x / self.img_range + mean
