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
import numpy as np
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
        # int8 PTQ hooks (ops/quant.py): calibration records the input amax
        # (no-op unless apply() makes "quant_calib" mutable); inference takes
        # the W8A8 path when a "quant" collection supplies this conv's scales
        # and int8 weights — int8xint8->int32 convs hit the MXU's int8 mode
        # (~3.6x over bf16 measured on-chip).
        self.sow("quant_calib", "amax", jnp.max(jnp.abs(x)).astype(jnp.float32))
        if self.has_variable("quant", "act_scale"):
            s_in = self.get_variable("quant", "act_scale")
            wq = self.get_variable("quant", "kernel_q")
            ws = self.get_variable("quant", "w_scale")
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127)
            y = jax.lax.conv_general_dilated(
                xq.astype(jnp.int8),
                wq,
                (self.stride, self.stride),
                pad,
                rhs_dilation=(self.dilation, self.dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32,
            )
            y = y.astype(jnp.float32) * (ws * s_in)
            if self.has_variable("quant", "bias"):
                y = y + self.get_variable("quant", "bias")
            return y.astype(x.dtype)
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


# ---------------------------------------------------------------------------
# Spectral normalization (pure-functional; u vector lives in the 'spectral'
# variable collection, power-iterated once per training forward like torch's
# nn.utils.spectral_norm)
# ---------------------------------------------------------------------------


class SNConv2d(nn.Module):
    """Conv2d with spectral weight normalization.

    The power-iteration vector `u` is stored in the 'spectral' collection;
    pass mutable=['spectral'] during training applies so it persists across
    steps (torch keeps it as a buffer updated per forward).
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ks = (
            self.kernel_size
            if isinstance(self.kernel_size, tuple)
            else (self.kernel_size, self.kernel_size)
        )
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (*ks, in_ch, self.features), jnp.float32
        )
        # torch reshapes OIHW weight to (out, in*kh*kw)
        w_mat = kernel.transpose(3, 0, 1, 2).reshape(self.features, -1)

        u_var = self.variable(
            "spectral",
            "u",
            lambda key, shape: jax.random.normal(key, shape)
            / jnp.linalg.norm(jax.random.normal(key, shape)),
            self.make_rng("params") if self.is_initializing() else None,
            (self.features,),
        )

        def l2n(v):
            return v / (jnp.linalg.norm(v) + 1e-12)

        # v is persisted alongside u (torch stores both `_u` and `_v`; eval
        # computes sigma from the FROZEN pair with no power iteration)
        v_var = self.variable(
            "spectral",
            "v",
            lambda: l2n(
                jax.lax.stop_gradient(w_mat).T @ jax.lax.stop_gradient(u_var.value)
            ),
        )

        if train:
            u = jax.lax.stop_gradient(u_var.value)
            v = l2n(jax.lax.stop_gradient(w_mat).T @ u)
            u_new = l2n(jax.lax.stop_gradient(w_mat) @ v)
            sigma = u_new @ w_mat @ v  # grad flows through w_mat only (torch parity)
            if not self.is_initializing() and self.is_mutable_collection("spectral"):
                u_var.value = u_new
                v_var.value = v
        else:
            u = jax.lax.stop_gradient(u_var.value)
            v = jax.lax.stop_gradient(v_var.value)
            sigma = u @ w_mat @ v

        w_sn = (kernel / sigma).astype(self.dtype)
        pad = (ks[0] - 1) // 2 if self.padding is None else self.padding
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w_sn,
            (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            out = out + bias.astype(self.dtype)
        return out


def bilinear_sample(img: jnp.ndarray, coords_y: jnp.ndarray, coords_x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of NHWC `img` at float pixel coords (N,Ho,Wo),
    border-clamped — the JAX equivalent of grid_sample(align_corners=False,
    padding_mode='border') given pre-computed absolute coordinates."""
    n, h, w, c = img.shape
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    wy = (coords_y - y0)[..., None]
    wx = (coords_x - x0)[..., None]

    def gather(yy, xx):
        yy = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xx = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        batch_idx = jnp.arange(n)[:, None, None]
        return img[batch_idx, yy, xx]  # (N,Ho,Wo,C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def dysample_local(
    x: jnp.ndarray, off_in: jnp.ndarray, scale: int, groups: int, radius: int
) -> jnp.ndarray:
    """Gather-free DySample resampling: exact windowed bilinear sampling.

    TPU-native replacement for the grid_sample gather (measured on v5e:
    DUnet fwd+bwd 282.6 ms with XLA gathers/scatters vs 18.7 ms without —
    docs/perf/profile_gan_span_s.json; Mosaic's dynamic_gather only
    supports lane-dim range-128 gathers, so no Pallas gather kernel can
    exist either). DySample's sample coordinate for output subpixel
    (sy, sx) of input pixel (i, j) is (i + anchor[sy] + off_y,
    j + anchor[sx] + off_x) — an identity map plus a LOCAL learned offset
    (reference arch_util.py:368-402; offsets are 0.5*sigmoid-scoped
    perturbations, ~0.01 at init). Bilinear interpolation at displacement
    (dy, dx) from the anchor pixel is EXACTLY
    sum_{u,v} relu(1-|dy-u|) * relu(1-|dx-v|) * img[i+u, j+v] over integer
    taps — the hat products vanish except at the 4 surrounding pixels.
    Truncating taps to |u|,|v| <= radius is exact whenever |d| <= radius
    and clamps the coordinate to the window edge otherwise (grid_sample
    padding_mode='border' clamps at the image edge the same way). The sum
    runs over the full (2r+1)^2 window — it does NOT factor into separable
    y/x passes, because both weight sets belong to the output pixel's
    parent pixel, not to the shifted source row. Every term is a dense
    elementwise multiply-add over statically-shifted copies: no gather in
    the forward, no scatter-add in the backward, and XLA fuses the whole
    tap sum into one accumulation pass.

    x: (n, h, w, c); off_in: (n, h, w, 2, groups, s, s) with coord 0 = x,
    1 = y (torch channel order). Returns (n, h*s, w*s, c) float32, group-
    major channels — identical layout to the gather path.

    Layout discipline (the first cut of this function was as slow as the
    gather path it replaced): every tensor XLA may MATERIALIZE stays
    (n, h, w, C>=128)-shaped — TPU tiles the two minor dims to (8, 128),
    so a 7D intermediate with trailing (sy=2, sx=2, cg=32) dims inflates
    16x in memory. Subpixels are processed as s^2 static iterations whose
    accumulators are full-lane (n, h, w, c) maps, and the final interleave
    uses interior-dilated lax.pad (never a small-trailing-dim transpose).
    """
    n, h, w, c = x.shape
    s, g, r = scale, groups, radius
    cg = c // g
    f32 = jnp.float32
    anchor = [(a - (s - 1) / 2.0) / s for a in range(s)]  # python floats
    xpad = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    iy = jnp.arange(h, dtype=f32)[None, :, None, None]
    jx = jnp.arange(w, dtype=f32)[None, None, :, None]
    lo_y, hi_y = jnp.maximum(-float(r), -iy), jnp.minimum(float(r), (h - 1) - iy)
    lo_x, hi_x = jnp.maximum(-float(r), -jx), jnp.minimum(float(r), (w - 1) - jx)

    # flatten the (2, g, s, s) offset tree back to the conv's channel axis;
    # per-subpixel per-coordinate channel expansion then happens as ONE
    # constant selection MATMUL (off32 @ sel -> (n, h, w, c)) — never via a
    # (..., g, cg) reshape, whose padded tiling costs a 16x-inflated
    # materialization (the first cut of this function lost its entire
    # speedup to exactly that)
    off32 = off_in.reshape(n, h, w, 2 * g * s * s)
    n_off = 2 * g * s * s

    def sel_matrix(coord: int, sy: int, sx: int) -> np.ndarray:
        m = np.zeros((n_off, c), np.float32)
        for gi in range(g):
            ch = coord * g * s * s + gi * s * s + sy * s + sx
            m[ch, gi * cg : (gi + 1) * cg] = 1.0
        return m

    total = None
    for sy in range(s):
        for sx in range(s):
            ry = jnp.clip(
                jax.lax.dot_general(
                    off32.astype(f32).reshape(n * h * w, n_off),
                    jnp.asarray(sel_matrix(1, sy, sx)),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).reshape(n, h, w, c) + anchor[sy],
                lo_y, hi_y,
            )
            rx = jnp.clip(
                jax.lax.dot_general(
                    off32.astype(f32).reshape(n * h * w, n_off),
                    jnp.asarray(sel_matrix(0, sy, sx)),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                ).reshape(n, h, w, c) + anchor[sx],
                lo_x, hi_x,
            )
            acc = jnp.zeros((n, h, w, c), f32)
            for u in range(-r, r + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - u))
                for v in range(-r, r + 1):
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - v))
                    tap = jax.lax.slice(
                        xpad, (0, u + r, v + r, 0),
                        (n, u + r + h, v + r + w, c),
                    )
                    acc = acc + wy * wx * tap.astype(f32)
            # scatter subpixel (sy, sx) to output rows s*i+sy / cols s*j+sx
            # via interior-dilated pad — elementwise, full-lane, fusable
            t = jax.lax.pad(
                acc, jnp.array(0.0, f32),
                ((0, 0, 0), (sy, s - 1 - sy, s - 1), (sx, s - 1 - sx, s - 1),
                 (0, 0, 0)),
            )
            total = t if total is None else total + t
    return total


class DySample(nn.Module):
    """Dynamic upsampler (reference arch_util.py:322-408, DySample paper):
    offsets gated by a sigmoid scope conv, init_pos subpixel anchors, and
    border-clamped bilinear resampling per channel group. Channel layout of
    the offset conv matches torch exactly (coord-major, then group, then
    s x s subpixel), so checkpoints convert 1:1.

    Sampling backend (TRAINNER_DYSAMPLE_MODE): 'local' (default) uses the
    gather-free windowed resampler `dysample_local` — exact up to the
    window radius (default 2 input px; the learned offsets are
    sigmoid-scoped perturbations, ~0.01 at init) and ~15x faster on TPU;
    'gather' keeps the reference's unbounded grid_sample semantics via XLA
    gathers. Radius precedence: TRAINNER_DYSAMPLE_RADIUS env >
    `local_radius` field > 2. Discriminators set local_radius=1 (measured
    +55% GAN train throughput; no checkpoint-inference parity at stake for
    a train-only, randomly-initialized D), while generator upsamplers keep
    the wider window so converted checkpoints with larger trained offsets
    stay exact."""

    in_channels: int
    out_channels: int
    scale: int = 2
    groups: int = 4
    end_convolution: bool = True
    end_kernel: int = 1
    local_radius: int | None = None  # windowed-sampler radius override
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        import os

        del train
        n, h, w, c = x.shape
        s, g = self.scale, self.groups
        offset_ch = 2 * g * s * s
        off = Conv2d(offset_ch, 1, dtype=self.dtype, name="offset")(x)
        scope = Conv2d(offset_ch, 1, use_bias=False, dtype=self.dtype, name="scope")(x)
        off = off * nn.sigmoid(scope) * 0.5
        # torch channel layout: (coord, group, i, j); coord 0 = x, 1 = y
        off = off.reshape(n, h, w, 2, g, s, s)
        if os.environ.get("TRAINNER_DYSAMPLE_MODE", "local") == "local":
            radius = int(
                os.environ.get("TRAINNER_DYSAMPLE_RADIUS", "0")
            ) or (self.local_radius or 2)
            out = dysample_local(x, off, s, g, radius)
            if self.end_convolution:
                out = Conv2d(
                    self.out_channels, self.end_kernel, dtype=self.dtype,
                    name="end_conv",
                )(out)
            return out
        # to output resolution: (n, g, h*s, w*s, coord)
        off = off.transpose(0, 4, 1, 5, 2, 6, 3).reshape(n, g, h * s, w * s, 2)

        # base grid + init_pos anchors: output px (h*s+i) samples input row
        # h + anchor[i], anchor = arange((-s+1)/2, (s-1)/2+1)/s
        anchor = (jnp.arange(s) - (s - 1) / 2.0) / s
        ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), s) + jnp.tile(anchor, h)
        xs = jnp.repeat(jnp.arange(w, dtype=jnp.float32), s) + jnp.tile(anchor, w)
        base_y = jnp.broadcast_to(ys[:, None], (h * s, w * s))
        base_x = jnp.broadcast_to(xs[None, :], (h * s, w * s))

        cg = c // g
        outs = []
        for gi in range(g):
            cx = base_x[None] + off[:, gi, :, :, 0].astype(jnp.float32)
            cy = base_y[None] + off[:, gi, :, :, 1].astype(jnp.float32)
            outs.append(bilinear_sample(x[..., gi * cg : (gi + 1) * cg], cy, cx))
        out = jnp.concatenate(outs, axis=-1)
        if self.end_convolution:
            out = Conv2d(
                self.out_channels, self.end_kernel, dtype=self.dtype, name="end_conv"
            )(out)
        return out


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jax.nn.softplus(x))


class ConvT2d(nn.Module):
    """Torch ConvTranspose2d(k, s, p) parity via input-dilated conv.

    The kernel is stored pre-flipped in HWIO "gradient view": torch weight
    (I, O, kh, kw) -> flip(kh, kw) -> transpose to (kh, kw, I, O), so
    __call__ is a single conv_general_dilated with lhs_dilation.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(k - 1 - p,) * 2, (k - 1 - p,) * 2],
            lhs_dilation=(s, s), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(x.dtype)


def nearest_up(x: jnp.ndarray, s: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, s, w, s, c))
    return x.reshape(n, h * s, w * s, c)


class UniUpsampleV3(nn.Module):
    """Flax port of the reference's UniUpsampleV3 (arch_util.py:584-732).

    Parameterized units are named c0..cN in the torch Sequential's
    parameter order, so the checkpoint converter maps positionally for
    every mode. Supported: conv, pixelshuffledirect, pixelshuffle,
    nearest+conv, transpose+conv, pa_up, dysample.
    """

    mode: str = "pa_up"
    scale: int = 2
    out_dim: int = 3
    mid_dim: int = 48
    group: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s, mode = self.scale, self.mode
        j = 0

        def conv(x, feats, k=3):
            nonlocal j
            y = Conv2d(feats, k, dtype=self.dtype, name=f"c{j}")(x)
            j += 1
            return y

        def conv_t(x, feats, k, st, p):
            nonlocal j
            y = ConvT2d(feats, k, st, p, dtype=self.dtype, name=f"c{j}")(x)
            j += 1
            return y

        if s == 1 or mode == "conv":
            return conv(x, self.out_dim)
        if mode == "pixelshuffledirect":
            return pixel_shuffle(conv(x, self.out_dim * s * s), s)
        if mode == "pixelshuffle":
            x = nn.leaky_relu(conv(x, self.mid_dim), 0.01)
            if (s & (s - 1)) == 0:
                for _ in range(int(np.log2(s))):
                    x = pixel_shuffle(conv(x, 4 * self.mid_dim), 2)
            elif s == 3:
                x = pixel_shuffle(conv(x, 9 * self.mid_dim), 3)
            else:
                raise ValueError(f"pixelshuffle: unsupported scale {s}")
            return conv(x, self.out_dim)
        if mode == "nearest+conv":
            in_dim = x.shape[-1]
            if (s & (s - 1)) == 0:
                for _ in range(int(np.log2(s))):
                    x = nn.leaky_relu(nearest_up(conv(x, in_dim), 2), 0.2)
                x = nn.leaky_relu(conv(x, in_dim), 0.2)
            elif s == 3:
                x = nn.leaky_relu(nearest_up(conv(x, in_dim), 3), 0.2)
                x = nn.leaky_relu(conv(x, in_dim), 0.2)
            else:
                raise ValueError(f"nearest+conv: unsupported scale {s}")
            return conv(x, self.out_dim)
        if mode == "transpose+conv":
            in_dim = x.shape[-1]
            if s == 2:
                x = conv_t(x, self.out_dim, 4, 2, 1)
            elif s == 3:
                x = conv_t(x, self.out_dim, 3, 3, 0)
            elif s == 4:
                x = nn.gelu(conv_t(x, in_dim, 4, 2, 1), approximate=False)
                x = conv_t(x, self.out_dim, 4, 2, 1)
            else:
                raise ValueError(f"transpose+conv: unsupported scale {s}")
            return conv(x, self.out_dim)
        if mode == "pa_up":
            if (s & (s - 1)) == 0:
                for _ in range(int(np.log2(s))):
                    x = conv(nearest_up(x, 2), self.mid_dim)
                    x = x * nn.sigmoid(conv(x, self.mid_dim, k=1))  # PA
                    x = nn.leaky_relu(x, 0.2)
                    x = nn.leaky_relu(conv(x, self.mid_dim), 0.2)
            elif s == 3:
                x = conv(nearest_up(x, 3), self.mid_dim)
                x = x * nn.sigmoid(conv(x, self.mid_dim, k=1))
                x = nn.leaky_relu(x, 0.2)
                x = nn.leaky_relu(conv(x, self.mid_dim), 0.2)
            else:
                raise ValueError(f"pa_up: unsupported scale {s}")
            return conv(x, self.out_dim)
        if mode == "dysample":
            if self.mid_dim != x.shape[-1]:
                x = nn.leaky_relu(conv(x, self.mid_dim), 0.01)
            return DySample(
                x.shape[-1], self.out_dim, s, self.group, dtype=self.dtype,
                name=f"c{j}",
            )(x)
        raise ValueError(f"UniUpsampleV3: unknown mode {mode!r}")
