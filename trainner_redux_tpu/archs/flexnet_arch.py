"""FlexNet / MetaFlexNet — windowed attention + RWKV channel-mix hybrid
(flax/NHWC).

Parity: reference traiNNer/archs/flexnet_arch.py:612-743 (FlexNet,
metaflexnet): TransformerBlock = RMSNorm + LMLT-style window attention with
OmniShift and depthwise LePE (gamma residuals), RWKV-ish ChannelMix
(sigmoid receptance * squared-relu key-value) with OmniShift; linear
pipeline (flat LBlocks with concat conv fusion) or meta pipeline (U-Net of
MBlocks with pixel-unshuffle downs); dual-conv shortcut branch fused before
the pixelshuffle / nearest+conv / dysample upsampler.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    DySample,
    Dtype,
    mish,
    pixel_shuffle,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.lmlt_arch import DownsampleViT
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class OmniShiftFlex(nn.Module):
    """FlexNet's OmniShift (flexnet_arch.py:75-155): bias-free depthwise
    1x1/3x3/5x5 branches blended by a single 4-vector alpha (randn init);
    one fused depthwise 5x5 at eval."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        import jax.lax as lax

        d = self.dim
        init = nn.initializers.lecun_normal()
        k1 = self.param("k1", init, (1, 1, 1, d), jnp.float32)
        k3 = self.param("k3", init, (3, 3, 1, d), jnp.float32)
        k5 = self.param("k5", init, (5, 5, 1, d), jnp.float32)
        alpha = self.param(
            "alpha", nn.initializers.normal(1.0), (4,), jnp.float32
        )

        def dw(inp, w, pad):
            return lax.conv_general_dilated(
                inp, w.astype(inp.dtype), (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=d,
            )

        a = alpha.astype(x.dtype)
        if train:
            return a[0] * x + a[1] * dw(x, k1, 0) + a[2] * dw(x, k3, 1) + a[3] * dw(x, k5, 2)
        ident = jnp.zeros((5, 5, 1, d)).at[2, 2, 0].set(1.0)
        fused = (
            alpha[0] * ident
            + alpha[1] * jnp.pad(k1, ((2, 2), (2, 2), (0, 0), (0, 0)))
            + alpha[2] * jnp.pad(k3, ((1, 1), (1, 1), (0, 0), (0, 0)))
            + alpha[3] * k5
        )
        return dw(x, fused, 2)


class RMSNormScale(nn.Module):
    """torch nn.RMSNorm parity: scale-only, channel-last."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        rms = jnp.sqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + self.eps)
        return (w * (xf / rms)).astype(x.dtype)


class ConvBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = mish(Conv2d(self.out_ch, 3, dtype=self.dtype, name="b0")(x))
        y = mish(Conv2d(self.out_ch, 3, dtype=self.dtype, name="b1")(y))
        return y + Conv2d(self.out_ch, 1, padding=0, dtype=self.dtype, name="conv11")(x)


class FlexAttention(nn.Module):
    """OmniShift + LMLT window attention with depthwise LePE."""

    dim: int
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = OmniShiftFlex(self.dim, name="omni_shift")(x, train)
        return DownsampleViT(
            self.dim, self.window_size, dtype=self.dtype, name="vit"
        )(x)


class ChannelMix(nn.Module):
    dim: int
    hidden_rate: int = 4
    key_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        hidden = int(self.hidden_rate * self.dim)
        x = OmniShiftFlex(self.dim, name="omni_shift")(x, train)
        k = nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     name="key")(x)
        k = jnp.square(nn.relu(k))
        if self.key_norm:
            k = RMSNormScale(hidden, name="key_norm")(k)
        kv = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="value")(k)
        r = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="receptance")(x)
        return nn.sigmoid(r) * kv


class TransformerBlock(nn.Module):
    dim: int
    window_size: int = 8
    hidden_rate: int = 4
    channel_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        g1 = self.param("gamma1", nn.initializers.ones, (self.dim,), jnp.float32)
        g2 = self.param("gamma2", nn.initializers.ones, (self.dim,), jnp.float32)
        y = RMSNormScale(self.dim, name="rn1")(x)
        x = x + g1.astype(x.dtype) * FlexAttention(
            self.dim, self.window_size, dtype=self.dtype, name="att"
        )(y, train)
        y = RMSNormScale(self.dim, name="rn2")(x)
        x = x + g2.astype(x.dtype) * ChannelMix(
            self.dim, self.hidden_rate, self.channel_norm, dtype=self.dtype, name="ffn"
        )(y, train)
        return x


class FlexStage(nn.Module):
    """n TransformerBlocks + concat ConvBlock fusion (LBlock/MBlock)."""

    dim: int
    n_block: int
    window_size: int = 8
    hidden_rate: int = 4
    channel_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        shortcut = x
        for i in range(self.n_block):
            x = TransformerBlock(
                self.dim, self.window_size, self.hidden_rate, self.channel_norm,
                dtype=self.dtype, name=f"t_{i}",
            )(x, train)
        return ConvBlock(self.dim, dtype=self.dtype, name="conv")(
            jnp.concatenate([shortcut, x], axis=-1)
        )


class FlexNet(nn.Module):
    scale: int = 4
    inp_channels: int = 3
    out_channels: int = 3
    dim: int = 64
    num_blocks: tuple = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    hidden_rate: int = 4
    channel_norm: bool = False
    pipeline_type: str = "linear"
    upsampler: str = "pixelshuffle"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mult = self.window_size * (8 if self.pipeline_type == "meta" else 1)
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        short = ConvBlock(self.dim, dtype=self.dtype, name="short_cut")(xp)
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_feat")(xp)

        kw = dict(window_size=self.window_size, hidden_rate=self.hidden_rate,
                  channel_norm=self.channel_norm, dtype=self.dtype)
        if self.pipeline_type == "linear":
            for si, nb in enumerate(self.num_blocks):
                y = FlexStage(self.dim, nb, name=f"att_{si}", **kw)(y, train)
        else:

            def down(z, d, name):
                z = Conv2d(d // 2, 3, use_bias=False, dtype=self.dtype, name=name)(z)
                return pixel_unshuffle(z, 2)

            def up(z, name):
                z = Conv2d(z.shape[-1], 3, use_bias=False, dtype=self.dtype, name=name)(z)
                return pixel_shuffle(z, 2)

            nb = self.num_blocks
            e0 = FlexStage(self.dim, nb[0], name="enc0", **kw)(y, train)
            e0d = down(e0, self.dim, "down1")
            e1 = FlexStage(self.dim * 2, nb[1], name="enc1", **kw)(e0d, train)
            e1d = down(e1, self.dim * 2, "down2")
            e2 = FlexStage(self.dim * 4, nb[2], name="enc2", **kw)(e1d, train)
            e2d = down(e2, self.dim * 4, "down3")
            e3 = FlexStage(self.dim * 8, nb[3], name="enc3", **kw)(e2d, train)
            z = up(jnp.concatenate([e3, e2d], axis=-1), "up1")
            z = FlexStage(self.dim * 4, nb[2], name="dec0", **kw)(z, train)
            z = up(jnp.concatenate([z, e1d], axis=-1), "up2")
            z = FlexStage(self.dim * 2, nb[1], name="dec1", **kw)(z, train)
            z = up(jnp.concatenate([z, e0d], axis=-1), "up3")
            y = FlexStage(self.dim, nb[0], name="dec2", **kw)(z, train)

        y = jnp.concatenate([y, short], axis=-1)
        s = self.scale
        if self.upsampler == "pixelshuffle":
            y = Conv2d(self.out_channels * s * s, 3, dtype=self.dtype, name="to_img")(y)
            out = pixel_shuffle(y, s)
        elif self.upsampler == "dysample":
            out = DySample(self.dim * 2, self.out_channels, scale=s,
                           dtype=self.dtype, name="to_img")(y)
        elif self.upsampler == "nearest+conv":
            y = Conv2d(self.dim, 3, dtype=self.dtype, name="to_img_pre")(y)
            r, stage = s, 0
            while r > 1:
                f = 3 if r % 3 == 0 else 2
                y = Conv2d(self.dim, 3, dtype=self.dtype, name=f"to_img_up{stage}")(y)
                y = jnp.repeat(jnp.repeat(y, f, axis=1), f, axis=2)
                y = nn.leaky_relu(y, 0.2)
                r //= f
                stage += 1
            y = nn.leaky_relu(Conv2d(self.dim, 3, dtype=self.dtype, name="to_img_hr")(y), 0.2)
            out = Conv2d(self.out_channels, 3, dtype=self.dtype, name="to_img_last")(y)
        else:
            raise ValueError(f"unknown upsampler {self.upsampler!r}")
        return out[:, : h0 * s, : w0 * s, :].astype(jnp.float32)


def _flex_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("attn_drop", "proj_drop"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        if "num_blocks" in cfg:
            cfg["num_blocks"] = tuple(cfg["num_blocks"])
        return FlexNet(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_flex_factory(), name="flexnet")
ARCH_REGISTRY.register(
    _flex_factory(pipeline_type="meta", num_blocks=(4, 6, 6, 8)), name="metaflexnet"
)
