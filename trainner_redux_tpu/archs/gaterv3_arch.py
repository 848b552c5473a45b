"""GateRV3 — gated U-Net restoration/SR hybrid with SPAN SISR branch
(flax/NHWC).

Parity: reference traiNNer/archs/gaterv3_arch.py:391-503 (GateRV3 +
gaterv3_s/gaterv3_r): pixel-unshuffle encoder of MetaGated blocks (NAFNet
style simple-gate local branch + simple channel attention + MambaOut gated
global branch), latent GatedCNN stack (optional spatial attention), skip-cat
decoder, SPAB re-param SISR branch fused at full resolution, UniUpsample
tail with nearest-upsampled gamma residual. The reference's gamma
gradient-x10 hooks are a training-dynamics detail not replicated (flax
optimizers see raw grads).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import (
    Conv2d,
    Dtype,
    mish,
    pixel_shuffle,
    pixel_unshuffle,
)
from trainner_redux_tpu.archs.moesr_arch import InceptionDWConv2d, UniUpsample
from trainner_redux_tpu.archs.mosrv2_arch import ChannelRMSNorm
from trainner_redux_tpu.archs.span_arch import Conv3XC
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class GSPAB(nn.Module):
    """GateRV3's SPAB: bias-free Conv3XC branches (gaterv3_arch.py:129-160);
    the inplace SiLU means the returned intermediate is silu(out1)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        c = self.channels
        out1 = Conv3XC(c, c, gain=2, use_bias=False, dtype=self.dtype,
                       name="c1_r")(x, train)
        out1_act = nn.silu(out1)
        out2 = Conv3XC(c, c, gain=2, use_bias=False, dtype=self.dtype,
                       name="c2_r")(out1_act, train)
        out3 = Conv3XC(c, c, gain=2, use_bias=False, dtype=self.dtype,
                       name="c3_r")(nn.silu(out2), train)
        sim_att = nn.sigmoid(out3) - 0.5
        return (out3 + x) * sim_att, out1_act


class SpatialAttention(nn.Module):
    """qkv 1x1 + dw 3x3, softmax attention over tokens (the reference's
    flash path)."""

    dim: int
    num_heads: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        qkv = Conv2d(c * 3, 1, padding=0, use_bias=False, dtype=self.dtype, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, feature_group_count=c * 3, dtype=self.dtype,
                     name="qkv_dwconv")(qkv)
        qkv = qkv.reshape(b, h * w, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return Conv2d(c, 1, padding=0, use_bias=False, dtype=self.dtype,
                      name="project_out")(out)


class GatedCNNBlockG(nn.Module):
    """Gater variant: Mish-activated output, no internal residual."""

    dim: int
    expansion_ratio: float = 1.5
    att: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.expansion_ratio * self.dim)
        y = ChannelRMSNorm(self.dim, name="norm")(x)
        y = Conv2d(hidden * 2, 1, padding=0, dtype=self.dtype, name="fc1")(y)
        g = y[..., :hidden]
        i = y[..., hidden : 2 * hidden - self.dim]
        c = y[..., 2 * hidden - self.dim :]
        if self.att:
            c = SpatialAttention(self.dim, dtype=self.dtype, name="token_mix")(c)
        else:
            c = InceptionDWConv2d(self.dim, dtype=self.dtype, name="token_mix")(c)
        y = mish(g) * jnp.concatenate([i, c], axis=-1)
        return mish(Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fc2")(y))


class MetaGated(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        short = x
        y = ChannelRMSNorm(d, name="local_norm")(x)
        y = Conv2d(2 * d, 1, padding=0, dtype=self.dtype, name="local_fc")(y)
        y = Conv2d(2 * d, 3, feature_group_count=d, dtype=self.dtype, name="local_dw")(y)
        y = y[..., :d] * y[..., d:]  # SimpleGate
        sca = Conv2d(d, 1, padding=0, dtype=self.dtype, name="sca")(
            jnp.mean(y, axis=(1, 2), keepdims=True)
        )
        y = y * sca
        g0 = self.param("gamma0", nn.initializers.ones, (d,), jnp.float32)
        g1 = self.param("gamma1", nn.initializers.ones, (d,), jnp.float32)
        x = y * g0.astype(x.dtype) + short
        y = GatedCNNBlockG(d, dtype=self.dtype, name="glob")(x)
        return y * g1.astype(x.dtype) + x


class GateRV3(nn.Module):
    scale: int = 2
    in_ch: int = 3
    dim: int = 32
    enc_blocks: tuple = (2, 2, 4, 6)
    dec_blocks: tuple = (2, 2, 2, 2)
    num_latent: int = 8
    upsample: str = "pixelshuffle"
    upsample_mid_dim: int = 48
    end_gamma_init: float = 1.0
    attention: bool = False
    sisr_blocks: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        pad = 2 ** len(self.enc_blocks)
        ph, pw = (pad - h0 % pad) % pad, (pad - w0 % pad) % pad
        inp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_dim")(inp)

        # SPAN SISR branch at full resolution
        sisr = GSPAB(self.dim, dtype=self.dtype, name="span_block0")(feat, train)[0]
        sisr_short = sisr
        for i in range(self.sisr_blocks):
            sisr = GSPAB(self.dim, dtype=self.dtype, name=f"span_n_b_{i}")(sisr, train)[0]
        sisr, sisr_out = GSPAB(self.dim, dtype=self.dtype, name="span_end")(sisr, train)
        sisr = Conv3XC(self.dim, self.dim, dtype=self.dtype, name="sisr_end_conv")(sisr, train)
        sisr = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="sisr_cat_conv")(
            jnp.concatenate([feat, sisr, sisr_short, sisr_out], axis=-1)
        )

        # encoder
        shorts = []
        y = feat
        for li, n in enumerate(self.enc_blocks):
            d = self.dim * 2**li
            for bi in range(n):
                y = MetaGated(d, dtype=self.dtype, name=f"enc_{li}_g{bi}")(y)
            shorts.append(y)
            y = Conv2d(d // 2, 3, use_bias=False, dtype=self.dtype, name=f"enc_{li}_down")(y)
            y = pixel_unshuffle(y, 2)

        for i in range(self.num_latent):
            y = GatedCNNBlockG(
                self.dim * 2 ** len(self.enc_blocks), att=self.attention,
                dtype=self.dtype, name=f"latent_{i}",
            )(y)

        for li, n in enumerate(self.dec_blocks):
            d = self.dim * 2 ** (len(self.dec_blocks) - li)
            y = Conv2d(d * 2, 3, use_bias=False, dtype=self.dtype, name=f"dec_{li}_up")(y)
            y = pixel_shuffle(y, 2)
            y = jnp.concatenate([y, shorts[-(li + 1)]], axis=-1)
            y = Conv2d(d // 2, 1, padding=0, dtype=self.dtype, name=f"dec_{li}_shor")(y)
            for bi in range(n):
                y = MetaGated(d // 2, dtype=self.dtype, name=f"dec_{li}_g{bi}")(y)

        gamma = self.param(
            "gamma", nn.initializers.constant(self.end_gamma_init), (self.in_ch,),
            jnp.float32,
        )
        if self.scale != 1:
            out = UniUpsample(
                self.upsample, self.scale, self.dim, self.in_ch,
                self.upsample_mid_dim, dtype=self.dtype, name="dim_to_in",
            )(y + sisr, train)
            short = jnp.repeat(jnp.repeat(inp, self.scale, axis=1), self.scale, axis=2)
        else:
            out = Conv2d(self.in_ch, 3, dtype=self.dtype, name="dim_to_in")(y + sisr)
            short = inp
        out = out + gamma.astype(out.dtype) * short
        return out[:, : h0 * self.scale, : w0 * self.scale, :].astype(jnp.float32)


def _gater_factory(**defaults):
    def factory(scale: int = 2, **kwargs):
        cfg = dict(defaults)
        kwargs.pop("flash", None)
        cfg.update(kwargs)
        for k in ("enc_blocks", "dec_blocks"):
            if k in cfg:
                cfg[k] = tuple(cfg[k])
        return GateRV3(scale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(
    _gater_factory(enc_blocks=(2, 2, 4), dec_blocks=(2, 2, 2), dim=32), name="gaterv3_s"
)
ARCH_REGISTRY.register(_gater_factory(dim=32), name="gaterv3_r")
ARCH_REGISTRY.register(_gater_factory(), name="gaterv3")
