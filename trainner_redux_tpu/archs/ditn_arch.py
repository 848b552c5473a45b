"""DITN — deployment-friendly inner-patch transformer network (flax/NHWC).

Parity: the reference's spandrel-backed ditn_real factory
(/root/reference/traiNNer/archs/ditn_arch.py:6-30) pins the configuration
surface (dim, ITL/SAL/UFONE block counts, ffn_expansion_factor, patch_size,
LayerNorm type); the block internals follow the DITN paper (Liu et al.,
ACM MM 2023): UFONE groups = Inner-patch Transformer Layers (LN + MHSA
within patch_size windows + gated-dwconv FFN) followed by Spatial-Aware
Layers (dilated depthwise dual-branch gating + FFN), SFT conv head,
pixelshuffledirect tail. Checkpoint converter/exporter in
utils/torch_compat.py (structural round-trip tested; layout verified
against a real checkpoint when one lands on disk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class GatedDWFFN(nn.Module):
    dim: int
    expansion: float = 2.0
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.expansion)
        y = Conv2d(hid * 2, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                   name="project_in")(x)
        y = Conv2d(hid * 2, 3, feature_group_count=hid * 2, use_bias=self.use_bias,
                   dtype=self.dtype, name="dwconv")(y)
        y = nn.gelu(y[..., :hid], approximate=False) * y[..., hid:]
        return Conv2d(self.dim, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                      name="project_out")(y)


class ISA(nn.Module):
    """Inner-patch self-attention: MHSA within patch_size windows, scaled by
    a learned temperature (upstream DITN ISA: qkv/project_out Linears plus a
    `temperature` parameter multiplying the logits)."""

    dim: int
    patch_size: int = 8
    num_heads: int = 6
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ps = self.patch_size
        nh = self.num_heads if c % self.num_heads == 0 else 1
        hd = c // nh
        temp = self.param("temperature", nn.initializers.ones, (1, 1, 1),
                          jnp.float32)
        qkv = Conv2d(c * 3, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                     name="qkv")(x)
        qkv = qkv.reshape(b, h // ps, ps, w // ps, ps, 3, nh, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(3, -1, nh, ps * ps, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * temp[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.reshape(b, h // ps, w // ps, nh, ps, ps, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, c)
        return Conv2d(c, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                      name="project_out")(out)


class ITL(nn.Module):
    dim: int
    patch_size: int
    ffn_expansion: float
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ChannelLayerNorm(self.dim, name="norm1")(x)
        x = x + ISA(self.dim, self.patch_size, use_bias=self.use_bias,
                    dtype=self.dtype, name="attn")(y)
        y = ChannelLayerNorm(self.dim, name="norm2")(x)
        return x + GatedDWFFN(self.dim, self.ffn_expansion, self.use_bias,
                              dtype=self.dtype, name="ffn")(y)


class SDA(nn.Module):
    """Spatial-aware dual attention: dilated depthwise dual-branch gating."""

    dim: int
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        b1 = Conv2d(d, 3, feature_group_count=d, dilation=2, use_bias=self.use_bias,
                    dtype=self.dtype, name="sade_d2")(y)
        b2 = Conv2d(d, 3, feature_group_count=d, dilation=3, use_bias=self.use_bias,
                    dtype=self.dtype, name="sade_d3")(y)
        g = nn.sigmoid(Conv2d(d, 1, padding=0, use_bias=self.use_bias,
                              dtype=self.dtype, name="gate")(y))
        return Conv2d(d, 1, padding=0, use_bias=self.use_bias, dtype=self.dtype,
                      name="fuse")(g * b1 + (1.0 - g) * b2)


class SAL(nn.Module):
    """Spatial-aware layer: pre-norm SDA + pre-norm gated-dwconv FFN."""

    dim: int
    ffn_expansion: float
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        y = ChannelLayerNorm(d, name="norm1")(x)
        x = x + SDA(d, self.use_bias, dtype=self.dtype, name="attn")(y)
        y = ChannelLayerNorm(d, name="norm2")(x)
        return x + GatedDWFFN(d, self.ffn_expansion, self.use_bias, dtype=self.dtype,
                              name="ffn")(y)


class DITN(nn.Module):
    upscale: int = 4
    inp_channels: int = 3
    dim: int = 60
    itl_blocks: int = 4
    sal_blocks: int = 4
    ufone_blocks: int = 1
    ffn_expansion_factor: float = 2.0
    use_bias: bool = False
    patch_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        ps = self.patch_size
        ph, pw = (ps - h0 % ps) % ps, (ps - w0 % ps) % ps
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="sft")(xp)
        body = feat
        for ui in range(self.ufone_blocks):
            u_in = body
            for i in range(self.itl_blocks):
                body = ITL(self.dim, ps, self.ffn_expansion_factor, self.use_bias,
                           dtype=self.dtype, name=f"ufone_{ui}_itl{i}")(body)
            for i in range(self.sal_blocks):
                body = SAL(self.dim, self.ffn_expansion_factor, self.use_bias,
                           dtype=self.dtype, name=f"ufone_{ui}_sal{i}")(body)
            body = body + u_in
        body = Conv2d(self.dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body
        out = Conv2d(self.inp_channels * self.upscale**2, 3, dtype=self.dtype,
                     name="upsample")(feat)
        out = pixel_shuffle(out, self.upscale)
        return out[:, : h0 * self.upscale, : w0 * self.upscale, :].astype(jnp.float32)


def ditn_real(
    scale: int = 4,
    inp_channels: int = 3,
    dim: int = 60,
    ITL_blocks: int = 4,  # noqa: N803
    SAL_blocks: int = 4,  # noqa: N803
    UFONE_blocks: int = 1,  # noqa: N803
    ffn_expansion_factor: float = 2,
    bias: bool = False,
    LayerNorm_type: str = "WithBias",  # noqa: N803
    patch_size: int = 8,
    **kwargs,
) -> DITN:
    return DITN(
        upscale=scale, inp_channels=inp_channels, dim=dim, itl_blocks=ITL_blocks,
        sal_blocks=SAL_blocks, ufone_blocks=UFONE_blocks,
        ffn_expansion_factor=float(ffn_expansion_factor), use_bias=bias,
        patch_size=patch_size,
    )


SPANDREL_REGISTRY.register(ditn_real, name="ditn_real")
