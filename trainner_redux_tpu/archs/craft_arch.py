"""CRAFT — Cross-Refinement Adaptive Feature modulation Transformer
(flax/NHWC).

Parity: the reference's spandrel-backed craft factory
(/root/reference/traiNNer/archs/craft_arch.py:10-39) pins the configuration
surface (embed_dim 48, depths (2,2,2,2), heads 6, split sizes 4x16,
mlp_ratio 2, window 16); block internals follow the CRAFT paper (Li et al.,
ICCV 2023): HFERB (dual local / max-pool high-frequency enhancement
branches), SRWAB (shifted rectangle-window attention with dynamic position
bias, alternating orientations), and a fusion block with improved channel
attention; pixelshuffledirect tail. Checkpoint converter/exporter in
utils/torch_compat.py (structural round-trip tested; layout verified
against a real checkpoint when one lands on disk).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import SpatialAttentionBranch, _rect_mask
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class HFERB(nn.Module):
    """High-frequency enhancement residual block."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        half = d // 2
        y = ChannelLayerNorm(d, name="norm")(x)
        lf = nn.gelu(Conv2d(half, 3, dtype=self.dtype, name="lfe")(y[..., :half]),
                     approximate=False)
        hf = jnp.pad(y[..., half:], ((0, 0), (1, 1), (1, 1), (0, 0)),
                     constant_values=-jnp.inf)
        hf = nn.max_pool(hf, (3, 3), strides=(1, 1))
        hf = nn.gelu(Conv2d(d - half, 1, padding=0, dtype=self.dtype, name="hfe")(hf),
                     approximate=False)
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="fuse")(
            jnp.concatenate([lf, hf], axis=-1)
        )
        return x + y


class SRWAB(nn.Module):
    """Shift rectangle window attention block (dual orientation)."""

    dim: int
    num_heads: int
    split_size: tuple = (4, 16)
    do_shift: bool = False
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ssh, ssw = self.split_size
        max_sp = max(ssh, ssw)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(y)
        qkv = qkv.reshape(b, h, w, 3, c).transpose(3, 0, 1, 2, 4)
        ph, pw = (max_sp - h % max_sp) % max_sp, (max_sp - w % max_sp) % max_sp
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw
        half = c // 2
        sh0, sh1 = ssh // 2, ssw // 2
        if self.do_shift:
            qkv0 = jnp.roll(qkv[..., :half], (-sh0, -sh1), axis=(2, 3))
            qkv1 = jnp.roll(qkv[..., half:], (-sh1, -sh0), axis=(2, 3))
            m0 = _rect_mask(hp, wp, ssh, ssw, sh0, sh1)
            m1 = _rect_mask(hp, wp, ssw, ssh, sh1, sh0)
        else:
            qkv0, qkv1 = qkv[..., :half], qkv[..., half:]
            m0 = m1 = None
        x0 = SpatialAttentionBranch(half, ssh, ssw, max(1, self.num_heads // 2),
                                    dtype=self.dtype, name="attns_0")(qkv0, m0)
        x1 = SpatialAttentionBranch(half, ssw, ssh, max(1, self.num_heads // 2),
                                    dtype=self.dtype, name="attns_1")(qkv1, m1)
        if self.do_shift:
            x0 = jnp.roll(x0, (sh0, sh1), axis=(1, 2))
            x1 = jnp.roll(x1, (sh1, sh0), axis=(1, 2))
        y = jnp.concatenate([x0[:, :h, :w], x1[:, :h, :w]], axis=-1)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(y)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + z


class FusionBlock(nn.Module):
    """Hybrid fusion with improved channel attention."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        y = Conv2d(d, 3, dtype=self.dtype, name="conv")(x)
        z = jnp.mean(y, axis=(1, 2), keepdims=True)
        z = nn.gelu(Conv2d(max(1, d // 4), 1, padding=0, dtype=self.dtype,
                           name="ca_0")(z), approximate=False)
        z = nn.sigmoid(Conv2d(d, 1, padding=0, dtype=self.dtype, name="ca_1")(z))
        return x + y * z


class CRAFT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 48
    depths: tuple = (2, 2, 2, 2)
    num_heads: tuple = (6, 6, 6, 6)
    split_size: tuple = (4, 16)
    window_size: int = 16
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    img_range: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range
        mult = max(self.window_size, max(self.split_size))
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        body = feat
        gi = 0
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            group_in = body
            for bi in range(depth):
                body = HFERB(self.embed_dim, dtype=self.dtype,
                             name=f"layers_{li}_hferb{bi}")(body)
                body = SRWAB(self.embed_dim, heads, tuple(self.split_size),
                             do_shift=bool(gi % 2), mlp_ratio=self.mlp_ratio,
                             qkv_bias=self.qkv_bias, dtype=self.dtype,
                             name=f"layers_{li}_srwab{bi}")(body)
                gi += 1
            body = FusionBlock(self.embed_dim, dtype=self.dtype,
                               name=f"layers_{li}_fusion")(body)
            body = body + group_in
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body
        out = Conv2d(self.in_chans * self.upscale**2, 3, dtype=self.dtype,
                     name="upsample")(feat)
        out = pixel_shuffle(out, self.upscale)
        out = out / self.img_range + mean
        return out[:, : h0 * self.upscale, : w0 * self.upscale, :].astype(jnp.float32)


def craft(
    scale: int = 4,
    window_size: int = 16,
    embed_dim: int = 48,
    depths=(2, 2, 2, 2),
    num_heads=(6, 6, 6, 6),
    split_size_0: int = 4,
    split_size_1: int = 16,
    mlp_ratio: float = 2.0,
    qkv_bias: bool = True,
    img_range: float = 1.0,
    **kwargs,
) -> CRAFT:
    return CRAFT(
        upscale=scale, window_size=window_size, embed_dim=embed_dim,
        depths=tuple(depths), num_heads=tuple(num_heads),
        split_size=(split_size_0, split_size_1), mlp_ratio=mlp_ratio,
        qkv_bias=qkv_bias, img_range=img_range,
    )


SPANDREL_REGISTRY.register(craft, name="craft")
