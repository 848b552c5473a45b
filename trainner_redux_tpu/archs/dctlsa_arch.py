"""DCTLSA — DCT-based channel attention + local self-attention SR
(flax/NHWC).

Parity: the reference's spandrel-backed dctlsa factory
(/root/reference/traiNNer/archs/dctlsa_arch.py:6-22) pins the configuration
surface (nf 55, num_modules 6, num_head 5); block internals follow the
DCTLSA paper (Zeng et al., 2023): stacked modules combining a conv
distillation branch, local window self-attention (num_head heads), and a
DCT-coefficient channel attention (frequency-pooled SE), with dense
aggregation of all module outputs through a 1x1 fuse and a
pixelshuffledirect tail. Checkpoint converter/exporter in
utils/torch_compat.py (structural round-trip tested; layout verified
against a real checkpoint when one lands on disk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


@functools.lru_cache(maxsize=8)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (n, n)."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    basis = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    return basis.astype(np.float32)


class DCTChannelAttention(nn.Module):
    """SE over low-frequency 2D-DCT coefficients of pooled features."""

    dim: int
    pool: int = 8
    reduction: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.pool
        y = jax.image.resize(x, (b, p, p, c), "linear").astype(jnp.float32)
        d = jnp.asarray(_dct_basis(p))
        # 2D DCT: D @ Y @ D^T per channel
        coef = jnp.einsum("uh,bhwc,wv->buvc", d, y, d.T)
        feat = coef[:, : p // 2, : p // 2, :].mean(axis=(1, 2))  # low-freq pool
        z = nn.Dense(max(1, c // self.reduction), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(feat.astype(self.dtype))
        z = nn.relu(z)
        z = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(z)
        return x * nn.sigmoid(z)[:, None, None, :]


class LocalSelfAttention(nn.Module):
    dim: int
    num_heads: int = 5
    window: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = min(self.window, min(h, w))
        nh = self.num_heads if c % self.num_heads == 0 else 1
        hd = c // nh
        ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
        xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
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
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)[:, :h, :w]
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class DCTLSAModule(nn.Module):
    nf: int
    num_head: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.leaky_relu(Conv2d(self.nf, 3, dtype=self.dtype, name="conv1")(x), 0.05)
        y = y + LocalSelfAttention(self.nf, self.num_head, dtype=self.dtype,
                                   name="lsa")(y)
        y = DCTChannelAttention(self.nf, dtype=self.dtype, name="dct_ca")(y)
        y = Conv2d(self.nf, 3, dtype=self.dtype, name="conv2")(y)
        return x + y


class DCTLSA(nn.Module):
    upscale: int = 4
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 55
    num_modules: int = 6
    num_head: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        feat = Conv2d(self.nf, 3, dtype=self.dtype, name="fea_conv")(x)
        outs = []
        y = feat
        for i in range(self.num_modules):
            y = DCTLSAModule(self.nf, self.num_head, dtype=self.dtype,
                             name=f"b{i}")(y)
            outs.append(y)
        y = Conv2d(self.nf, 1, padding=0, dtype=self.dtype, name="c")(
            jnp.concatenate(outs, axis=-1)
        )
        y = nn.leaky_relu(y, 0.05)
        y = Conv2d(self.nf, 3, dtype=self.dtype, name="lr_conv")(y) + feat
        out = Conv2d(self.out_nc * self.upscale**2, 3, dtype=self.dtype,
                     name="upsampler")(y)
        return pixel_shuffle(out, self.upscale).astype(jnp.float32)


def dctlsa(
    scale: int = 4,
    in_nc: int = 3,
    nf: int = 55,
    num_modules: int = 6,
    out_nc: int = 3,
    num_head: int = 5,
    **kwargs,
) -> DCTLSA:
    return DCTLSA(
        upscale=scale, in_nc=in_nc, out_nc=out_nc, nf=nf,
        num_modules=num_modules, num_head=num_head,
    )


SPANDREL_REGISTRY.register(dctlsa, name="dctlsa")
