"""SAFMN — Spatially-Adaptive Feature Modulation Network (flax/NHWC).

Parity: the reference's spandrel-backed safmn/safmn_l factories
(/root/reference/traiNNer/archs/safmn_arch.py:7-21), implementing the SAFMN
architecture (Sun et al., ICCV 2023): SAFM multi-scale modulation + CCM
channel mixer per block, conv + pixel-shuffle tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


def _max_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID"
    )


class SAFM(nn.Module):
    dim: int
    n_levels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        chunk = c // self.n_levels
        parts = []
        for i in range(self.n_levels):
            xi = x[..., i * chunk : (i + 1) * chunk]
            if i > 0:
                k = 2**i
                # pad so pooling divides, then pool / dwconv / nearest-upsample
                ph = (k - h % k) % k
                pw = (k - w % k) % k
                xp = jnp.pad(xi, ((0, 0), (0, ph), (0, pw), (0, 0))) if (ph or pw) else xi
                down = _max_pool(xp, k)
                down = Conv2d(
                    chunk, 3, feature_group_count=chunk, dtype=self.dtype, name=f"mfr_{i}"
                )(down)
                up = jnp.repeat(jnp.repeat(down, k, axis=1), k, axis=2)[:, :h, :w, :]
                parts.append(up)
            else:
                parts.append(
                    Conv2d(
                        chunk, 3, feature_group_count=chunk, dtype=self.dtype,
                        name=f"mfr_{i}",
                    )(xi)
                )
        out = Conv2d(self.dim, 1, dtype=self.dtype, name="aggr")(
            jnp.concatenate(parts, axis=-1)
        )
        return nn.gelu(out, approximate=False) * x


class CCM(nn.Module):
    dim: int
    ffn_scale: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.ffn_scale)
        x = Conv2d(hidden, 3, dtype=self.dtype, name="conv0")(x)
        x = nn.gelu(x, approximate=False)
        return Conv2d(self.dim, 1, dtype=self.dtype, name="conv1")(x)


class AttBlock(nn.Module):
    dim: int
    ffn_scale: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        x = x + SAFM(self.dim, dtype=self.dtype, name="safm")(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        return x + CCM(self.dim, self.ffn_scale, dtype=self.dtype, name="ccm")(y)


class SAFMN(nn.Module):
    dim: int = 36
    n_blocks: int = 8
    ffn_scale: float = 2.0
    upscaling_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        feat = Conv2d(self.dim, 3, dtype=self.dtype, name="to_feat")(x)
        body = feat
        for i in range(self.n_blocks):
            body = AttBlock(self.dim, self.ffn_scale, dtype=self.dtype, name=f"feats_{i}")(body)
        body = body + feat
        out = Conv2d(
            3 * self.upscaling_factor**2, 3, dtype=self.dtype, name="to_img"
        )(body)
        return pixel_shuffle(out, self.upscaling_factor).astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def safmn(scale: int = 4, dim: int = 36, n_blocks: int = 8, ffn_scale: float = 2.0, **kw) -> SAFMN:
    return SAFMN(dim=dim, n_blocks=n_blocks, ffn_scale=ffn_scale, upscaling_factor=scale, **kw)


@SPANDREL_REGISTRY.register()
def safmn_l(scale: int = 4, dim: int = 128, n_blocks: int = 16, ffn_scale: float = 2.0, **kw) -> SAFMN:
    return SAFMN(dim=dim, n_blocks=n_blocks, ffn_scale=ffn_scale, upscaling_factor=scale, **kw)
