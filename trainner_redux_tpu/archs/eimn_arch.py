"""EIMN — Efficient Information Modulation Network (flax/NHWC).

Parity: /root/reference/traiNNer/archs/eimn_arch.py:44-300 (MOLRCM
multi-order large-receptive conv modulation, SADFFM gated feed-forward with
DFFM dual-attention, layer-scaled blocks; eimn_l/eimn_a presets).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import BatchNormNoStats
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _gelu(x):
    return nn.gelu(x, approximate=False)


class DFFM(nn.Module):
    dim: int
    act_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rc = int(self.dim * self.act_ratio)
        identity = x
        # reference custom channels-first LayerNorm, eps 1e-6 (eimn_arch.py:11-41)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        x_global = _gelu(
            Conv2d(rc, 1, dtype=self.dtype, name="global_reduce")(
                x.mean(axis=(1, 2), keepdims=True)
            )
        )
        x_local = _gelu(Conv2d(rc, 1, dtype=self.dtype, name="local_reduce")(x))
        c_attn = nn.sigmoid(Conv2d(self.dim, 1, dtype=self.dtype, name="channel_expand")(x_global))
        gl = jnp.broadcast_to(x_global, x_local.shape)
        s_attn = nn.sigmoid(
            Conv2d(1, 1, dtype=self.dtype, name="spatial_expand")(
                jnp.concatenate([x_local, gl], axis=-1)
            )
        )
        return identity * (c_attn * s_attn)


class SADFFM(nn.Module):
    dim: int
    expand_ratio: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hd = int(self.dim * self.expand_ratio)
        x = Conv2d(hd * 2, 1, dtype=self.dtype, name="linear_in")(x)
        x = Conv2d(hd * 2, 3, feature_group_count=hd * 2, dtype=self.dtype, name="sal")(x)
        x1, x2 = x[..., :hd], x[..., hd:]
        x = _gelu(x1) * x2
        x = Conv2d(self.dim, 1, dtype=self.dtype, name="linear_out")(x)
        return DFFM(self.dim, dtype=self.dtype, name="dffm")(x)


class MOLRCM(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        c1, c2 = int(3 / 8 * d), int(1 / 8 * d)
        c3 = d - c1 - c2
        value = Conv2d(d, 1, dtype=self.dtype, name="proj_value")(x)
        query = _gelu(Conv2d(d, 1, dtype=self.dtype, name="proj_query")(x))
        query = Conv2d(d, 5, feature_group_count=d, dtype=self.dtype, name="region")(query)
        q1 = Conv2d(
            c1, 5, feature_group_count=c1, dilation=2, dtype=self.dtype, name="spatial_1"
        )(query[..., :c1])
        q2 = query[..., c1 : c1 + c2]
        q3 = Conv2d(
            c3, 7, feature_group_count=c3, dilation=3, dtype=self.dtype, name="spatial_2"
        )(query[..., c1 + c2 :])
        fused = Conv2d(d, 1, dtype=self.dtype, name="fusion")(
            jnp.concatenate([q1, q2, q3], axis=-1)
        )
        out = nn.silu(fused)
        return Conv2d(d, 1, dtype=self.dtype, name="out")(out * value)


class EIMNBlock(nn.Module):
    dim: int
    mlp_ratio: float = 2.66
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (self.dim,), jnp.float32)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (self.dim,), jnp.float32)
        y = BatchNormNoStats(dtype=self.dtype, name="norm1")(x, train)
        x = x + ls1.astype(x.dtype) * MOLRCM(self.dim, dtype=self.dtype, name="attn")(y)
        y = BatchNormNoStats(dtype=self.dtype, name="norm2")(x, train)
        x = x + ls2.astype(x.dtype) * SADFFM(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")(y)
        return x


class EIMN(nn.Module):
    embed_dims: int = 64
    scale: int = 2
    depths: int = 1
    mlp_ratios: float = 2.66
    num_stages: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        feat = Conv2d(self.embed_dims, 3, dtype=self.dtype, name="head")(x)
        identity = feat
        cur = feat
        for i in range(self.num_stages):
            for j in range(self.depths):
                cur = EIMNBlock(
                    self.embed_dims, self.mlp_ratios, dtype=self.dtype,
                    name=f"block{i + 1}_{j}",
                )(cur, train)
            cur = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=f"norm{i + 1}"
            )(cur)
        out = Conv2d(3 * self.scale**2, 3, dtype=self.dtype, name="tail")(identity + cur)
        return pixel_shuffle(out, self.scale).astype(jnp.float32)


def _eimn_factory(num_stages: int):
    def factory(scale: int = 2, embed_dims: int = 64, depths: int = 1,
                mlp_ratios: float = 2.66, num_stages: int = num_stages, **kw) -> EIMN:
        for k in ("drop_rate", "drop_path_rate", "freeze_param"):
            kw.pop(k, None)
        return EIMN(
            embed_dims=embed_dims, scale=scale, depths=depths, mlp_ratios=mlp_ratios,
            num_stages=num_stages, **kw,
        )

    return factory


ARCH_REGISTRY.register(_eimn_factory(16), name="eimn_l")
ARCH_REGISTRY.register(_eimn_factory(14), name="eimn_a")
ARCH_REGISTRY.register(_eimn_factory(16), name="eimn")
