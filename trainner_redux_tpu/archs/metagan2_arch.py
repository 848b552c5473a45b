"""MetaGan2 discriminator (flax/NHWC).

Parity: /root/reference/traiNNer/archs/metagan2_arch.py:38-260: MambaOut
gated-CNN stages with InceptionNeXt depthwise mixing, spectral-normalized
convs/linears, RMSNorm, MLP head; `return_features` exposes per-stage
features (the reference's `perceptual`) for feature-matching losses.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, SNConv2d, mish
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class RMSNorm(nn.Module):
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x * jnp.reciprocal(jnp.sqrt(var + self.epsilon)).astype(x.dtype)
        return y * scale.astype(x.dtype)


class InceptionDWConv(nn.Module):
    channels: int
    square_kernel: int = 3
    band_kernel: int = 11
    branch_ratio: float = 0.125
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gc = int(self.channels * self.branch_ratio)
        idc = self.channels - 3 * gc
        x_id = x[..., :idc]
        x_hw = x[..., idc : idc + gc]
        x_w = x[..., idc + gc : idc + 2 * gc]
        x_h = x[..., idc + 2 * gc :]
        x_hw = Conv2d(gc, self.square_kernel, feature_group_count=gc, dtype=self.dtype, name="dw_hw")(x_hw)
        x_w = Conv2d(gc, (1, self.band_kernel), feature_group_count=gc, dtype=self.dtype, name="dw_w")(x_w)
        x_h = Conv2d(gc, (self.band_kernel, 1), feature_group_count=gc, dtype=self.dtype, name="dw_h")(x_h)
        return jnp.concatenate([x_id, x_hw, x_w, x_h], axis=-1)


class GatedCNNBlock(nn.Module):
    dim: int
    expansion_ratio: float = 8 / 3
    conv_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        hidden = int(self.expansion_ratio * self.dim)
        conv_ch = int(self.conv_ratio * self.dim)
        shortcut = x
        x = RMSNorm(dtype=self.dtype, name="norm")(x)
        # spectral-normalized linear == 1x1 SNConv
        y = SNConv2d(hidden * 2, 1, padding=0, dtype=self.dtype, name="fc1")(x, train)
        g = y[..., :hidden]
        i_part = y[..., hidden : 2 * hidden - conv_ch]
        c_part = y[..., 2 * hidden - conv_ch :]
        c_part = InceptionDWConv(conv_ch, dtype=self.dtype, name="conv")(c_part)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,), jnp.float32)
        out = SNConv2d(self.dim, 1, padding=0, dtype=self.dtype, name="fc2")(
            nn.silu(g) * jnp.concatenate([i_part, c_part], axis=-1), train
        )
        return out * gamma.astype(out.dtype) + shortcut


class MetaStage(nn.Module):
    out_dim: int
    blocks: int
    down: int  # 4 = stem (two stride-2), 2 = norm-first downsample
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.down == 4:
            x = SNConv2d(self.out_dim // 2, 3, stride=2, padding=1, dtype=self.dtype, name="stem1")(x, train)
            x = nn.silu(x)
            x = SNConv2d(self.out_dim, 3, stride=2, padding=1, dtype=self.dtype, name="stem2")(x, train)
            x = RMSNorm(dtype=self.dtype, name="stem_norm")(x)
        else:
            # reference DownsampleNormFirst uses nn.RMSNorm(dim) with
            # eps=None -> torch.finfo(float32).eps
            x = RMSNorm(epsilon=1.1920929e-07, dtype=self.dtype, name="down_norm")(x)
            x = SNConv2d(self.out_dim, 3, stride=2, padding=1, dtype=self.dtype, name="down")(x, train)
        for i in range(self.blocks):
            x = GatedCNNBlock(self.out_dim, dtype=self.dtype, name=f"block_{i}")(x, train)
        return x


class MetaGan2(nn.Module):
    in_ch: int = 3
    n_class: int = 1
    dims: tuple = (32, 64, 128, 192)
    blocks: tuple = (3, 3, 15, 3)
    downs: tuple = (4, 2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        x = x.astype(self.dtype)
        feats = []
        for i, (dim, nb, down) in enumerate(zip(self.dims, self.blocks, self.downs)):
            x = MetaStage(dim, nb, down, dtype=self.dtype, name=f"stages_{i}")(x, train)
            feats.append(x)
        h = SNConv2d(self.dims[-1] * 4, 1, padding=0, dtype=self.dtype, name="head_fc1")(x, train)
        h = mish(h)
        out = nn.Dense(
            self.dims[-1], dtype=self.dtype, param_dtype=jnp.float32, name="head_fc2"
        )(h)
        out = out.astype(jnp.float32)
        if return_features:
            return out, feats + [out]
        return out


def _metagan_factory(**defaults):
    def factory(in_ch: int = 3, n_class: int = 1, dims=(32, 64, 128, 192),
                blocks=(3, 3, 15, 3), downs=(4, 2, 2, 2), **kw):
        cfg = dict(defaults)
        cfg.update(kw)
        return MetaGan2(
            in_ch=in_ch, n_class=n_class, dims=tuple(dims), blocks=tuple(blocks),
            downs=tuple(downs), **cfg,
        )

    return factory


ARCH_REGISTRY.register(_metagan_factory(), name="metagan2")
# metagan3 now has a dedicated port with the exact v3 block internals
# (dual-path spectral-norm blocks): see metagan3_arch.py
