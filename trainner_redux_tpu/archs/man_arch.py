"""MAN — Multi-scale Attention Network (flax/NHWC).

Parity: /root/reference/traiNNer/archs/man_arch.py (GroupGLKA multiscale
large-kernel attention, SGAB simple-gate blocks, LKAT group tail, MAN with
man/man_tiny/man_light presets). Depthwise dilated large-kernel convs are
the hot ops — NHWC depthwise conv lowers directly to TPU convolutions.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ChannelLayerNorm(nn.Module):
    """LayerNorm over channels of NHWC maps (torch 'channels_first' LN)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # reference man_arch.py:167-197: custom LN, eps 1e-6
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32)(x)


def _dw(ch: int, k: int, dilation: int = 1, dtype=jnp.float32, name: str = "dw"):
    return Conv2d(
        ch, k, feature_group_count=ch, dilation=dilation, dtype=dtype, name=name
    )


class GroupGLKA(nn.Module):
    """Multiscale large-kernel attention gate (MAN's core block)."""

    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nf = self.n_feats
        third = nf // 3
        shortcut = x
        scale = self.param("scale", nn.initializers.zeros, (nf,), jnp.float32)

        x = ChannelLayerNorm(dtype=self.dtype, name="norm")(x)
        x = Conv2d(2 * nf, 1, dtype=self.dtype, name="proj_first")(x)
        a, x = x[..., :nf], x[..., nf:]
        a1, a2, a3 = a[..., :third], a[..., third : 2 * third], a[..., 2 * third :]

        # LKA3: dw3 + dw5 dil2 + 1x1, gated by dw3
        l3 = _dw(third, 3, 1, self.dtype, "lka3_0")(a1)
        l3 = _dw(third, 5, 2, self.dtype, "lka3_1")(l3)
        l3 = Conv2d(third, 1, dtype=self.dtype, name="lka3_2")(l3)
        g3 = _dw(third, 3, 1, self.dtype, "x3")(a1)

        l5 = _dw(third, 5, 1, self.dtype, "lka5_0")(a2)
        l5 = _dw(third, 7, 3, self.dtype, "lka5_1")(l5)
        l5 = Conv2d(third, 1, dtype=self.dtype, name="lka5_2")(l5)
        g5 = _dw(third, 5, 1, self.dtype, "x5")(a2)

        l7 = _dw(a3.shape[-1], 7, 1, self.dtype, "lka7_0")(a3)
        l7 = _dw(a3.shape[-1], 9, 4, self.dtype, "lka7_1")(l7)
        l7 = Conv2d(a3.shape[-1], 1, dtype=self.dtype, name="lka7_2")(l7)
        g7 = _dw(a3.shape[-1], 7, 1, self.dtype, "x7")(a3)

        a = jnp.concatenate([l3 * g3, l5 * g5, l7 * g7], axis=-1)
        out = Conv2d(nf, 1, dtype=self.dtype, name="proj_last")(x * a)
        return out * scale.astype(out.dtype) + shortcut


class SGAB(nn.Module):
    """Simple gate + depthwise conv feed-forward."""

    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nf = self.n_feats
        shortcut = x
        scale = self.param("scale", nn.initializers.zeros, (nf,), jnp.float32)
        x = ChannelLayerNorm(dtype=self.dtype, name="norm")(x)
        x = Conv2d(2 * nf, 1, dtype=self.dtype, name="conv1")(x)
        a, x = x[..., :nf], x[..., nf:]
        x = x * _dw(nf, 7, 1, self.dtype, "dwconv")(a)
        x = Conv2d(nf, 1, dtype=self.dtype, name="conv2")(x)
        return x * scale.astype(x.dtype) + shortcut


class LKAT(nn.Module):
    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nf = self.n_feats
        x = nn.gelu(Conv2d(nf, 1, dtype=self.dtype, name="conv0")(x), approximate=False)
        att = _dw(nf, 7, 1, self.dtype, "att_0")(x)
        # reference LKAT (man_arch.py:337-347): k=9 with dilation 3 (the
        # GroupGLKA LKA7 branch uses dilation 4; this tail does not)
        att = _dw(nf, 9, 3, self.dtype, "att_1")(att)
        att = Conv2d(nf, 1, dtype=self.dtype, name="att_2")(att)
        return Conv2d(nf, 1, dtype=self.dtype, name="conv1")(x * att)


class MAN(nn.Module):
    n_resblocks: int = 36
    n_resgroups: int = 1
    n_colors: int = 3
    n_feats: int = 180
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = x - mean
        feat = Conv2d(self.n_feats, 3, dtype=self.dtype, name="head")(x)
        res = feat
        for g in range(self.n_resgroups):
            group_in = res
            for b in range(self.n_resblocks):
                res = GroupGLKA(self.n_feats, dtype=self.dtype, name=f"g{g}_lka_{b}")(res)
                res = SGAB(self.n_feats, dtype=self.dtype, name=f"g{g}_sgab_{b}")(res)
            res = LKAT(self.n_feats, dtype=self.dtype, name=f"g{g}_tail")(res) + group_in
        if self.n_resgroups > 1:
            res = Conv2d(self.n_feats, 3, dtype=self.dtype, name="body_t")(res) + feat
        out = Conv2d(self.n_colors * self.scale**2, 3, dtype=self.dtype, name="tail")(res)
        out = pixel_shuffle(out, self.scale)
        return (out + mean).astype(jnp.float32)


def _man_factory(n_resblocks: int, n_feats: int):
    def factory(scale: int = 4, n_resblocks: int = n_resblocks, n_resgroups: int = 1,
                n_colors: int = 3, n_feats: int = n_feats, **kwargs) -> MAN:
        return MAN(
            n_resblocks=n_resblocks, n_resgroups=n_resgroups, n_colors=n_colors,
            n_feats=n_feats, scale=scale, **kwargs,
        )

    return factory


ARCH_REGISTRY.register(_man_factory(36, 180), name="man")
ARCH_REGISTRY.register(_man_factory(5, 48), name="man_tiny")
ARCH_REGISTRY.register(_man_factory(24, 60), name="man_light")
