"""PatchGAN discriminators (parity: /root/reference/traiNNer/archs/patchgan_arch.py):
NLayerDiscriminator (pix2pix 70x70 PatchGAN) + MultiscaleDiscriminator."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.losses.loss_util import avg_pool
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class PatchGANDiscriminator(nn.Module):
    num_in_ch: int = 3
    num_feat: int = 64
    n_layers: int = 3
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x = x.astype(self.dtype)
        feats = []
        feat = lrelu(Conv2d(self.num_feat, 4, stride=2, padding=1, dtype=self.dtype, name="conv0")(x))
        feats.append(feat)
        mult = 1
        for i in range(1, self.n_layers):
            mult = min(2**i, 8)
            feat = Conv2d(
                self.num_feat * mult, 4, stride=2, padding=1, use_bias=not self.use_norm,
                dtype=self.dtype, name=f"conv{i}",
            )(feat)
            if self.use_norm:
                feat = nn.GroupNorm(
                    num_groups=None, group_size=1, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"norm{i}",
                )(feat)  # InstanceNorm equivalent
            feat = lrelu(feat)
            feats.append(feat)
        mult = min(2**self.n_layers, 8)
        feat = Conv2d(
            self.num_feat * mult, 4, stride=1, padding=1, use_bias=not self.use_norm,
            dtype=self.dtype, name=f"conv{self.n_layers}",
        )(feat)
        if self.use_norm:
            feat = nn.GroupNorm(
                num_groups=None, group_size=1, dtype=self.dtype, param_dtype=jnp.float32,
                name=f"norm{self.n_layers}",
            )(feat)
        feat = lrelu(feat)
        feats.append(feat)
        out = Conv2d(1, 4, stride=1, padding=1, dtype=self.dtype, name="conv_out")(feat)
        out = out.astype(jnp.float32)
        if return_features:
            return out, feats
        return out


@ARCH_REGISTRY.register()
class MultiscaleDiscriminator(nn.Module):
    """Runs PatchGAN discriminators at num_d scales (x1, x0.5, ...)."""

    num_in_ch: int = 3
    num_feat: int = 64
    n_layers: int = 3
    num_d: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        outs, all_feats = [], []
        cur = x
        for i in range(self.num_d):
            res = PatchGANDiscriminator(
                self.num_in_ch, self.num_feat, self.n_layers, dtype=self.dtype,
                name=f"scale_{i}",
            )(cur, train, return_features=True)
            out_i, feats_i = res
            outs.append(out_i)
            all_feats.append(feats_i)
            if i + 1 < self.num_d:
                cur = avg_pool(cur, 2)
        if return_features:
            return outs, all_feats
        return outs
