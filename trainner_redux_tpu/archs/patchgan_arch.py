"""PatchGAN discriminators with spectral normalization (flax/NHWC).

Parity: /root/reference/traiNNer/archs/patchgan_arch.py:10-105
(PatchGANDiscriminatorSN + MultiscalePatchGANDiscriminatorSN): every conv is
spectral-normalized WITH bias, kernel 4, channel schedule min(nf*2, 512);
the multiscale wrapper runs num_d copies on an AvgPool(3, s2,
count_include_pad=False) pyramid and returns the MEAN of the per-scale
patch-map means (a single scalar).
"""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Dtype, SNConv2d
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register(name="patchgandiscriminatorsn")
class PatchGANDiscriminatorSN(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x = x.astype(self.dtype)
        feats = []
        idx = 0

        def sn(v, feat_ch, stride):
            nonlocal idx
            y = SNConv2d(
                feat_ch, 4, stride=stride, padding=1, dtype=self.dtype,
                name=f"conv{idx}",
            )(v, train)
            idx += 1
            return y

        feat = lrelu(sn(x, self.ndf, 2))
        feats.append(feat)
        nf = self.ndf
        for _ in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            feat = lrelu(sn(feat, nf, 2))
            feats.append(feat)
        nf = min(nf * 2, 512)
        feat = lrelu(sn(feat, nf, 1))
        feats.append(feat)
        out = sn(feat, 1, 1)
        if self.use_sigmoid:
            out = nn.sigmoid(out)
        out = out.astype(jnp.float32)
        if return_features:
            return out, feats
        return out


def _avg_pool3_no_pad(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    win = (1, 3, 3, 1)
    st = (1, 2, 2, 1)
    pad = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = lax.reduce_window(x, 0.0, lax.add, win, st, pad)
    n = lax.reduce_window(ones, 0.0, lax.add, win, st, pad)
    return s / n


@ARCH_REGISTRY.register(name="multiscalepatchgandiscriminatorsn")
class MultiscalePatchGANDiscriminatorSN(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    num_d: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        outs, all_feats = [], []
        cur = x
        for i in range(self.num_d):
            out_i, feats_i = PatchGANDiscriminatorSN(
                self.input_nc, self.ndf, self.n_layers, self.use_sigmoid,
                dtype=self.dtype, name=f"layers_{i}",
            )(cur, train, return_features=True)
            outs.append(out_i.mean())
            all_feats.append(feats_i)
            if i + 1 < self.num_d:
                cur = _avg_pool3_no_pad(cur)
        out = jnp.stack(outs).mean()
        if return_features:
            return out, all_feats
        return out


# compatibility aliases for configs written against earlier revisions
ARCH_REGISTRY.register(PatchGANDiscriminatorSN, name="patchgandiscriminator")
ARCH_REGISTRY.register(
    MultiscalePatchGANDiscriminatorSN, name="multiscalediscriminator"
)
