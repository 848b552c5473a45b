"""SeemoRe — expert-mining SR (flax/NHWC).

Parity: the reference's spandrel-backed seemore_t factory
(/root/reference/traiNNer/archs/seemore_arch.py:6-32) pins the configuration
surface (num_experts, num_layers, embedding_dim, use_shuffle,
global_kernel_size, recursive, lr_space, topk); block internals follow the
SeemoRe paper (Zamfir et al., ICML 2024): alternating RME (rank-modulating
experts — a router softly mixes low-rank experts whose ranks grow by the
lr_space rule, applied `recursive` times) and SME (spatial-modulating
expert — striped global_kernel_size depthwise gating), each with gated conv
FFNs. Checkpoint converter/exporter in utils/torch_compat.py (structural
round-trip tested; layout verified against a real checkpoint when one
lands on disk).

TPU notes: the router uses dense soft top-k (weights renormalized over the
top-k mask via jnp.where) so expert dispatch stays a static dense compute —
no gather/scatter, every expert runs and results blend, which is the right
trade at these tiny expert counts (3-6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


def _expert_ranks(dim: int, n: int, lr_space: str) -> list[int]:
    base = max(2, dim // 8)
    if lr_space == "exp":
        ranks = [base * 2**i for i in range(n)]
    elif lr_space == "double":
        ranks = [base * (2 * i + 1) for i in range(n)]
    else:  # linear
        ranks = [base * (i + 1) for i in range(n)]
    return [min(r, dim) for r in ranks]


class LowRankExpert(nn.Module):
    dim: int
    rank: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = Conv2d(self.rank, 1, padding=0, dtype=self.dtype, name="down")(x)
        y = Conv2d(self.rank, 3, feature_group_count=self.rank, dtype=self.dtype,
                   name="dw")(y)
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="up")(y)


class MoELayer(nn.Module):
    dim: int
    num_experts: int
    topk: int
    lr_space: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ranks = _expert_ranks(self.dim, self.num_experts, self.lr_space)
        logits = nn.Dense(self.num_experts, dtype=self.dtype,
                          param_dtype=jnp.float32, name="router")(
            jnp.mean(x, axis=(1, 2))
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if self.topk < self.num_experts:
            kth = jnp.sort(probs, axis=-1)[:, -self.topk][:, None]
            masked = jnp.where(probs >= kth, probs, 0.0)
            probs = masked / jnp.maximum(masked.sum(-1, keepdims=True), 1e-9)
        outs = jnp.stack(
            [
                LowRankExpert(self.dim, r, dtype=self.dtype, name=f"expert_{i}")(x)
                for i, r in enumerate(ranks)
            ],
            axis=-1,
        )  # (b, h, w, c, E)
        w = probs.astype(x.dtype)[:, None, None, None, :]
        return (outs * w).sum(-1)


class GatedConvFFN(nn.Module):
    dim: int
    expansion: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hid = int(self.dim * self.expansion)
        g = Conv2d(hid, 1, padding=0, dtype=self.dtype, name="gate")(x)
        i = Conv2d(hid, 1, padding=0, dtype=self.dtype, name="up")(x)
        y = nn.gelu(g, approximate=False) * i
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="down")(y)


class RME(nn.Module):
    """Rank-modulating experts block."""

    dim: int
    num_experts: int
    topk: int
    lr_space: str
    recursive: int = 2
    use_shuffle: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = ChannelLayerNorm(self.dim, name="norm1")(x)
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="pre")(y)
        if self.use_shuffle:
            # channel shuffle with 2 groups
            b, h, w, c = y.shape
            y = y.reshape(b, h, w, 2, c // 2).swapaxes(-1, -2).reshape(b, h, w, c)
        moe = MoELayer(self.dim, self.num_experts, self.topk, self.lr_space,
                       dtype=self.dtype, name="moe")
        for _ in range(self.recursive):
            y = moe(y)
        x = x + Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="post")(y)
        y = ChannelLayerNorm(self.dim, name="norm2")(x)
        return x + GatedConvFFN(self.dim, dtype=self.dtype, name="ffn")(y)


class SME(nn.Module):
    """Spatial-modulating expert: striped large-kernel depthwise gating."""

    dim: int
    kernel: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = self.dim
        y = ChannelLayerNorm(d, name="norm1")(x)
        a = Conv2d(d, (1, self.kernel), feature_group_count=d, dtype=self.dtype,
                   name="stripe_w")(y)
        a = Conv2d(d, (self.kernel, 1), feature_group_count=d, dtype=self.dtype,
                   name="stripe_h")(a)
        v = Conv2d(d, 1, padding=0, dtype=self.dtype, name="value")(y)
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="proj")(nn.gelu(a, approximate=False) * v)
        x = x + y
        y = ChannelLayerNorm(d, name="norm2")(x)
        return x + GatedConvFFN(d, dtype=self.dtype, name="ffn")(y)


class SeemoRe(nn.Module):
    scale: int = 4
    in_chans: int = 3
    num_experts: int = 3
    num_layers: int = 6
    embedding_dim: int = 36
    img_range: float = 1.0
    use_shuffle: bool = True
    global_kernel_size: int = 11
    recursive: int = 2
    lr_space: str = "exp"
    topk: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        d = self.embedding_dim
        feat = Conv2d(d, 3, dtype=self.dtype, name="conv_1")(x)
        y = feat
        for li in range(self.num_layers):
            y = RME(d, self.num_experts, self.topk, self.lr_space, self.recursive,
                    self.use_shuffle, dtype=self.dtype, name=f"body_{li}_rme")(y)
            y = SME(d, self.global_kernel_size, dtype=self.dtype,
                    name=f"body_{li}_sme")(y)
        y = ChannelLayerNorm(d, name="norm")(y)
        y = Conv2d(d, 3, dtype=self.dtype, name="conv_2")(y) + feat
        out = Conv2d(self.in_chans * self.scale**2, 3, dtype=self.dtype,
                     name="upsampler")(y)
        return pixel_shuffle(out, self.scale).astype(jnp.float32)


def seemore_t(scale: int = 4, **kwargs) -> SeemoRe:
    return SeemoRe(scale=scale, **kwargs)


SPANDREL_REGISTRY.register(seemore_t, name="seemore_t")
