"""Shared wiring for the fused Pallas block kernels (ops/pallas/fused_block).

Transformer archs across the zoo share the pre-LN MLP half
`x + DropPath(fc2(gelu(fc1(LN(x)))))` with per-arch param names
(SwinIR/HAT: norm2/mlp_fc1/mlp_fc2; SRFormer/Swin2SR: norm2/fc1/fc2).
`fused_mlp_residual` applies that half as ONE Pallas kernel while declaring
a checkpoint-identical param tree through the stub modules below, so the
torch converters and saved weights are unaffected.

Reference semantics: /root/reference/traiNNer/archs/*_arch.py Mlp/FFN
chains (e.g. swinir_arch.py:139-229, hat_arch.py HAB/OCAB).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LNParams(nn.Module):
    """Declares LayerNorm-shaped params (same names/inits as nn.LayerNorm)
    for the fused-kernel paths, keeping the checkpoint tree identical."""

    dim: int

    @nn.compact
    def __call__(self):
        g = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return g, b


class DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (same names/inits) without the op."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
        else:
            b = jnp.zeros((self.features,), jnp.float32)
        return k, b


def droppath_scale(mod: nn.Module, rate: float, train: bool, batch: int):
    """Per-sample DropPath keep scale (0 or 1/keep), ones at eval/rate 0 —
    the form the fused kernels consume (equivalent to the DropPath module's
    (B,1,1,1) mask broadcast)."""
    if rate > 0.0 and train:
        keep = 1.0 - rate
        return jax.random.bernoulli(mod.make_rng("dropout"), keep, (batch,)) / keep
    return jnp.ones((batch,), jnp.float32)


def fused_mlp_residual(
    mod: nn.Module,
    x: jnp.ndarray,
    hidden: int,
    drop_path: float,
    train: bool,
    rows: int,
    dtype,
    norm_name: str = "norm2",
    fc1_name: str = "mlp_fc1",
    fc2_name: str = "mlp_fc2",
):
    """x + DropPath(fc2(gelu(fc1(LN(x))))) as one Pallas kernel, or None
    when unsupported (caller falls back to the flax chain). `rows` is the
    grid strip height (any divisor of H; archs pass their window size).
    Call from within the block module's @nn.compact __call__."""
    from trainner_redux_tpu.ops.pallas.fused_block import (
        fused_block_interpret,
        fused_ln_mlp,
        fused_mlp_supported,
    )

    b, h, w, c = x.shape
    if not fused_mlp_supported(h, w, rows, c, hidden):
        return None
    g, be = LNParams(c, name=norm_name)()
    w1, b1 = DenseParams(c, hidden, True, name=fc1_name)()
    w2, b2 = DenseParams(hidden, c, True, name=fc2_name)()
    s = droppath_scale(mod, drop_path, train, b)
    return fused_ln_mlp(
        x.astype(dtype), g, be, w1, b1, w2, b2, s, rows, 1e-5,
        fused_block_interpret(),
    )
