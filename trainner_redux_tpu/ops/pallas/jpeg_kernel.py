"""Pallas TPU kernel: fused JPEG block transform.

The DiffJPEG hot path per 8x8 block is DCT -> quantize -> differentiable
round -> dequantize -> IDCT. As separate XLA ops the coefficient tensor
round-trips through HBM between the two (64,64) contractions; this kernel
keeps a tile of blocks resident in VMEM and runs both MXU matmuls plus the
elementwise quantization in one pass.

Layout: blocks (B, N, 64) where N = (H/8)*(W/8) per image and the last dim is
the flattened 8x8 block; per-sample quantization tables (B, 64). The grid is
(B, N/TILE); each program transforms TILE blocks of one sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # blocks per program: (256, 64) tiles feed the MXU cleanly


def _jpeg_core_kernel(dct_ref, idct_ref, x_ref, qtab_ref, o_ref):
    # x_ref block: (1, TILE, 64) spatial blocks; qtab_ref: (1, 64)
    dct = dct_ref[:]          # (64, 64): coeff <- spatial
    idct = idct_ref[:]        # (64, 64): spatial <- coeff
    x = x_ref[0].astype(jnp.float32)        # (TILE, 64)
    qtab = qtab_ref[0].astype(jnp.float32)  # (1, 64), broadcasts over TILE

    coeff = jnp.dot(x, dct.T, preferred_element_type=jnp.float32)
    scaled = coeff / qtab
    rounded = jnp.round(scaled)
    # differentiable rounding: round(x) + (x - round(x))^3
    q = rounded + (scaled - rounded) ** 3
    deq = q * qtab
    # idct maps coeff->spatial as spatial_k = sum_u idct[u,k] q_u
    o_ref[0] = jnp.dot(deq, idct, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def jpeg_block_transform(
    blocks: jnp.ndarray, qtabs: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """blocks (B, N, 64) fp32, qtabs (B, 64) -> transformed blocks (B, N, 64).

    N is padded to a TILE multiple internally.
    """
    from trainner_redux_tpu.utils.diffjpeg import _dct_matrix, _idct_matrix_np

    b, n, _ = blocks.shape
    n_pad = (TILE - n % TILE) % TILE
    if n_pad:
        blocks = jnp.pad(blocks, ((0, 0), (0, n_pad), (0, 0)))
    n_tiles = (n + n_pad) // TILE

    dct = jnp.asarray(_dct_matrix())
    idct = jnp.asarray(_idct_matrix_np())

    out = pl.pallas_call(
        _jpeg_core_kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((64, 64), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 64), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, TILE, 64), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, 64), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE, 64), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(blocks.shape, jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (n + n_pad) * 64 * 64 * 2,
            bytes_accessed=blocks.size * 4 * 2,
            transcendentals=0,
        ),
        name="diffjpeg_dct",
    )(dct, idct, blocks, qtabs[:, None, :])
    return out[:, :n, :]
