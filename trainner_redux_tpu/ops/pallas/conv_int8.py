"""Fused W8A8 3x3 convolution for SR inference (Pallas/TPU).

Why a hand-written kernel: SR networks run 3x3 convs at small channel
counts (32-64), where XLA's native conv leaves the 128x128 MXU mostly idle
and a separate quantize/dequantize elementwise pass around each conv doubles
HBM traffic — measured end-to-end, naive int8 (`lax.conv` + XLA epilogues)
was SLOWER than bf16 despite the int8 MXU mode being ~3.6x faster per conv.

Design notes (constraints discovered on-chip, v5e Mosaic):
- lane-dim (last axis) slices must be 128-aligned, which rules out both
  lane-packed im2col patches and halo DMA of (rows, W, C<128) slices; the
  whole quantized image therefore sits in VMEM (int8 makes it fit: 480x480x48
  is ~11 MB) and the grid runs over output row tiles only.
- dim 0 of a 3D buffer is untiled, so dynamic row offsets (`pl.ds`) and the
  +-1-pixel tap shifts (static sublane offsets) are legal there.
- each of the 9 taps is copied to a contiguous scratch, reshaped (legal
  collapse of full trailing dims) to (TILE_R*W, C) and MXU-multiplied
  against that tap's (C_in, C_out) int8 weight slice, accumulating in int32.
- dequant (per-out-channel scale), bias and the activation run in the same
  kernel; the int32 accumulator never touches HBM.

Status: bit-exact vs the emulated int8 reference (interpret-mode test in
tests/test_ops/test_quant.py and on-chip). Performance is UNVALIDATED: the
only available "TPU" during development was a remote AOT terminal whose
block_until_ready acknowledges dispatch before execution finishes, so
relative kernel-vs-XLA timings measured there (1.7 vs 1.1 ms at
480x480x48->48) are dispatch-floor artifacts, not chip truth — re-measure
with `scripts/benchmarking/benchmark_archs.py --true-sync` on real
hardware before drawing conclusions. Until then the kernel is NOT the
default quant path (ops/quant.py routes through XLA's int8 conv). Known
structural limits to revisit: nine sublane-misaligned tap copies and small
(K=N=48) MXU dots; a lane-packed im2col needs Mosaic sub-128 lane slicing
or int8 sublane rotates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 16  # output rows per grid program (VMEM-bounded)

# full int8 image + per-tap scratch + f32 out block must fit VMEM (~16 MB)
VMEM_BUDGET = 13 * 1024 * 1024


def _kernel(x_ref, w_ref, sc_ref, b_ref, o_ref, patch_ref, *, act: str,
            slope: float, w: int, c_in: int):
    i = pl.program_id(0)
    r0 = i * TILE_R
    scale = sc_ref[:].astype(jnp.float32)  # (C_out,) = s_in * w_scale
    bias = b_ref[:].astype(jnp.float32)

    acc = jnp.zeros((TILE_R * w, w_ref.shape[-1]), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            patch_ref[:] = x_ref[pl.ds(r0 + dy, TILE_R), dx : dx + w, :]
            acc = acc + jnp.dot(
                patch_ref[:].reshape(TILE_R * w, c_in),
                w_ref[dy * 3 + dx],
                preferred_element_type=jnp.int32,
            )
    y = acc.astype(jnp.float32) * scale + bias
    if act == "lrelu":
        y = jnp.where(y >= 0, y, y * slope)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[:] = y.reshape(TILE_R, w, -1).astype(o_ref.dtype)


def fits_vmem(h: int, w: int, c_in: int, c_out: int) -> bool:
    img = (h + 2 + TILE_R) * (w + 2) * c_in          # int8 image
    patch = TILE_R * w * c_in                        # int8 tap scratch
    out = TILE_R * w * c_out * 4                     # f32 out block
    accs = TILE_R * w * c_out * 4                    # int32 accumulator
    return img + patch + 2 * (out + accs) < VMEM_BUDGET


@functools.partial(
    jax.jit,
    static_argnames=("out_features", "act", "slope", "out_dtype", "interpret"),
)
def conv3x3_w8a8(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    inv_s_in: jnp.ndarray,
    out_features: int,
    act: str = "linear",
    slope: float = 0.01,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C) float; w_packed: (9, C, C_out) int8;
    scale = s_in * per-out-channel weight scale, (C_out,) f32;
    bias: (C_out,) f32; inv_s_in: scalar 1/s_in.
    Returns (B, H, W, C_out) as out_dtype."""
    b, h, w, c = x.shape
    n_tiles = pl.cdiv(h, TILE_R)
    pad_h = n_tiles * TILE_R - h
    # quantize once in XLA (a single fused elementwise pass); zero padding is
    # exact in the symmetric int8 domain
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv_s_in), -127, 127)
    xq = jnp.pad(xq.astype(jnp.int8), ((0, 0), (1, 1 + pad_h), (1, 1), (0, 0)))

    kern = functools.partial(_kernel, act=act, slope=slope, w=w, c_in=c)
    call = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles * TILE_R, w, out_features), out_dtype
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full quantized image
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (9, C, C_out) int8
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dequant scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
        ],
        out_specs=pl.BlockSpec(
            (TILE_R, w, out_features), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((TILE_R, w, c), jnp.int8)],
        interpret=interpret,
    )
    return jax.vmap(lambda im: call(im, w_packed, scale, bias)[:h])(xq)


def pack_weights(w_hwio: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C_in, C_out) -> (9, C_in, C_out): tap-major layout matching the
    kernel's per-tap accumulation order (dy*3+dx)."""
    k0, k1, ci, co = w_hwio.shape
    assert (k0, k1) == (3, 3)
    return w_hwio.reshape(9, ci, co)
