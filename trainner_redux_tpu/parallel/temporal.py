"""Temporal-sharded streaming video inference: split a frame sequence's
time axis across the mesh.

Sequence parallelism for video SR (the video analogue of
parallel/spatial.py): a long frame sequence is sharded along T over the
mesh's data axis, each chip exchanges `radius` boundary frames with its
neighbors over ICI (`jax.lax.ppermute`) and runs the model's STREAMING
sequence forward (archs/tscunet_arch.py: t > clip_size consumes t frames
and emits t - 2*radius frames) on its slice plus halos.

Exactness argument: the pyramid consumes exactly `radius` frames on each
side of every output frame (clip_size = 2*radius + 1), so a shard holding
its n_loc frames plus radius-frame halos computes its n_loc output frames
from exactly the frames the single-device sequence forward would use —
identical up to batched-reduction float ordering, no cropping needed (the pyramid's own shrinkage IS the
crop). Global sequence ends must be reflect-padded by the CALLER before
sharding (exactly as scripts/inference.py --video does), so edge shards
hold real frames on both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from trainner_redux_tpu.parallel.mesh import DATA_AXIS


def temporal_sharded_apply(
    apply_fn,
    x: jnp.ndarray,
    mesh: Mesh,
    radius: int,
    axis: str = DATA_AXIS,
):
    """Run a streaming video `apply_fn` on (B, T, H, W, C) `x` with T
    sharded over `mesh[axis]`. `apply_fn` must map (B, t, H, W, C) ->
    (B, t - 2*radius, Hs, Ws, C) (the sequence contract). `x` must carry
    the global reflect padding already (T = n_outputs + 2*radius), and
    T - 2*radius must divide the mesh axis size. Returns the full
    (B, T - 2*radius, Hs, Ws, C) output, T-sharded across the mesh."""
    n = mesh.shape[axis]
    if n == 1:
        return apply_fn(x)
    b, t, h, w, c = x.shape
    r = radius
    n_out = t - 2 * r
    if n_out % n:
        raise ValueError(f"output length {n_out} must divide the {axis} axis size {n}")
    if n_out // n < r:
        raise ValueError(
            f"per-shard output length {n_out // n} must be >= radius {r} "
            "(each shard exchanges its r boundary frames with one neighbor)"
        )
    # shard the OUTPUT frames evenly; each shard's input slice is its output
    # range plus r frames each side. Shard the interior (without the global
    # halos) and deliver the global edge frames to the edge shards locally.
    core = x[:, r : t - r]  # (B, n_out, ...)
    head = x[:, :r]
    tail = x[:, t - r :]

    def shard_fn(core_l, head_g, tail_g):
        # core_l: (B, n_loc, ...); head_g/tail_g: (B, r, ...) replicated
        idx = jax.lax.axis_index(axis)
        prev = jax.lax.ppermute(
            core_l[:, -r:], axis, [(i, i + 1) for i in range(n - 1)]
        )
        nxt = jax.lax.ppermute(
            core_l[:, :r], axis, [(i + 1, i) for i in range(n - 1)]
        )
        left = jnp.where((idx == 0), head_g, prev)
        right = jnp.where((idx == n - 1), tail_g, nxt)
        seq = jnp.concatenate([left, core_l, right], axis=1)
        y = apply_fn(seq)
        if y.ndim == 4:  # the archs' single-output clip contract
            y = y[:, None]
        return y

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(core, head, tail)
