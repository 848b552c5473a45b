"""Spatial-sharded inference: split one image's height across the mesh.

The SR analogue of sequence/context parallelism (SURVEY.md §2.2): a single
large image is sharded along H over the mesh's data axis, each chip runs the
network on its slice plus a halo of neighbor rows exchanged over ICI with
`jax.lax.ppermute`, and the halo region is cropped from each shard's output.

Exactness argument: for a translation-invariant convolutional network whose
receptive field radius is <= `halo` input rows, every cropped output row
depends only on input rows the shard holds (its slice + halos); local-border
contamination (the network treats shard edges as image borders) reaches at
most the receptive field into the halo, which is cropped. The subtlety is
the GLOBAL top/bottom: prepending dead halo rows there would differ from the
network's own per-layer border padding (conv(0)+bias is nonzero), so edge
shards instead place their slice flush against the buffer edge — the first
shard's buffer is [slice, 2*halo from below], the last [2*halo from above,
slice], interior shards [halo above, slice, halo below] — and each crops at
an offset selected by its mesh index. The network then sees the true image
border exactly where the single-device forward does, making the result
bit-identical everywhere. Window attention with image-size-dependent masks
or any global pooling breaks the argument: use conv families
(SPAN/Compact/ESRGAN/RCAN-class) there, or batched tiled inference
(sr_model.infer_tiled).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from trainner_redux_tpu.parallel.mesh import DATA_AXIS


def spatial_sharded_apply(
    apply_fn,
    x: jnp.ndarray,
    mesh: Mesh,
    scale: int,
    halo: int = 64,
    axis: str = DATA_AXIS,
):
    """Run `apply_fn` (e.g. net.apply bound to params) on (B, H, W, C) `x`
    with H sharded over `mesh[axis]`. Returns the full (B, H*scale, W*scale,
    C') output, H-sharded across the mesh.

    `halo` must cover the network's receptive-field radius in input pixels;
    H must divide by the mesh axis size (pad beforehand otherwise)."""
    n = mesh.shape[axis]
    if n == 1:
        return apply_fn(x)
    b, h, w, c = x.shape
    if h % n:
        raise ValueError(f"H={h} must divide the {axis} axis size {n}")
    hs = h // n
    if hs < 2 * halo:
        raise ValueError(f"shard height {hs} must be >= 2*halo ({2 * halo})")

    def shard_fn(xl):
        # xl: (B, hs, W, C) local slice
        idx = jax.lax.axis_index(axis)
        # exchange 2*halo rows each way (edge shards need a double helping
        # from their single neighbor); ppermute edges deliver zeros, which
        # only ever land in buffer regions the receiving shard does not use
        top2 = jax.lax.ppermute(
            xl[:, -2 * halo :], axis, [(i, i + 1) for i in range(n - 1)]
        )
        bot2 = jax.lax.ppermute(
            xl[:, : 2 * halo], axis, [(i + 1, i) for i in range(n - 1)]
        )
        first = jnp.concatenate([xl, bot2], axis=1)
        middle = jnp.concatenate([top2[:, -halo:], xl, bot2[:, :halo]], axis=1)
        last = jnp.concatenate([top2, xl], axis=1)
        # branch 0: global top shard; 1: interior; 2: global bottom shard
        branch = (idx > 0).astype(jnp.int32) + (idx == n - 1).astype(jnp.int32)
        padded = jax.lax.switch(
            branch, [lambda: first, lambda: middle, lambda: last]
        )
        y = apply_fn(padded)
        start = branch * (halo * scale)
        return jax.lax.dynamic_slice_in_dim(y, start, hs * scale, axis=1)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=P(None, axis),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return fn(x)


def spatial_infer(model, lq, halo: int = 64):
    """Convenience wrapper over a built SRModel: spatially-sharded eval
    forward of its generator with the EMA/infer params."""
    params = model._infer_params()
    apply_fn = partial(model._apply_raw, params)
    return spatial_sharded_apply(
        apply_fn, jnp.asarray(lq), model.mesh, model.scale, halo=halo
    )
