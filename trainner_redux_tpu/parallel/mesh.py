"""Device mesh construction and sharding helpers.

All parallelism in this framework is expressed as shardings over a
`jax.sharding.Mesh`; XLA's SPMD partitioner emits the collectives (psum for
grad reduction over ICI, all-gathers where needed). This replaces the
reference's DDP/NCCL machinery (/root/reference/traiNNer/utils/dist_util.py,
base_model.py:230-236) with zero hand-written communication.

Axes:
- ``data``: batch-dimension data parallelism (the reference's only strategy).
- ``tensor``: optional param/activation sharding for very large models
  (no reference equivalent; off by default).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
TENSOR_AXIS = "tensor"


def make_mesh(
    mesh_spec: dict[str, int] | None = None, devices: list[Any] | None = None
) -> Mesh:
    """Build a Mesh from {'axis': size} spec; -1 means "all remaining devices".

    Default (None): all devices on the data axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if not mesh_spec:
        mesh_spec = {DATA_AXIS: n}
    axes = list(mesh_spec.keys())
    sizes = list(mesh_spec.values())
    n_fixed = int(np.prod([s for s in sizes if s > 0])) if sizes else 1
    sizes = [s if s > 0 else max(1, n // max(1, n_fixed)) for s in sizes]
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"mesh {dict(zip(axes, sizes))} needs {total} devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, axis_names=tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis_index: int = 0) -> NamedSharding:
    """Shard the batch dimension over the data axis, replicate the rest."""
    spec = [None] * (batch_axis_index + 1)
    spec[batch_axis_index] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: Any, batch_axis_index: int = 0) -> Any:
    """Device-put a pytree of host arrays with the batch dim sharded on 'data'."""
    sharding = batch_sharding(mesh, batch_axis_index)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host slice of the global batch (multi-host data loading)."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by process count {n_proc}"
        )
    return global_batch_size // n_proc
