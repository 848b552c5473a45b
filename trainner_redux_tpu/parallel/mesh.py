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


def param_sharding_rule(mesh: Mesh, min_shard_elems: int = 1 << 16):
    """Sharding rule for parameter trees on meshes with a 'tensor' axis.

    Large kernels shard their output-channel (last) dimension over 'tensor'
    (the dimension optax updates elementwise, so optimizer state follows);
    small params stay replicated. On a pure-data mesh everything replicates.
    Returns fn(param) -> NamedSharding.
    """
    if TENSOR_AXIS not in mesh.axis_names:
        rep = NamedSharding(mesh, P())
        return lambda p: rep

    tsize = mesh.shape[TENSOR_AXIS]
    rep = NamedSharding(mesh, P())

    def rule(p) -> NamedSharding:
        shape = getattr(p, "shape", ())
        if (
            len(shape) >= 1
            and int(np.prod(shape)) >= min_shard_elems
            and shape[-1] % tsize == 0
        ):
            spec = [None] * (len(shape) - 1) + [TENSOR_AXIS]
            return NamedSharding(mesh, P(*spec))
        return rep

    return rule


def shard_params(mesh: Mesh, tree: Any, min_shard_elems: int = 1 << 16) -> Any:
    """device_put a param tree under the tensor-sharding rule."""
    rule = param_sharding_rule(mesh, min_shard_elems)
    return jax.tree.map(lambda p: jax.device_put(p, rule(p)), tree)
