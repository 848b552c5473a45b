"""Post-training BatchNorm recalibration.

Archs using `BatchNormNoStats` (dat/eimn/elan/emt/sebica —
archs/dat_arch.py:29) keep running statistics as plain params: converted
torch checkpoints fill them, but from-scratch training leaves them at the
identity (0 mean / 1 var), so eval-mode forwards normalize with the wrong
statistics. The torch reference never hits this because `nn.BatchNorm2d`
updates running stats as a training side effect; the TPU-native design keeps
the train step purely functional instead and refreshes statistics here in a
single deterministic pass (the standard BN re-estimation recipe: average the
per-batch statistics over calibration batches; variance stored unbiased, as
torch does).

Usage after (or during) training:

    new_params = recalibrate_bn(model.net_g, {"params": params}, batches)

or, on a live trainer, ``SRModel.recalibrate_bn(dataloader, num_batches)``.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import jax
import jax.numpy as jnp


def _collect_paths(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    """Flatten a nested-dict variable tree to {path_tuple: leaf}."""
    out: dict[tuple, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_collect_paths(v, (*prefix, k)))
    else:
        out[prefix] = tree
    return out


def recalibrate_bn(
    module,
    variables: dict[str, Any],
    batches: Iterable[Any],
    apply_kwargs: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Return ``variables`` with every BatchNormNoStats mean/var param
    replaced by statistics averaged over ``batches``.

    ``batches`` yields model inputs (arrays, or tuples of positional args).
    The model runs in train mode with the ``bn_calib`` sow collection
    mutable; each BN emits its per-batch mean and unbiased variance, which
    are averaged across batches and written back into the corresponding
    ``params`` entries. Raises if the module contains no BatchNormNoStats.
    """
    apply_kwargs = dict(apply_kwargs or {})
    apply_kwargs.setdefault("train", True)

    @jax.jit
    def stats_fn(args):
        args = args if isinstance(args, (tuple, list)) else (args,)
        _, aux = module.apply(
            variables, *args, mutable=["bn_calib"], **apply_kwargs
        )
        return aux.get("bn_calib", {})

    sums: dict[tuple, jnp.ndarray] | None = None
    count = 0
    for batch in batches:
        flat = _collect_paths(stats_fn(batch))
        # sow stores tuples; a BN applied k times per forward (shared module)
        # contributes the average of its k call sites
        flat = {p: jnp.mean(jnp.stack(v), axis=0) for p, v in flat.items()}
        sums = flat if sums is None else {p: sums[p] + v for p, v in flat.items()}
        count += 1
    if sums is None or not sums:
        raise ValueError(
            "recalibrate_bn: no calibration batches or no BatchNormNoStats "
            "modules in the network"
        )

    new_vars = jax.tree.map(lambda x: x, variables)  # shallow-safe copy
    params = new_vars["params"]
    for path, total in sums.items():
        # path = (..., 'mean'|'var'); the matching param lives at the same
        # module path under 'params'
        node = params
        for k in path[:-1]:
            node = node[k]
        if path[-1] not in node:
            raise KeyError(f"bn_calib path {path} has no matching param")
        node[path[-1]] = (total / count).astype(node[path[-1]].dtype)
    return new_vars
