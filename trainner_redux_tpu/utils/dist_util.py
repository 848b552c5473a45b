"""Distributed helpers, JAX-native.

The reference initializes NCCL process groups per GPU
(/root/reference/traiNNer/utils/dist_util.py:13-60). On TPU, a single Python
process drives all local chips, so "rank" here is the *host* (process) index:
multi-host pods use `jax.distributed.initialize`, and all cross-chip
communication is emitted by XLA from sharding annotations (ICI within a slice,
DCN across slices) — there is no hand-written communication layer.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable
from typing import Any

_initialized = False


def init_dist(launcher: str = "jax", **kwargs: Any) -> None:
    """Initialize multi-host JAX. Safe to call once; no-op on a single host.

    launcher:
      - "jax": use jax.distributed.initialize (reads coordinator env vars or kwargs)
      - "slurm": derive coordinator/process ids from SLURM env vars
      - "pytorch": accepted for CLI compatibility; treated like "jax"
    """
    global _initialized
    if _initialized:
        return
    import jax

    # Only the relevant jax.distributed.initialize kwargs pass through; the
    # reference's nccl-specific dist_params entries (backend/port) are ignored.
    init_kwargs: dict[str, Any] = {}
    if launcher == "slurm":
        proc_id = int(os.environ.get("SLURM_PROCID", 0))
        ntasks = int(os.environ.get("SLURM_NTASKS", 1))
        node_list = os.environ.get("SLURM_NODELIST", "localhost")
        addr = node_list.split("[")[0].split(",")[0]
        port = kwargs.get("port", 29500)
        init_kwargs = {
            "coordinator_address": f"{addr}:{port}",
            "num_processes": ntasks,
            "process_id": proc_id,
        }
        if ntasks <= 1:
            _initialized = True
            return
    elif "coordinator_address" in kwargs:
        init_kwargs = {
            k: kwargs[k]
            for k in ("coordinator_address", "num_processes", "process_id")
            if k in kwargs
        }
    else:
        # Single-host (or env-var driven cloud TPU pod) — initialize only when
        # the JAX coordination env is present.
        if os.environ.get("JAX_COORDINATOR_ADDRESS") is None and not os.environ.get(
            "TPU_WORKER_HOSTNAMES"
        ):
            _initialized = True
            return

    jax.distributed.initialize(**init_kwargs)
    _initialized = True


def get_dist_info() -> tuple[int, int]:
    """Return (process_index, process_count) — host rank, not chip rank."""
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def get_rank() -> int:
    return get_dist_info()[0]


def is_master() -> bool:
    return get_rank() == 0


def master_only(func: Callable) -> Callable:
    """Run the wrapped function only on host 0 (checkpointing, logging, ...)."""

    @functools.wraps(func)
    def wrapper(*args: Any, **kwargs: Any) -> Any:
        if is_master():
            return func(*args, **kwargs)
        return None

    return wrapper
