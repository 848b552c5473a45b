"""BaseModel: device mesh, checkpointing, optimizer plumbing, validation dispatch.

TPU-native re-design of /root/reference/traiNNer/models/base_model.py (1099
LoC). The torch version manages device placement, DDP wrapping, GradScalers,
and per-iteration LR stepping imperatively; here all of that collapses into:

- a `jax.sharding.Mesh` + NamedShardings (DDP -> XLA SPMD over ICI/DCN),
- fp32 params + bf16 compute policy (AMP/GradScaler -> dtype policy),
- optax transforms whose LR schedule is a pure function of the step
  (scheduler.step() -> schedule(step) traced inside the jit),
- orbax checkpoints for training state + safetensors import/export for
  ecosystem interop (chaiNNer/OpenModelDB).
"""

from __future__ import annotations

import os
from os import path as osp
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.parallel.mesh import (
    TENSOR_AXIS,
    make_mesh,
    replicate,
    shard_batch,
    shard_params,
)
from trainner_redux_tpu.utils.dist_util import master_only
from trainner_redux_tpu.utils.logger import get_root_logger
from trainner_redux_tpu.utils.redux_options import ReduxOptions


class BaseModel:
    def __init__(self, opt: ReduxOptions) -> None:
        self.opt = opt
        self.is_train = bool(opt.is_train)
        self.logger = get_root_logger()
        self.mesh = make_mesh(opt.mesh)
        # compute_dtype is the TPU-native AMP policy knob (default bf16);
        # the reference's use_amp flag (reference redux_options.py:464, fp16
        # or bf16 autocast) also forces the low-precision path so imported
        # configs behave as written — on TPU both map to bf16
        self.compute_dtype = (
            jnp.bfloat16
            if opt.compute_dtype == "bfloat16" or opt.use_amp
            else jnp.float32
        )
        self.log_dict: dict[str, float] = {}
        self.best_metric_results: dict[str, Any] = {}

    # ----------------------------- helpers --------------------------------

    def shard_batch(self, batch: dict[str, Any]) -> dict[str, Any]:
        arrays = {k: v for k, v in batch.items() if isinstance(v, (np.ndarray, jax.Array))}
        rest = {k: v for k, v in batch.items() if k not in arrays}
        return {**shard_batch(self.mesh, arrays), **rest}

    def replicate(self, tree: Any) -> Any:
        # on dp-only meshes: replicate; with a 'tensor' axis: shard large
        # kernels' output channels over it (optimizer state follows via jit)
        if TENSOR_AXIS in self.mesh.axis_names:
            return shard_params(self.mesh, tree)
        return replicate(self.mesh, tree)

    @staticmethod
    def param_count(params: Any) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    # --------------------------- checkpointing -----------------------------

    def _orbax(self):
        import orbax.checkpoint as ocp

        return ocp

    @master_only
    def save_training_state(self, state, epoch: int, current_iter: int) -> None:
        """Save the full train state tree for exact resume
        (parity: reference base_model.py:713-793)."""
        assert self.opt.path.training_states is not None
        ocp = self._orbax()
        path = osp.join(
            osp.abspath(self.opt.path.training_states), f"{current_iter}.state"
        )
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, jax.device_get(state), force=True)
        # sidecar metadata
        import json

        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "iter": current_iter}, f)

    def load_training_state(self, state_template, path: str):
        ocp = self._orbax()
        with ocp.StandardCheckpointer() as ckptr:
            target = jax.device_get(state_template)
            restored = ckptr.restore(osp.abspath(path), target)
        import json

        meta_path = path + ".meta.json"
        meta = {"epoch": 0, "iter": 0}
        if osp.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        return self.replicate(restored), meta

    @staticmethod
    def flatten_params(params: Any, prefix: str = "") -> dict[str, np.ndarray]:
        """Flatten a nested param dict to 'a.b.c' -> array."""
        flat: dict[str, np.ndarray] = {}

        def rec(node: Any, path: str) -> None:
            if isinstance(node, dict):
                for k, v in node.items():
                    rec(v, f"{path}.{k}" if path else str(k))
            else:
                # jax.device_get can expose XLA's device layout as a
                # TRANSPOSED-STRIDE numpy view; safetensors' save_file
                # serializes the raw buffer without honoring strides, which
                # silently scrambles such tensors (caught by the quality-run
                # checkpoint exploding on reload). Force C order.
                flat[path] = np.ascontiguousarray(jax.device_get(node))

        rec(params, prefix)
        return flat

    @staticmethod
    def unflatten_params(flat: dict[str, np.ndarray]) -> dict[str, Any]:
        tree: dict[str, Any] = {}
        for key, value in flat.items():
            parts = key.split(".")
            node = tree
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
        return tree

    @master_only
    def save_network_safetensors(
        self, params: Any, save_path: str, metadata: dict[str, str] | None = None
    ) -> None:
        """Save a parameter tree as safetensors with JSON metadata in the
        header (parity: reference base_model.py:437-457)."""
        from safetensors.numpy import save_file

        os.makedirs(osp.dirname(save_path), exist_ok=True)
        flat = self.flatten_params(params)
        for attempt in range(3):  # retry like reference base_model.py:444-478
            try:
                save_file(flat, save_path, metadata=metadata or {})
                return
            except OSError as e:
                if attempt == 2:
                    raise
                self.logger.warning(f"save retry {attempt + 1} after: {e}")

    def load_network_safetensors(self, save_path: str) -> dict[str, Any]:
        from safetensors.numpy import load_file

        return self.unflatten_params(load_file(save_path))

    # ------------------------------ metrics --------------------------------

    def _init_best_metric_results(self, dataset_name: str, metric_opts: dict) -> None:
        if dataset_name in self.best_metric_results:
            return
        record = {}
        for metric, content in metric_opts.items():
            better = content.get("better", "higher")
            init_val = float("-inf") if better == "higher" else float("inf")
            record[metric] = {"better": better, "val": init_val, "iter": -1}
        self.best_metric_results[dataset_name] = record

    def _update_best_metric_result(
        self, dataset_name: str, metric: str, val: float, current_iter: int
    ) -> None:
        rec = self.best_metric_results[dataset_name][metric]
        if (rec["better"] == "higher" and val >= rec["val"]) or (
            rec["better"] == "lower" and val <= rec["val"]
        ):
            rec["val"] = val
            rec["iter"] = current_iter

    # ---------------------------- interfaces -------------------------------

    def feed_data(self, data: dict[str, Any]) -> None:
        raise NotImplementedError

    def optimize_parameters(self, current_iter: int) -> None:
        raise NotImplementedError

    def save(self, epoch: int, current_iter: int) -> None:
        raise NotImplementedError

    def validation(
        self, dataloader, current_iter: int, tb_logger=None, save_img: bool = False
    ) -> None:
        self.nondist_validation(dataloader, current_iter, tb_logger, save_img)

    def nondist_validation(self, dataloader, current_iter, tb_logger, save_img) -> None:
        raise NotImplementedError

    def get_current_log(self) -> dict[str, float]:
        return self.log_dict
