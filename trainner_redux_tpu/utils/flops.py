"""Analytic FLOP and HBM-traffic accounting for a jitted step (VERDICT r2 #2).

XLA's ``cost_analysis()`` is blind to Pallas custom calls, so the MFU it
implies cannot steer kernel work. This module counts FLOPs *analytically* by
walking the step's jaxpr: every ``dot_general`` and ``conv_general_dilated``
is counted from its shapes (2 FLOPs per MAC), inner jaxprs (scan / while /
cond / pjit / remat / custom_vjp) are recursed with the right multipliers,
and ``pallas_call`` primitives are counted by a per-kernel model that counts
only USEFUL MACs (e.g. the window-attention kernel's on-diagonal attention
blocks, not the off-diagonal waste its MXU tiling issues).

The analogue on the reference side is the per-arch speed/VRAM tables of
/root/reference/docs/source/benchmarks.md; here the count feeds
``bench.py``'s ``mfu_analytic`` so "fast" is provable, not inferred.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np


def _prod(xs) -> int:
    out = 1
    for x in xs:
        out *= int(x)
    return out


def _dot_flops(eqn) -> float:
    (contract, batch_dims) = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = contract, batch_dims
    lhs = eqn.invars[0].aval.shape
    rhs = eqn.invars[1].aval.shape
    b = _prod(lhs[d] for d in lb)
    k = _prod(lhs[d] for d in lc)
    m = _prod(lhs[d] for d in range(len(lhs)) if d not in set(lb) | set(lc))
    n = _prod(rhs[d] for d in range(len(rhs)) if d not in set(rb) | set(rc))
    return 2.0 * b * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval.shape
    rhs = eqn.invars[1].aval.shape  # kernel
    dn = eqn.params["dimension_numbers"]
    groups = int(eqn.params.get("feature_group_count", 1))
    out_spatial = _prod(out[d] for d in dn.out_spec[2:])
    batch = out[dn.out_spec[0]]
    c_out = out[dn.out_spec[1]]
    c_in = rhs[dn.rhs_spec[1]]  # per-group input channels
    k_spatial = _prod(rhs[d] for d in dn.rhs_spec[2:])
    del groups  # c_in is already per-group in the kernel shape
    return 2.0 * batch * out_spatial * c_out * c_in * k_spatial


# Stable kernel names threaded through pl.pallas_call(name=...) — the
# PRIMARY discriminator (ADVICE r4: shape-signature matching could mistake a
# future kernel for the fused attention one). Maps name -> (kind, is_bwd,
# x_operand_index, key_operand_index) where the key operand is the bias
# table (attn/mhsa) or w1 (mlp); operand order is fixed by our call sites.
_PALLAS_KERNELS = {
    "fused_window_mhsa_fwd": ("mhsa", False, 0, 1),
    "fused_window_mhsa_bwd": ("mhsa", True, 0, 1),
    "fused_attn_block_fwd": ("attn", False, 0, 7),
    "fused_attn_block_bwd": ("attn", True, 0, 7),
    # train variants (saved-P backward): fwd issues the same products as
    # the recompute fwd; bwd runs 4 attention products per unit, not 7
    "fused_attn_block_train_fwd": ("attn", False, 0, 7),
    "fused_attn_block_train_bwd": ("attn_saved", True, 0, 8),
    "fused_ln_mlp_fwd": ("mlp", False, 0, 3),
    "fused_ln_mlp_bwd": ("mlp", True, 0, 3),
    # SwinV2 post-norm variants (fused_block_v2.py): cosine attention has
    # the same product structure as the pre-norm kernels; the post-norm MLP
    # matches the pre-norm MLP counts
    "fused_cos_attn_block_fwd": ("attn", False, 0, 8),
    "fused_cos_attn_block_bwd": ("attn", True, 0, 8),
    "fused_postnorm_mlp_fwd": ("mlp", False, 0, 1),
    "fused_postnorm_mlp_bwd": ("mlp", True, 0, 1),
    # whole-block train kernel (attn + mlp in one call): key operand is the
    # bias table (fwd) / saved P (bwd); the (C, hidden) fc1 weight sits at
    # operand 10 (fwd) / 9 (bwd) — handled specially in _pallas_parse
    "fused_swin_block_train_fwd": ("swin_block", False, 0, 7),
    "fused_swin_block_train_bwd": ("swin_block_saved", True, 0, 15),
}


def _pallas_parse(eqn) -> tuple | None:
    """Recognize this repo's Pallas kernels, by stable name when present
    (every in-repo pallas_call passes name=), else by operand-shape
    structure. Three kinds, discriminated by operand signatures:

      'mhsa'  ops/pallas/window_attention.fused_window_mhsa —
              (qkv (B,H,W,3C), bias (K,nh,n,n)[, dout (B,H,W,C)])
      'attn'  ops/pallas/fused_block.fused_attn_block —
              (x (B,H,W,C), ln g/be (1,C), wq (C,3C), bq (1,3C), wp (C,C),
               bp (1,C), bias (K,nh,n,n), s (B,1)[, dout (B,H,W,C)])
      'mlp'   ops/pallas/fused_block.fused_ln_mlp —
              (x (B,H,W,C), ln g/be (1,C), w1 (C,h), b1 (1,h), w2 (h,C),
               b2 (1,C), s (B,1)[, dout (B,H,W,C)])

    Returns (kind, x_shape, weight_dims, bias_shape_or_None, is_bwd) or None.
    """
    name = eqn.params.get("name") or ""
    if name in _PALLAS_KERNELS:
        kind, is_bwd, xi, ki = _PALLAS_KERNELS[name]
        x = tuple(eqn.invars[xi].aval.shape)
        key = tuple(eqn.invars[ki].aval.shape)
        if kind == "mhsa":
            return kind, x, (x[-1] // 3, x[-1]), key, is_bwd
        if kind == "attn":
            return kind, x, (x[-1], 3 * x[-1]), key, is_bwd
        if kind == "attn_saved":
            # key operand is the saved P (b, nwh, nww, nh, n, n): expose a
            # bias-shaped (1, nh, n, n) tuple for the product counter
            return kind, x, (x[-1], 3 * x[-1]), (1,) + key[3:], is_bwd
        if kind == "swin_block":
            hid = eqn.invars[10].aval.shape[1]
            return kind, x, (x[-1], hid), key, is_bwd
        if kind == "swin_block_saved":
            hid = eqn.invars[9].aval.shape[1]
            return kind, x, (x[-1], hid), (1,) + key[3:], is_bwd
        return kind, x, (key[0], key[1]), None, is_bwd
    if name == "diffjpeg_dct":
        return "jpeg", tuple(eqn.invars[2].aval.shape), (64, 64), None, False
    if name:
        return None  # a named foreign kernel: never structurally matched
    shapes = [tuple(v.aval.shape) for v in eqn.invars if hasattr(v, "aval")]
    four_d = [s for s in shapes if len(s) == 4]
    two_d = [s for s in shapes if len(s) == 2]

    def _is_bias(s):
        return s[-1] == s[-2] and math.isqrt(s[-1]) ** 2 == s[-1] and s[-1] > 4

    def _aligned(x, bias):
        ws = math.isqrt(bias[-1])
        return x[1] % ws == 0 and x[2] % ws == 0

    # an x that is also square-shaped can masquerade as a bias table, so try
    # every (bias, x) assignment and keep the first internally-consistent
    # one; a real bias table is unique among the 4D operands while x shares
    # its shape with dout in the backward, so duplicated shapes can't be bias
    bias_cands = [
        s for s in four_d if _is_bias(s) and four_d.count(s) == 1
    ] + [None]
    for bias in bias_cands:
        for x in four_d:
            if x is bias or x[1] <= 1:
                continue
            c_last = x[-1]
            n_x = sum(1 for s in four_d if s == x)
            # fused_attn_block: weights (C, 3C) and (C, C) present
            if (
                bias is not None
                and (c_last, 3 * c_last) in two_d
                and (c_last, c_last) in two_d
                and c_last % bias[1] == 0
                and _aligned(x, bias)
            ):
                return "attn", x, (c_last, 3 * c_last), bias, n_x >= 2
            # fused_ln_mlp: a (C, h)/(h, C) weight pair, no bias table
            wpair = next(
                (
                    (c_last, s[1])
                    for s in two_d
                    if s[0] == c_last
                    and s[1] != c_last
                    and (s[1], c_last) in two_d
                ),
                None,
            )
            if bias is None and wpair is not None:
                return "mlp", x, wpair, None, n_x >= 2
            # bare window-MHSA: qkv carries 3C channels
            if (
                bias is not None
                and c_last % 3 == 0
                and (c_last // 3) % bias[1] == 0
                and _aligned(x, bias)
                and not two_d
            ):
                is_bwd = any(
                    s
                    for s in four_d
                    if s not in (x, bias) and s[-1] == c_last // 3
                )
                return "mhsa", x, (c_last // 3, c_last), bias, is_bwd
    return None


def _warn_unrecognized_pallas(eqn) -> None:
    """The analytic counters silently returning 0 for a new kernel would
    make mfu_analytic/hbm quietly a lower bound (ADVICE r3); warn once."""
    import warnings

    shapes = [tuple(getattr(v, "aval", None) and v.aval.shape or ())
              for v in eqn.invars]
    warnings.warn(
        f"flops: unrecognized pallas_call (operand shapes {shapes}); analytic"
        " FLOP/byte counts are a lower bound until a model is added",
        stacklevel=2,
    )


def _attn_products_flops(x, bias) -> float:
    """FLOPs of ONE n x n x hd window-attention product (e.g. q @ k^T)
    summed over batch/windows/heads: 2 * B * nh * n_windows * n^2 * hd.
    n_windows = H*W/n holds for square AND rectangular windows."""
    b, h, w, c = x[0], x[1], x[2], x[3]
    n, nh = bias[-1], bias[1]
    hd = c // nh
    n_windows = (h * w) // n
    return 2.0 * b * nh * n_windows * n * n * hd


def _pallas_flops(eqn) -> float:
    """Useful MACs actually issued by the recognized kernels (off-diagonal
    MXU tile waste is deliberately NOT counted — it is overhead, not work).

    Counting P = one n^2*hd attention product over all windows/heads and
    T = B*H*W tokens (kernel code: ops/pallas/window_attention.py,
    ops/pallas/fused_block.py):
      mhsa fwd = 2P (S, PV);             bwd = 5P (S recompute, dV/dP/dQ/dK)
      attn fwd = 2P + qkv/proj matmuls (8*T*C^2);
           bwd = 7P (2 fwd-recompute + 5) + 22*T*C^2
                 (qkv recompute + dWq + dy at 3C, dWp + datt at C)
      mlp  fwd = 4*T*C*h (fc1, fc2);     bwd = 12*T*C*h (2 recompute + 4 grad)
    """
    parsed = _pallas_parse(eqn)
    if parsed is None:
        _warn_unrecognized_pallas(eqn)
        return 0.0
    kind, x, wdims, bias, is_bwd = parsed
    if kind == "jpeg":
        # DCT + IDCT: two 64x64 matmuls per 8x8 block row (ops/pallas/
        # jpeg_kernel.py cost_estimate)
        return 2.0 * float(x[0] * x[1]) * 64.0 * 64.0 * 2.0
    t = float(x[0] * x[1] * x[2])
    if kind == "mhsa":
        c = wdims[0]
        qkv = (x[0], x[1], x[2], c)
        p = _attn_products_flops(qkv, bias)
        return p * (5.0 if is_bwd else 2.0)
    if kind == "attn":
        c = x[3]
        p = _attn_products_flops(x, bias)
        if is_bwd:
            return 7.0 * p + 22.0 * t * c * c
        return 2.0 * p + 8.0 * t * c * c
    if kind == "attn_saved":
        # saved-P backward: dV, dP, dQ, dK only (no S/PV recompute)
        c = x[3]
        p = _attn_products_flops(x, bias)
        return 4.0 * p + 22.0 * t * c * c
    if kind in ("swin_block", "swin_block_saved"):
        # attn half + mlp half in one kernel; wdims = (C, hidden)
        c, hidden = wdims
        p = _attn_products_flops(x, bias)
        if kind == "swin_block":
            return 2.0 * p + 8.0 * t * c * c + 4.0 * t * c * hidden
        return 4.0 * p + 22.0 * t * c * c + 12.0 * t * c * hidden
    # mlp
    c, hidden = wdims
    return t * c * hidden * (12.0 if is_bwd else 4.0)


def _aval_bytes(v) -> float:
    aval = getattr(v, "aval", None)
    if aval is None or not hasattr(aval, "shape"):
        return 0.0
    return float(_prod(aval.shape)) * np.dtype(aval.dtype).itemsize


def _pallas_bytes(eqn) -> float:
    """Analytic HBM traffic of a recognized pallas_call: operands + results,
    each streamed exactly once (the window-MHSA kernels use non-overlapping
    row strips; the bias table and the dbias accumulator are never-moving
    VMEM-resident blocks, so they cost one read / one write). XLA's own
    cost analysis reports 0 bytes for custom calls, so this is additive
    (VERDICT r3 #6)."""
    if _pallas_parse(eqn) is None:
        return 0.0
    return sum(_aval_bytes(v) for v in eqn.invars) + sum(
        _aval_bytes(v) for v in eqn.outvars
    )


def _walk(jaxpr, leaf_fn) -> float:
    """Sum ``leaf_fn(eqn)`` over a (Closed)Jaxpr, recursing inner jaxprs
    with the right multipliers (scan length; while assumed 1 trip; cond =
    max branch)."""
    if hasattr(jaxpr, "jaxpr"):
        jaxpr = jaxpr.jaxpr
    total = 0.0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "pallas_call":
            # leaf (its params carry the KERNEL jaxpr, whose dots include
            # MXU tile waste — the leaf models count useful work instead)
            total += leaf_fn(eqn)
        elif prim == "scan":
            total += _walk(eqn.params["jaxpr"], leaf_fn) * int(
                eqn.params["length"]
            )
        elif prim == "while":
            # trip count unknowable statically; assume 1 (the only while in
            # the train step is orbax-free; loud if that changes)
            total += _walk(eqn.params["body_jaxpr"], leaf_fn)
        elif prim == "cond":
            total += max(
                (_walk(b, leaf_fn) for b in eqn.params["branches"]), default=0.0
            )
        else:
            inner = False
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                if key in eqn.params:
                    total += _walk(eqn.params[key], leaf_fn)
                    inner = True
                    break
            if not inner and "branches" in eqn.params:
                total += max(
                    (_walk(b, leaf_fn) for b in eqn.params["branches"]),
                    default=0.0,
                )
            elif not inner:
                total += leaf_fn(eqn)
    return total


def _flops_leaf(eqn) -> float:
    prim = eqn.primitive.name
    if prim == "dot_general":
        return _dot_flops(eqn)
    if prim == "conv_general_dilated":
        return _conv_flops(eqn)
    if prim == "pallas_call":
        return _pallas_flops(eqn)
    return 0.0


def jaxpr_flops(jaxpr) -> float:
    """Total analytic FLOPs of a (Closed)Jaxpr, recursing inner jaxprs."""
    return _walk(jaxpr, _flops_leaf)


def jaxpr_pallas_bytes(jaxpr) -> float:
    """Analytic HBM bytes of all recognized pallas_calls in a jaxpr (XLA's
    cost analysis is blind to them; add this to its 'bytes accessed')."""
    return _walk(
        jaxpr,
        lambda e: _pallas_bytes(e) if e.primitive.name == "pallas_call" else 0.0,
    )


def step_flops(fn, *args, **kwargs) -> float:
    """Analytic FLOPs of one call of ``fn(*args)`` (e.g. the train step)."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_flops(closed)


def step_pallas_bytes(fn, *args, **kwargs) -> float:
    """Analytic Pallas HBM bytes of one call of ``fn(*args)``."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return jaxpr_pallas_bytes(closed)


# Public per-chip peaks (spec sheets): (dense bf16 FLOP/s, HBM bytes/s).
PEAKS: dict[str, tuple[float, float]] = {
    "TPU v6 lite": (918e12, 1640e9),
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v5": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
}


def device_peaks() -> tuple[float, float]:
    kind = jax.devices()[0].device_kind
    for prefix in sorted(PEAKS, key=len, reverse=True):
        if kind.startswith(prefix):
            return PEAKS[prefix]
    return (197e12, 819e9)


def xla_cost(compiled) -> dict[str, float]:
    """flops + bytes accessed from XLA's own cost analysis (0.0 if opaque)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {
            "flops": float(ca.get("flops", 0.0)),
            "bytes": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}


__all__ = ["jaxpr_flops", "step_flops", "device_peaks", "xla_cost", "PEAKS"]
