"""Pallas TPU kernel: fused shifted-window multi-head self-attention.

Why this exists: profiled on a v5e chip, the XLA lowering of SwinIR-style
window attention (reference swinir_arch.py WindowAttention, torch's
einsum/permutation formulation) is bandwidth-bound, not FLOP-bound: XLA's
own cost analysis counts ~44 GB of memory traffic for one SwinIR-M batch-8
forward (~0.9 TFLOP), because window partition/reverse reshape chains, the
5D qkv transpose, and the fp32 attention maps all materialize in HBM.

A first kernel that looped windows x heads as (64, 30) x (30, 64) dots kept
everything in VMEM but starved the MXU (128x128 systolic array) with tiny
matmuls and measured ~35 ms of a 57 ms forward. This version instead
processes ONE WINDOW-ROW PER HEAD as a single block-diagonal attention:

  T = window_size * W tokens of a row-strip form Q,K,V of shape (T, hd);
  S = QK^T is ONE (T, T) MXU pass; a precomputed row bias holds the
  relative-position bias + cyclic-shift mask on the block diagonal and
  -1e9 everywhere else, so the fp32 row softmax factorizes into the exact
  per-window softmax; PV is one (T, T) x (T, hd) pass.

The block-diagonal form issues window_count x more MAC than the minimal
per-window dots (off-diagonal blocks are wasted) but runs them at near-peak
MXU utilization instead of ~10%, a large net win; S/P never leave VMEM.

Layout contract (chosen so the surrounding flax module needs NO transposes):
  qkv  (B, H, W, 3*C) — the output of one Dense over NHWC, channel groups
       [q | k | v], each C = num_heads * head_dim with heads contiguous.
       Mosaic requires block trailing dims to be 8/128-aligned or full, so
       the kernel loads full (1, ws, W, 3C) strips and slices heads on the
       lane axis in-kernel (head loop statically unrolled).
  bias (K, nh, n, n) fp32 — per-mask-kind attention bias: relative-position
       bias (+ cyclic-shift mask when shifted), n = window_size**2.
       K = 1 (unshifted: all windows share kind 0) or 4 (shifted: interior /
       right-edge / bottom-row / corner — cyclic shift masks only differ for
       windows wrapping the image edge). Expanded OUTSIDE the kernel (a
       differentiable gather) to (V, nh, T, T) row variants, V = 1 or 2
       (interior rows / bottom row), so d(bias) flows back into the
       relative_position_bias_table gather via plain autodiff.
  out  (B, H, W, C)

Grid (nwh, B), batch innermost: the per-variant row-bias block is indexed by
the row coordinate only (stays VMEM-resident across the batch sweep), and
the backward's dbias accumulator is the FULL (V, nh, T, T) array as one
never-moving output block (Pallas output accumulation requires consecutive
grid steps to map to the same block). The backward recomputes softmax from
qkv (flash-attention style — nothing besides qkv/bias is saved).

Reference semantics: /root/reference/traiNNer/archs/swinir_arch.py:77-136
(WindowAttention) and :231-266 (cyclic shift + mask).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def fused_window_mhsa_supported(
    h: int,
    w: int,
    window_size: int,
    channels: int,
    num_heads: int | None = None,
    dtype_bytes: int = 2,
) -> bool:
    """Whether the fused kernel applies: TPU backend, window-aligned spatial
    dims, and a row-strip small enough that the (T, T) attention tile, its
    per-variant row bias, and the backward's full dbias accumulator fit VMEM
    (T = window_size * w; nh * T^2 bounded). Large inference widths fall
    back to the XLA path. Respects TRAINNER_FUSED_ATTN=0 as a global off
    switch."""
    import os

    if os.environ.get("TRAINNER_FUSED_ATTN", "1") == "0":
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    if h % window_size or w % window_size:
        return False
    t = window_size * w
    nh = num_heads if num_heads else 8  # conservative when not provided
    # bwd VMEM: bias block + dbias accumulator, both (<=2, nh, T, T) fp32
    return 2 * 2 * nh * t * t * 4 <= 32 * 1024 * 1024


def shift_mask_kinds(window_size: int, shift: int) -> np.ndarray:
    """The 4 distinct cyclic-shift attention masks (kind, n, n) fp32 for a
    shifted window layer: 0 interior, 1 right-edge column, 2 bottom-edge row,
    3 bottom-right corner. Equivalent to the reference's calculate_mask
    (swinir_arch.py:240-266) evaluated per window position; windows not
    touching the wrapped edge see an all-zero mask."""
    ws, s = window_size, shift
    n = ws * ws
    # segment id along one axis after cyclic shift by -s, for an edge window:
    # the last `s` positions wrapped around from the opposite image edge
    edge_seg = np.zeros((ws,), np.int32)
    edge_seg[ws - s :] = 1
    interior_seg = np.zeros((ws,), np.int32)

    masks = np.zeros((4, n, n), np.float32)
    for kind, (row_seg, col_seg) in enumerate(
        [
            (interior_seg, interior_seg),
            (interior_seg, edge_seg),
            (edge_seg, interior_seg),
            (edge_seg, edge_seg),
        ]
    ):
        seg = (row_seg[:, None] * 2 + col_seg[None, :]).reshape(-1)  # (n,)
        diff = seg[:, None] != seg[None, :]
        masks[kind] = np.where(diff, -100.0, 0.0)
    return masks


@functools.lru_cache(maxsize=64)
def _kind_rows(nww: int, kinds: int) -> np.ndarray:
    """Per-row-variant window->kind map (V, nww): V=1 trivial when unshifted;
    shifted rows split into interior (kinds 0/1) and bottom (kinds 2/3), the
    last window of a row being the right-edge one."""
    if kinds == 1:
        return np.zeros((1, nww), np.int32)
    return np.stack(
        [
            np.where(np.arange(nww) == nww - 1, 1, 0),  # interior rows
            np.where(np.arange(nww) == nww - 1, 3, 2),  # bottom row
        ]
    ).astype(np.int32)


def _expand_row_bias(bias, ws: int, w: int) -> jnp.ndarray:
    """(K, nh, n, n) kind bias -> (V, nh, T, T) block-diagonal row bias with
    _NEG off the diagonal. Built from reshape/broadcast/where only (an
    elementwise TPU gather at this size costs more than the attention
    itself); autodiff carries d(row_bias) back onto the kind tables and from
    there to the relative_position_bias_table."""
    kinds, nh, n, _ = bias.shape
    nww = w // ws
    km = _kind_rows(nww, kinds)  # (V, nww)
    n_var = km.shape[0]
    t = ws * w
    # token t = r*W + x with x = win*ws + p  =>  axis order (r, win, p);
    # intra-window index = r*ws + p  =>  (n, n) splits to (r1, p1, r2, p2)
    b6 = bias.reshape(kinds, nh, ws, ws, ws, ws)
    sel = jnp.take(b6, jnp.asarray(km.reshape(-1)), axis=0)
    sel = sel.reshape(n_var, nww, nh, ws, ws, ws, ws)  # [v,w1,h,r1,p1,r2,p2]
    sel = sel.transpose(0, 2, 3, 1, 4, 5, 6)  # [v,h,r1,w1,p1,r2,p2]
    sel = sel[:, :, :, :, :, :, None, :]  # w2 axis (broadcast)
    eye = np.eye(nww, dtype=bool)[None, None, None, :, None, None, :, None]
    big = jnp.where(jnp.asarray(eye), sel, _NEG)
    return jnp.broadcast_to(
        big, (n_var, nh, ws, nww, ws, ws, nww, ws)
    ).reshape(n_var, nh, t, t)


def _head_qkv(x, h: int, nh: int, hd: int):
    c = nh * hd
    q = x[:, h * hd : (h + 1) * hd]
    k = x[:, c + h * hd : c + (h + 1) * hd]
    v = x[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
    return q, k, v


def _fwd_kernel(x_ref, bias_ref, o_ref, *, nh, hd, ws, w, scale):
    t = ws * w
    x = x_ref[0].reshape(t, 3 * nh * hd)
    outs = []
    for h in range(nh):
        q, k, v = _head_qkv(x, h, nh, hd)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_ref[0, h]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1).reshape(ws, w, nh * hd)


def _bwd_kernel(
    x_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
    *, nh, hd, ws, w, scale, nwh, n_var,
):
    t = ws * w
    c = nh * hd
    i = pl.program_id(0)
    b = pl.program_id(1)
    x = x_ref[0].reshape(t, 3 * c)
    do = do_ref[0].reshape(t, c)

    # the full (V, nh, T, T) dbias accumulator is one never-moving block;
    # zero it exactly once, on the first grid step
    @pl.when((i == 0) & (b == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    variant = jnp.where(i == nwh - 1, n_var - 1, 0)
    head_dq, head_dk, head_dv = [], [], []
    for h in range(nh):
        q, k, v = _head_qkv(x, h, nh, hd)
        doh = do[:, h * hd : (h + 1) * hd].astype(jnp.float32)
        bias_h = bias_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale + bias_h
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # forward downcast p->input dtype before PV; mirror it exactly so
        # fused grads match the unfused reference path
        p_lo = p.astype(x.dtype)
        dv = jax.lax.dot_general(
            p_lo, doh.astype(x.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            doh.astype(x.dtype), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if n_var == 1:
            dbias_ref[0, h] += ds
        else:
            for kk in range(n_var):
                dbias_ref[kk, h] += jnp.where(variant == kk, ds, 0.0)
        ds_lo = (ds * scale).astype(x.dtype)
        dq = jax.lax.dot_general(
            ds_lo, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        head_dq.append(dq.astype(dq_ref.dtype))
        head_dk.append(dk.astype(dk_ref.dtype))
        head_dv.append(dv.astype(dv_ref.dtype))
    dq_ref[0] = jnp.concatenate(head_dq, axis=-1).reshape(ws, w, c)
    dk_ref[0] = jnp.concatenate(head_dk, axis=-1).reshape(ws, w, c)
    dv_ref[0] = jnp.concatenate(head_dv, axis=-1).reshape(ws, w, c)


def _strip_spec(ws, w, ch):
    return pl.BlockSpec(
        (1, ws, w, ch), lambda i, bb: (bb, i, 0, 0), memory_space=pltpu.VMEM
    )


def _bias_spec(nh, t_tokens, n_var, nwh):
    def index(i, bb):
        v = jnp.where(i == nwh - 1, n_var - 1, 0)
        return (v, 0, 0, 0)

    return pl.BlockSpec(
        (1, nh, t_tokens, t_tokens), index, memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_window_mhsa(qkv, bias, num_heads, head_dim, window_size, interpret=False):
    """out (B,H,W,C) = window-MHSA(qkv (B,H,W,3C), bias (K,nh,n,n))."""
    return _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)


def _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret):
    b, hh, ww, c3 = qkv.shape
    c = num_heads * head_dim
    assert c3 == 3 * c, (c3, c)
    ws = window_size
    t = ws * ww
    nwh = hh // ws
    scale = head_dim**-0.5
    row_bias = _expand_row_bias(bias.astype(jnp.float32), ws, ww)
    if nwh == 1 and row_bias.shape[0] > 1:
        # a single window-row is entirely the "bottom" variant
        row_bias = row_bias[1:]
    n_var = row_bias.shape[0]
    kernel = functools.partial(
        _fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww, scale=scale
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
        grid=(nwh, b),
        in_specs=[
            _strip_spec(ws, ww, 3 * c),
            _bias_spec(num_heads, t, n_var, nwh),
        ],
        out_specs=_strip_spec(ws, ww, c),
        # the double-buffered row-bias block alone exceeds the default 16 MB
        # scoped-VMEM budget; raise it (v5e has 128 MB VMEM per core)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv, row_bias)


def _mhsa_fwd(qkv, bias, num_heads, head_dim, window_size, interpret):
    out = _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)
    return out, (qkv, bias)


def _mhsa_bwd(num_heads, head_dim, window_size, interpret, res, g):
    qkv, bias = res
    b, hh, ww, _ = qkv.shape
    c = num_heads * head_dim
    ws = window_size
    t = ws * ww
    nwh = hh // ws
    scale = head_dim**-0.5
    collapse = nwh == 1 and bias.shape[0] > 1

    def expand(bias_f32):
        big = _expand_row_bias(bias_f32, ws, ww)
        return big[1:] if collapse else big

    row_bias, expand_vjp = jax.vjp(expand, bias.astype(jnp.float32))
    n_var = row_bias.shape[0]
    kernel = functools.partial(
        _bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww, scale=scale,
        nwh=nwh, n_var=n_var,
    )
    dq, dk, dv, drow = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((n_var, num_heads, t, t), jnp.float32),
        ),
        grid=(nwh, b),
        in_specs=[
            _strip_spec(ws, ww, 3 * c),
            _bias_spec(num_heads, t, n_var, nwh),
            _strip_spec(ws, ww, c),
        ],
        out_specs=(
            _strip_spec(ws, ww, c),
            _strip_spec(ws, ww, c),
            _strip_spec(ws, ww, c),
            # full-array block: never moves, accumulates across the grid
            pl.BlockSpec(
                (n_var, num_heads, t, t),
                lambda i, bb: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(qkv, row_bias, g)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    (dbias,) = expand_vjp(drow)
    return dqkv, dbias.astype(bias.dtype)


fused_window_mhsa.defvjp(_mhsa_fwd, _mhsa_bwd)


def reference_window_mhsa(qkv, bias_full, num_heads, head_dim, window_size):
    """Plain-XLA reference with identical semantics, for CPU execution and
    kernel equivalence tests. bias_full: (nWh*nWw, nh, n, n) per-window bias
    (already including any shift mask)."""
    b, hh, ww, _ = qkv.shape
    c = num_heads * head_dim
    ws = window_size
    n = ws * ws
    nwh, nww = hh // ws, ww // ws
    x = qkv.reshape(b, nwh, ws, nww, ws, 3 * c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nwh * nww, n, 3 * c)
    q, k, v = x[..., :c], x[..., c : 2 * c], x[..., 2 * c :]

    def split(t):  # (b, nw, n, c) -> (b, nw, nh, n, hd)
        return t.reshape(b, nwh * nww, n, num_heads, head_dim).transpose(
            0, 1, 3, 2, 4
        )

    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum(
        "bwhnd,bwhmd->bwhnm", q, k, preferred_element_type=jnp.float32
    )
    s = s * (head_dim**-0.5) + bias_full[None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bwhnm,bwhmd->bwhnd", p, v)
    o = o.transpose(0, 1, 3, 2, 4).reshape(b, nwh, nww, ws, ws, c)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, c).astype(qkv.dtype)
