"""Pallas TPU kernel: fused shifted-window multi-head self-attention.

Why this exists: profiled on a v5e chip, the XLA lowering of SwinIR-style
window attention (reference swinir_arch.py WindowAttention, torch's
einsum/permutation formulation) is bandwidth-bound, not FLOP-bound: XLA's
own cost analysis counts ~54 GB of HBM traffic for a batch-8 36-block
SwinIR-M-shaped chain (~0.7 TFLOP useful), because window partition/reverse
reshape chains, the 5D qkv transpose, and the fp32 attention maps all
materialize in HBM.

Kernel evolution (each step measured on-chip):
 1. windows x heads as (64, hd) x (hd, 64) dots: VMEM-resident but starved
    the 128x128 MXU (~10% util) — ~35 ms of a 57 ms forward.
 2. ONE WINDOW-ROW PER HEAD as a (T, T) block-diagonal attention, T = ws*W:
    near-peak MXU shapes, but issues window_count x the useful MACs on
    off-diagonal blocks and pads the hd=30 contraction to 128 lanes — a
    combined ~34x MAC inflation that made the kernel itself compute-bound
    (~1.7 ms per SwinIR-M block), plus a 12.6 MB (V, nh, T, T) row-bias
    expansion in XLA feeding it.
 3. (this version) WINDOW-GROUP TILES: windows of a row-strip are packed in
    groups of g = max(1, 128 // n) along the M/N dims, so each S tile is an
    MXU-native (g*n, g*n) = (128, 128) dot with only g x diagonal waste
    (2x for ws=8 instead of 8x), and the attention bias + shift mask tile is
    assembled IN-KERNEL from the tiny (K, nh, n, n) kind table — no HBM
    bias expansion at all, and the backward's dbias accumulator shrinks from
    (V, nh, T, T) (12.6 MB) to the kind table's own shape (~400 KB).

Layout contract (chosen so the surrounding flax module needs NO transposes):
  qkv  (B, H, W, 3*C) — the output of one Dense over NHWC, channel groups
       [q | k | v], each C = num_heads * head_dim with heads contiguous.
       The kernel loads full (1, ws, W, 3C) strips; window slices on the
       second-to-minor axis and head slices on the lane axis happen
       in-kernel (both loops statically unrolled).
  bias (K, nh, n, n) fp32 — per-mask-kind attention bias: relative-position
       bias (+ cyclic-shift mask when shifted), n = window_size**2.
       K = 1 (unshifted: all windows share kind 0) or 4 (shifted: interior /
       right-edge / bottom-row / corner — cyclic shift masks only differ for
       windows wrapping the image edge). Kind per window = 2*is_bottom_row +
       is_rightmost_window; is_rightmost is static per window index, so the
       in-kernel select is a single where() on the row coordinate.
  out  (B, H, W, C)

Grid (nwh, B), batch innermost: the bias table and the backward's dbias
accumulator are never-moving full-array blocks (Pallas output accumulation
requires consecutive grid steps to map to the same block). The backward
recomputes softmax from qkv (flash-attention style — nothing besides
qkv/bias is saved).

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
    """Whether the fused kernel applies: TPU backend and window-aligned
    spatial dims, with the (1, ws, W, 3C) qkv strip + per-tile fp32
    scratch small enough for VMEM. Large inference widths fall back to the
    XLA path. Respects TRAINNER_FUSED_ATTN=0 as a global off switch."""
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
    n = window_size * window_size
    # strip (x + qkv grads) + kind bias + S/P tiles, with headroom
    strip = window_size * w * 3 * channels * dtype_bytes
    bias = 4 * (num_heads or 8) * n * n * 4
    return strip * 4 + bias * 2 + 4 * 128 * max(n, 128) * 16 <= 24 * 1024 * 1024


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


def _window_groups(nww: int, n: int) -> list[list[int]]:
    """Pack window indices into MXU-friendly tiles: groups of
    g = max(1, 128 // n) windows (the trailing group may be smaller)."""
    g = max(1, 128 // n)
    return [list(range(a, min(a + g, nww))) for a in range(0, nww, g)]


def _gather_windows(x, group, ws: int, cols: int, wc: int | None = None):
    """(wr, W, cols) strip -> (len(group)*n, cols) tile with each window's
    n = wr*wc tokens contiguous (wr = strip rows, wc = window columns;
    square ws*ws when wc is None). Window slices land on the
    second-to-minor axis at wc multiples; the (wr, wc, cols) -> (n, cols)
    reshape collapses leading dims only, so both are layout-preserving."""
    wr, wc = ws, (ws if wc is None else wc)
    parts = [
        x[:, j * wc : (j + 1) * wc, :].reshape(wr * wc, cols) for j in group
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _scatter_windows(o_ref, tile, group, ws: int, cols: int,
                     wc: int | None = None):
    wr, wc = ws, (ws if wc is None else wc)
    n = wr * wc
    for idx, j in enumerate(group):
        o_ref[0, :, j * wc : (j + 1) * wc, :] = tile[
            idx * n : (idx + 1) * n
        ].reshape(wr, wc, cols)


def _bias_block(bias_ref, h: int, j: int, nww: int, kinds: int, is_bottom):
    """(n, n) fp32 bias for window j of the current row-strip. is_rightmost
    is static in j; only the bottom-row condition is traced."""
    if kinds == 1:
        return bias_ref[0, h]
    base = 1 if j == nww - 1 else 0
    return jnp.where(is_bottom, bias_ref[base + 2, h], bias_ref[base, h])


def _bias_tile(bias_ref, h: int, group, nww: int, kinds: int, is_bottom):
    """Block-diagonal (len(group)*n, len(group)*n) bias tile with _NEG off
    the diagonal, assembled from (n, n) kind blocks."""
    n = bias_ref.shape[-1]
    g = len(group)
    if g == 1:
        return _bias_block(bias_ref, h, group[0], nww, kinds, is_bottom)
    neg = jnp.full((n, n), _NEG, jnp.float32)
    rows = []
    for a, j in enumerate(group):
        blk = _bias_block(bias_ref, h, j, nww, kinds, is_bottom)
        rows.append(
            jnp.concatenate(
                [blk if b == a else neg for b in range(g)], axis=1
            )
        )
    return jnp.concatenate(rows, axis=0)


def _head_qkv(x, h: int, nh: int, hd: int):
    c = nh * hd
    q = x[:, h * hd : (h + 1) * hd]
    k = x[:, c + h * hd : c + (h + 1) * hd]
    v = x[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
    return q, k, v


def _fwd_kernel(x_ref, bias_ref, o_ref, *, nh, hd, ws, w, scale, nwh, kinds,
                wc=None):
    wc = ws if wc is None else wc
    n = ws * wc
    nww = w // wc
    is_bottom = pl.program_id(0) == nwh - 1
    x = x_ref[0]  # (wr, W, 3C)
    for group in _window_groups(nww, n):
        tile = _gather_windows(x, group, ws, 3 * nh * hd, wc)  # (g*n, 3C)
        outs = []
        for h in range(nh):
            q, k, v = _head_qkv(tile, h, nh, hd)
            # transposed softmax: S^T = k q^T puts the normalization
            # reductions on SUBLANES (~6x cheaper than lane reductions);
            # the per-row max becomes a tile-scalar max (same overflow
            # guard). bias_ref arrives TRANSPOSED from the impl.
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_t = s_t * scale + _bias_tile(bias_ref, h, group, nww, kinds, is_bottom)
            m = jnp.max(s_t)
            p_t = jnp.exp(s_t - m)
            l = jnp.maximum(jnp.sum(p_t, axis=0, keepdims=True), 1e-30)
            p_t = p_t / l
            o = jax.lax.dot_general(
                p_t.astype(x.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o.astype(o_ref.dtype))
        _scatter_windows(
            o_ref, jnp.concatenate(outs, axis=-1), group, ws, nh * hd, wc
        )


def _bwd_kernel(
    x_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, dbias_ref,
    *, nh, hd, ws, w, scale, nwh, kinds, wc=None,
):
    wc = ws if wc is None else wc
    n = ws * wc
    nww = w // wc
    c = nh * hd
    i = pl.program_id(0)
    b = pl.program_id(1)
    is_bottom = i == nwh - 1
    x = x_ref[0]
    do_strip = do_ref[0]

    # the full (K, nh, n, n) dbias accumulator is one never-moving block;
    # zero it exactly once, on the first grid step
    @pl.when((i == 0) & (b == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for group in _window_groups(nww, n):
        tile = _gather_windows(x, group, ws, 3 * c, wc)
        do_tile = _gather_windows(do_strip, group, ws, c, wc)
        head_dq, head_dk, head_dv = [], [], []
        for h in range(nh):
            q, k, v = _head_qkv(tile, h, nh, hd)
            doh = do_tile[:, h * hd : (h + 1) * hd].astype(jnp.float32)
            # transposed softmax recompute (see the forward kernel):
            # bias_ref arrives TRANSPOSED; dbias accumulates d(bias^T) and
            # the impl transposes it back
            s_t = jax.lax.dot_general(
                k, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_t = s_t * scale + _bias_tile(
                bias_ref, h, group, nww, kinds, is_bottom
            )
            m = jnp.max(s_t)
            p_t = jnp.exp(s_t - m)
            l = jnp.maximum(jnp.sum(p_t, axis=0, keepdims=True), 1e-30)
            p = p_t / l
            # forward downcast p->input dtype before PV; mirror it exactly so
            # fused grads match the unfused reference path
            p_lo = p.astype(x.dtype)
            dv = jax.lax.dot_general(
                p_lo, doh.astype(x.dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp_t = jax.lax.dot_general(
                v, doh.astype(x.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds_t = p * (dp_t - jnp.sum(dp_t * p, axis=0, keepdims=True))
            # accumulate the diagonal (n, n) blocks of ds^T onto their kinds
            for a, j in enumerate(group):
                blk = ds_t[a * n : (a + 1) * n, a * n : (a + 1) * n]
                if kinds == 1:
                    dbias_ref[0, h] += blk
                else:
                    base = 1 if j == nww - 1 else 0
                    zero = jnp.zeros_like(blk)
                    dbias_ref[base, h] += jnp.where(is_bottom, zero, blk)
                    dbias_ref[base + 2, h] += jnp.where(is_bottom, blk, zero)
            ds_lo = (ds_t * scale).astype(x.dtype)
            dq = jax.lax.dot_general(
                ds_lo, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                ds_lo, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            head_dq.append(dq.astype(dq_ref.dtype))
            head_dk.append(dk.astype(dk_ref.dtype))
            head_dv.append(dv.astype(dv_ref.dtype))
        _scatter_windows(dq_ref, jnp.concatenate(head_dq, -1), group, ws, c, wc)
        _scatter_windows(dk_ref, jnp.concatenate(head_dk, -1), group, ws, c, wc)
        _scatter_windows(dv_ref, jnp.concatenate(head_dv, -1), group, ws, c, wc)


def _strip_spec(ws, w, ch):
    return pl.BlockSpec(
        (1, ws, w, ch), lambda i, bb: (bb, i, 0, 0), memory_space=pltpu.VMEM
    )


def _full_spec(shape):
    return pl.BlockSpec(
        shape, lambda i, bb: (0,) * len(shape), memory_space=pltpu.VMEM
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_window_mhsa(qkv, bias, num_heads, head_dim, window_size, interpret=False):
    """out (B,H,W,C) = window-MHSA(qkv (B,H,W,3C), bias (K,nh,n,n))."""
    return _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)


def _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret,
                   wc=None):
    b, hh, ww, c3 = qkv.shape
    c = num_heads * head_dim
    assert c3 == 3 * c, (c3, c)
    ws = window_size  # strip rows (= window rows for rect windows)
    nwh = hh // ws
    kinds = bias.shape[0]
    scale = head_dim**-0.5
    kernel = functools.partial(
        _fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww, scale=scale,
        nwh=nwh, kinds=kinds, wc=wc,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
        grid=(nwh, b),
        in_specs=[
            _strip_spec(ws, ww, 3 * c),
            _full_spec(bias.shape),
        ],
        out_specs=_strip_spec(ws, ww, c),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
        name="fused_window_mhsa_fwd",
    )(qkv, bias.astype(jnp.float32).transpose(0, 1, 3, 2))


def _mhsa_fwd(qkv, bias, num_heads, head_dim, window_size, interpret):
    out = _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)
    return out, (qkv, bias)


def _mhsa_bwd(num_heads, head_dim, window_size, interpret, res, g,
              wc=None):
    qkv, bias = res
    b, hh, ww, _ = qkv.shape
    c = num_heads * head_dim
    ws = window_size
    n = ws * (ws if wc is None else wc)
    nwh = hh // ws
    kinds = bias.shape[0]
    scale = head_dim**-0.5
    kernel = functools.partial(
        _bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww, scale=scale,
        nwh=nwh, kinds=kinds, wc=wc,
    )
    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), jnp.float32),
        ),
        grid=(nwh, b),
        in_specs=[
            _strip_spec(ws, ww, 3 * c),
            _full_spec(bias.shape),
            _strip_spec(ws, ww, c),
        ],
        out_specs=(
            _strip_spec(ws, ww, c),
            _strip_spec(ws, ww, c),
            _strip_spec(ws, ww, c),
            # full-array block: never moves, accumulates across the grid
            _full_spec((kinds, num_heads, n, n)),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
        name="fused_window_mhsa_bwd",
    )(qkv, bias.astype(jnp.float32).transpose(0, 1, 3, 2), g)
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    # the kernel accumulated d(bias^T); undo the entry transpose
    return dqkv, dbias.transpose(0, 1, 3, 2).astype(bias.dtype)


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


# ---------------------------------------------------------------------------
# Rectangular windows (DAT's dual-branch split-size attention): identical
# machinery with strip rows = h_sp and window columns = w_sp. n = h_sp*w_sp
# is 128+ for DAT geometries, so each window is already an MXU-native tile
# (group packing engages only when n < 128).
# Reference: /root/reference/traiNNer/archs/dat_arch.py (Spatial_Attention).
# ---------------------------------------------------------------------------


def fused_rect_mhsa_supported(
    h: int, w: int, h_sp: int, w_sp: int, channels: int,
    num_heads: int | None = None, dtype_bytes: int = 2,
) -> bool:
    import os

    if os.environ.get("TRAINNER_FUSED_ATTN", "1") == "0":
        return False
    mode = os.environ.get("TRAINNER_FUSED_BLOCK", "1")
    if mode != "interpret":
        try:
            if jax.default_backend() != "tpu":
                return False
        except Exception:
            return False
    if h % h_sp or w % w_sp:
        return False
    n = h_sp * w_sp
    strip = h_sp * w * 3 * channels * dtype_bytes
    bias = 4 * (num_heads or 8) * n * n * 4
    return strip * 4 + bias * 2 + 4 * 128 * max(n, 128) * 16 <= 24 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_rect_mhsa(qkv, bias, num_heads, head_dim, h_sp, w_sp,
                    interpret=False):
    """out (B,H,W,C) = rect-window MHSA(qkv (B,H,W,3C), bias (K,nh,n,n)),
    windows of h_sp rows x w_sp columns, n = h_sp*w_sp."""
    return _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, h_sp, interpret,
                          wc=w_sp)


def _rect_fwd(qkv, bias, num_heads, head_dim, h_sp, w_sp, interpret):
    out = _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, h_sp, interpret,
                         wc=w_sp)
    return out, (qkv, bias)


def _rect_bwd(num_heads, head_dim, h_sp, w_sp, interpret, res, g):
    return _mhsa_bwd(num_heads, head_dim, h_sp, interpret, res, g, wc=w_sp)


fused_rect_mhsa.defvjp(_rect_fwd, _rect_bwd)


def rect_shift_mask_kinds(h_sp: int, w_sp: int, sh: int, sw: int) -> np.ndarray:
    """4 distinct shifted-rect-window masks (kind, n, n): 0 interior,
    1 right-edge, 2 bottom-edge, 3 corner — the rect analogue of
    shift_mask_kinds (roll by (-sh, -sw); the last sh rows / sw columns of
    an edge window wrapped from the opposite image edge). Equivalent to the
    reference's per-window img_mask construction
    (/root/reference/traiNNer/archs/dat_arch.py Spatial_Attention
    calculate_mask) evaluated per window position."""
    n = h_sp * w_sp
    row_edge = np.zeros((h_sp,), np.int32)
    row_edge[h_sp - sh :] = 1
    col_edge = np.zeros((w_sp,), np.int32)
    col_edge[w_sp - sw :] = 1
    row_int = np.zeros((h_sp,), np.int32)
    col_int = np.zeros((w_sp,), np.int32)
    masks = np.zeros((4, n, n), np.float32)
    for kind, (rs, cs) in enumerate(
        [(row_int, col_int), (row_int, col_edge), (row_edge, col_int),
         (row_edge, col_edge)]
    ):
        seg = (rs[:, None] * 2 + cs[None, :]).reshape(-1)
        diff = seg[:, None] != seg[None, :]
        masks[kind] = np.where(diff, -100.0, 0.0)
    return masks
