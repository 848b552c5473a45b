"""Pallas TPU kernel: fused shifted-window multi-head self-attention.

Why this exists: profiled on a v5e chip, the XLA lowering of SwinIR-style
window attention (reference swinir_arch.py WindowAttention, torch's
einsum/permutation formulation) spends most of its time on LAYOUT, not math:
the qkv (b_, n, 3, nh, hd) 5D transpose materializes as a strided HBM copy
(~12 ms per forward for SwinIR-M b8 64px), window partition/reverse reshape
chains add more, and the (b_, nh, n, n) fp32 attention matrix round-trips
through HBM between the QK^T fusion and the PV matmul (~100 MB per block of
traffic). This kernel keeps one window-row of qkv resident in VMEM and does
QK^T + relative-position bias + shift mask + fp32 softmax + PV in a single
pass; windows are cut from the NHWC tensor by BlockSpec indexing, so window
partition/reverse never exist as ops at all.

Layout contract (chosen so the surrounding flax module needs NO transposes):
  qkv  (B, H, W, 3*C) — the output of one Dense over NHWC, channel groups
       [q | k | v], each C = num_heads * head_dim with heads contiguous.
  bias (K, nh, n, n) fp32 — per-mask-kind attention bias: relative-position
       bias (+ cyclic-shift mask when shifted), n = window_size**2.
       K = 1 (unshifted: all windows share kind 0) or 4 (shifted: interior /
       right-edge / bottom-row / corner — cyclic shift masks only differ for
       windows wrapping the image edge).
  out  (B, H, W, C)

The grid is (H//ws, B): one kernel invocation processes one window-row of one
image (W//ws windows), looping windows and heads statically in-kernel. The
backward kernel recomputes softmax from qkv (flash-attention style — nothing
besides qkv/bias is saved) and accumulates the bias gradient across the batch
grid dimension (b innermost => output block stays resident in VMEM).

Gradient flow through `bias` lets flax autodiff carry d(bias) back into the
relative_position_bias_table gather outside the kernel; the shift mask rides
along as a constant addend.

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


def fused_window_mhsa_supported(
    h: int, w: int, window_size: int, channels: int, dtype_bytes: int = 2
) -> bool:
    """Whether the fused kernel applies: TPU backend, window-aligned spatial
    dims, and the per-grid-step VMEM working set (one window-row of qkv +
    out, double-buffered) within budget. Large inference widths fall back to
    the XLA path. Respects TRAINNER_FUSED_ATTN=0 as a global off switch."""
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
    block_bytes = window_size * w * 4 * channels * dtype_bytes
    return block_bytes <= 6 * 1024 * 1024


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


def _fwd_kernel(qkv_ref, bias_ref, o_ref, *, nh, hd, ws, nww, scale, kinds):
    c = nh * hd
    n = ws * ws
    i = pl.program_id(0)
    last_row = i == pl.num_programs(0) - 1
    x = qkv_ref[0]  # (ws, W, 3C)
    row_out = []
    for w in range(nww):
        xw = x[:, w * ws : (w + 1) * ws, :].reshape(n, 3 * c)
        if kinds == 1:
            bias_w = bias_ref[0]  # (nh, n, n)
        else:
            is_right = w == nww - 1
            kind = jnp.where(last_row, 2, 0) + (1 if is_right else 0)
            bias_w = bias_ref[kind]
        head_out = []
        for h in range(nh):
            q = xw[:, h * hd : (h + 1) * hd]
            k = xw[:, c + h * hd : c + (h + 1) * hd]
            v = xw[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            s = jax.lax.dot_general(
                q,
                k,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias_w[h]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(xw.dtype),
                v,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            head_out.append(o.astype(o_ref.dtype))
        row_out.append(jnp.concatenate(head_out, axis=-1).reshape(ws, ws, c))
    o_ref[0] = jnp.concatenate(row_out, axis=1)


def _bwd_kernel(
    qkv_ref, bias_ref, do_ref, dqkv_ref, dbias_ref, *, nh, hd, ws, nww, scale, kinds
):
    c = nh * hd
    n = ws * ws
    i = pl.program_id(0)
    b = pl.program_id(1)
    last_row = i == pl.num_programs(0) - 1
    x = qkv_ref[0]
    do = do_ref[0]

    # dbias accumulates across the WHOLE grid (its block never changes), so
    # zero it exactly once, on the first grid step
    @pl.when((b == 0) & (i == 0))
    def _init():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    dbias_acc = [
        [jnp.zeros((n, n), jnp.float32) for _ in range(nh)] for _ in range(kinds)
    ]
    row_dq, row_dk, row_dv = [], [], []
    for w in range(nww):
        xw = x[:, w * ws : (w + 1) * ws, :].reshape(n, 3 * c)
        dow = do[:, w * ws : (w + 1) * ws, :].reshape(n, c)
        if kinds == 1:
            bias_w = bias_ref[0]
            kind = None
        else:
            is_right = w == nww - 1
            kind = jnp.where(last_row, 2, 0) + (1 if is_right else 0)
            bias_w = bias_ref[kind]
        head_dq, head_dk, head_dv = [], [], []
        for h in range(nh):
            q = xw[:, h * hd : (h + 1) * hd]
            k = xw[:, c + h * hd : c + (h + 1) * hd]
            v = xw[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            doh = dow[:, h * hd : (h + 1) * hd].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale + bias_w[h]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            # forward downcast p->input dtype before PV; mirror it exactly so
            # fused grads match the unfused reference path
            p_lo = p.astype(xw.dtype)
            dv = jax.lax.dot_general(
                p_lo, doh.astype(xw.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(
                doh.astype(xw.dtype), v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            if kinds == 1:
                dbias_acc[0][h] += ds
            else:
                for kk in range(kinds):
                    dbias_acc[kk][h] += jnp.where(kind == kk, ds, 0.0)
            ds_lo = (ds * scale).astype(xw.dtype)
            dq = jax.lax.dot_general(
                ds_lo, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk = jax.lax.dot_general(
                ds_lo, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            head_dq.append(dq.astype(dqkv_ref.dtype))
            head_dk.append(dk.astype(dqkv_ref.dtype))
            head_dv.append(dv.astype(dqkv_ref.dtype))
        parts = head_dq + head_dk + head_dv
        row_dq.append(jnp.concatenate(parts, axis=-1).reshape(ws, ws, 3 * c))
    dqkv_ref[0] = jnp.concatenate(row_dq, axis=1)
    for kk in range(kinds):
        for h in range(nh):
            dbias_ref[kk, h] += dbias_acc[kk][h]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_window_mhsa(qkv, bias, num_heads, head_dim, window_size, interpret=False):
    """out (B,H,W,C) = window-MHSA(qkv (B,H,W,3C), bias (K,nh,n,n))."""
    return _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)


def _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret):
    b, hh, ww, c3 = qkv.shape
    c = num_heads * head_dim
    assert c3 == 3 * c, (c3, c)
    ws = window_size
    n = ws * ws
    nww = ww // ws
    kinds = bias.shape[0]
    scale = head_dim**-0.5
    kernel = functools.partial(
        _fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, nww=nww,
        scale=scale, kinds=kinds,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, c), qkv.dtype),
        grid=(hh // ws, b),
        in_specs=[
            pl.BlockSpec(
                (1, ws, ww, 3 * c), lambda i, bb: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kinds, num_heads, n, n), lambda i, bb: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ws, ww, c), lambda i, bb: (bb, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32))


def _mhsa_fwd(qkv, bias, num_heads, head_dim, window_size, interpret):
    out = _mhsa_fwd_impl(qkv, bias, num_heads, head_dim, window_size, interpret)
    return out, (qkv, bias)


def _mhsa_bwd(num_heads, head_dim, window_size, interpret, res, g):
    qkv, bias = res
    b, hh, ww, _ = qkv.shape
    c = num_heads * head_dim
    ws = window_size
    n = ws * ws
    nww = ww // ws
    kinds = bias.shape[0]
    scale = head_dim**-0.5
    kernel = functools.partial(
        _bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, nww=nww,
        scale=scale, kinds=kinds,
    )
    dqkv, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), jnp.float32),
        ),
        grid=(hh // ws, b),
        in_specs=[
            pl.BlockSpec(
                (1, ws, ww, 3 * c), lambda i, bb: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (kinds, num_heads, n, n), lambda i, bb: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, ws, ww, c), lambda i, bb: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, ws, ww, 3 * c), lambda i, bb: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # every grid step maps to the same dbias block; b is the inner
            # grid dim, so for a fixed window-row the block stays resident
            # and accumulates across the batch before being flushed
            pl.BlockSpec(
                (kinds, num_heads, n, n), lambda i, bb: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(qkv, bias.astype(jnp.float32), g)
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
