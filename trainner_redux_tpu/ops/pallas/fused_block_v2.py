"""Pallas TPU kernels: fused POST-norm transformer block halves (SwinV2).

Swin2SR (reference swin2sr_arch.py / SwinV2) differs from the SwinIR
lineage in two ways that keep it off the fused_block.py kernels:

  - post-norm residuals: z = x + LN(attn(x)), out = z + LN(mlp(z))
    (fused_block.py fuses the PRE-norm composition), and
  - cosine attention: S = (q_hat . k_hat) * exp(clamp(logit_scale)) + bias,
    with per-row L2-normalized q/k and a learned per-head temperature.

These kernels fuse each half into one VMEM-resident pass exactly like
fused_block.py (window-group MXU tiles, in-kernel bias-kind assembly,
recompute-based custom VJPs, batch-blocked grids):

  fused_cos_attn_block : z  = x + s*LN1( proj( cosMHSA( qkv(x) ) ) )
  fused_postnorm_mlp   : out = z + s*LN2( fc2( gelu( fc1(z) ) ) )

The (K, nh, n, n) bias table arrives as an array input (computed from the
CPB MLP outside the kernel), so its cotangent flows back into the CPB
parameters through the normal XLA graph. The per-head temperature arrives
pre-exponentiated as a (1, nh) row; its cotangent is accumulated in-kernel.

Reference semantics: /root/reference/traiNNer/archs/swin2sr_arch.py
(WindowAttention with cosine attention + post-norm SwinTransformerBlock).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trainner_redux_tpu.ops.pallas.fused_block import (
    _VMEM_LIMIT,
    _backend_ok,
    _dot,
    _full_spec,
    _ln_bwd,
    _ln_f32,
    _gelu_exact,
    _gelu_exact_grad,
    _row_spec,
    _scale_rows,
    _scatter_windows_b,
    _strip_spec,
)
from trainner_redux_tpu.ops.pallas.window_attention import (
    _bias_tile,
    _gather_windows,
    _head_qkv,
    _window_groups,
)


def fused_block_v2_supported(
    h: int, w: int, window_size: int, channels: int, num_heads: int,
    hidden: int, dtype_bytes: int = 2,
) -> bool:
    """Gate for the SwinV2 fused kernels. OFF by default on real TPU:
    measured at swin2sr_s geometry (c=60, b8, 64px), the fused pair runs
    66.3 img/s vs 103.6 on the XLA path (docs/perf/
    fused_family_deltas.json) — the cosine backward's per-head fp32
    temporaries force bsub<=2 and the small batch blocks lose more than
    the fusion saves at this channel width. Opt in with TRAINNER_FUSED_V2=1
    (e.g. for wider custom variants); interpret mode stays on so the
    equivalence tests exercise the kernels."""
    import os

    from trainner_redux_tpu.ops.pallas.fused_block import (
        fused_block_supported,
    )

    mode = os.environ.get("TRAINNER_FUSED_BLOCK", "1")
    if mode != "interpret" and os.environ.get("TRAINNER_FUSED_V2", "0") != "1":
        return False
    return fused_block_supported(
        h, w, window_size, channels, num_heads, hidden, dtype_bytes
    )


def _norm_rows(t32):
    """L2-normalize rows (torch F.normalize semantics, eps-clamped norm).
    Returns (normalized, inv_norm)."""
    sq = jnp.sum(t32 * t32, axis=-1, keepdims=True)
    inv = 1.0 / jnp.maximum(jnp.sqrt(sq), 1e-12)
    return t32 * inv, inv


def _cos_heads_fwd(tile, bias_ref, scale_row, group, nww, kinds, is_bottom,
                   nh, hd, cdt):
    outs = []
    for h in range(nh):
        q, k, v = _head_qkv(tile, h, nh, hd)
        qn, _ = _norm_rows(q.astype(jnp.float32))
        kn, _ = _norm_rows(k.astype(jnp.float32))
        sc = _dot(qn.astype(cdt), kn.astype(cdt), (((1,), (1,)), ((), ())))
        sc = sc * scale_row[0, h] + _bias_tile(
            bias_ref, h, group, nww, kinds, is_bottom
        )
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(_dot(p.astype(cdt), v).astype(cdt))
    return jnp.concatenate(outs, axis=-1)


def _cos_attn_fwd_kernel(x_ref, wq_ref, bq_ref, scale_ref, wp_ref, bp_ref,
                         g_ref, be_ref, bias_ref, s_ref, o_ref, att_ref,
                         *, nh, hd, ws, w, nwh, kinds, eps):
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    is_bottom = pl.program_id(0) == nwh - 1

    t = x_ref[...].reshape(bs * ws * w, c)
    qkv = (_dot(t, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    scale_row = scale_ref[...]
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            att = _cos_heads_fwd(
                tile, bias_ref, scale_row, group, nww, kinds, is_bottom,
                nh, hd, cdt,
            )
            _scatter_windows_b(att_ref, att, bb, group, ws, c)
    att_t = att_ref[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    y32, _, _ = _ln_f32(proj.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    srow = _scale_rows(s_ref, bs, ws * w)
    o_ref[...] = (t.astype(jnp.float32) + srow * y32).astype(cdt).reshape(
        bs, ws, w, c
    )


def _cos_attn_bwd_kernel(
    x_ref, wq_ref, bq_ref, scale_ref, wp_ref, bp_ref, g_ref, be_ref,
    bias_ref, s_ref, do_ref,
    dx_ref, dwq_ref, dbq_ref, dscale_ref, dwp_ref, dbp_ref, dg_ref, dbe_ref,
    dbias_ref, att_scratch, dqkv_scratch,
    *, nh, hd, ws, w, nwh, kinds, eps,
):
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    i, b = pl.program_id(0), pl.program_id(1)
    is_bottom = i == nwh - 1

    @pl.when((i == 0) & (b == 0))
    def _init():
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    t = x_ref[...].reshape(bs * ws * w, c)
    do_t = do_ref[...].reshape(bs * ws * w, c)
    g = g_ref[0]
    qkv = (_dot(t, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    scale_row = scale_ref[...]
    srow = _scale_rows(s_ref, bs, ws * w)

    # recompute attention fwd for proj/LN chain
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            att = _cos_heads_fwd(
                tile, bias_ref, scale_row, group, nww, kinds, is_bottom,
                nh, hd, cdt,
            )
            _scatter_windows_b(att_scratch, att, bb, group, ws, c)
    att_t = att_scratch[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    p32 = proj.astype(jnp.float32)
    _, xn, inv = _ln_f32(p32, g, be_ref[0], eps)

    dy = do_t.astype(jnp.float32) * srow  # d wrt LN output
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dproj = _ln_bwd(dy, xn, inv, g)
    dproj_lo = dproj.astype(cdt)
    dbp_ref[...] += jnp.sum(dproj, axis=0, keepdims=True)
    dwp_ref[...] += _dot(att_t, dproj_lo, (((0,), (0,)), ((), ())))
    datt = _dot(dproj_lo, wp_ref[...], (((1,), (1,)), ((), ()))).astype(
        cdt
    ).reshape(bs, ws, w, c)

    dbias_acc = [
        [jnp.zeros((n, n), jnp.float32) for _ in range(nh)]
        for _ in range(kinds)
    ]
    dscale_acc = [jnp.zeros((), jnp.float32) for _ in range(nh)]
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            da_tile = _gather_windows(datt[bb], group, ws, c)
            head_dq, head_dk, head_dv = [], [], []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                doh = da_tile[:, h * hd : (h + 1) * hd].astype(jnp.float32)
                q32 = q.astype(jnp.float32)
                k32 = k.astype(jnp.float32)
                qn, qinv = _norm_rows(q32)
                kn, kinv = _norm_rows(k32)
                qn_lo, kn_lo = qn.astype(cdt), kn.astype(cdt)
                cos = _dot(qn_lo, kn_lo, (((1,), (1,)), ((), ())))
                sc = cos * scale_row[0, h] + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
                m = jnp.max(sc, axis=-1, keepdims=True)
                p = jnp.exp(sc - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                p_lo = p.astype(cdt)
                dv = _dot(p_lo, doh.astype(cdt), (((0,), (0,)), ((), ())))
                dp = _dot(doh.astype(cdt), v, (((1,), (1,)), ((), ())))
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                for a, j in enumerate(group):
                    blk = ds[a * n : (a + 1) * n, a * n : (a + 1) * n]
                    if kinds == 1:
                        dbias_acc[0][h] += blk
                    else:
                        base = 1 if j == nww - 1 else 0
                        zero = jnp.zeros_like(blk)
                        dbias_acc[base][h] += jnp.where(is_bottom, zero, blk)
                        dbias_acc[base + 2][h] += jnp.where(
                            is_bottom, blk, zero
                        )
                dscale_acc[h] += jnp.sum(ds * cos)
                dcos = (ds * scale_row[0, h]).astype(cdt)
                dqn = _dot(dcos, kn_lo).astype(jnp.float32)
                dkn = _dot(dcos, qn_lo, (((0,), (0,)), ((), ()))).astype(
                    jnp.float32
                )
                # d of row-normalize: dq = (dqn - qn * <qn, dqn>) * inv
                dq = (dqn - qn * jnp.sum(qn * dqn, axis=-1, keepdims=True)) * qinv
                dk = (dkn - kn * jnp.sum(kn * dkn, axis=-1, keepdims=True)) * kinv
                head_dq.append(dq.astype(cdt))
                head_dk.append(dk.astype(cdt))
                head_dv.append(dv.astype(cdt))
            dtile = jnp.concatenate(head_dq + head_dk + head_dv, axis=-1)
            for a, j in enumerate(group):
                dqkv_scratch[bb, :, j * ws : (j + 1) * ws, :] = dtile[
                    a * n : (a + 1) * n
                ].reshape(ws, ws, 3 * c)

    dbias_ref[...] += jnp.stack([jnp.stack(row) for row in dbias_acc])
    dscale_ref[...] += jnp.stack(dscale_acc).reshape(1, nh)
    dqkv = dqkv_scratch[...].reshape(bs * ws * w, 3 * c)
    dwq_ref[...] += _dot(t, dqkv, (((0,), (0,)), ((), ())))
    dbq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dt = _dot(dqkv, wq_ref[...], (((1,), (1,)), ((), ())))
    dx_ref[...] = (do_t.astype(jnp.float32) + dt.astype(jnp.float32)).astype(
        cdt
    ).reshape(bs, ws, w, c)


def _cos_call_args(x, wq, bq, scale, wp, bp, g, be, bias, s, window_size,
                   num_heads, for_bwd=False):
    from trainner_redux_tpu.ops.pallas.fused_block import _attn_bsub

    b, hh, ww, c = x.shape
    ws = window_size
    bsub = _attn_bsub(b, hh, ww, c, num_heads, ws, bias.shape[0],
                      dtype_bytes=x.dtype.itemsize)
    if for_bwd:
        # the cosine backward's unrolled per-head fp32 temporaries (qn/kn
        # rows, inverse norms, dscale/datt) lane-pad small C hard: measured
        # 113 MB of Mosaic stack at bsub=8 for swin2sr_s (c=60) against the
        # 64 MB scoped-vmem limit — ~30x the v1 byte estimate. Clamp the
        # backward to bsub <= 2 (fwd keeps the larger block).
        bsub = min(bsub, 2)
        while b % bsub:
            bsub -= 1
    ins = (
        x,
        wq.astype(x.dtype),
        bq.astype(jnp.float32).reshape(1, 3 * c),
        scale.astype(jnp.float32).reshape(1, num_heads),
        wp.astype(x.dtype),
        bp.astype(jnp.float32).reshape(1, c),
        g.astype(jnp.float32).reshape(1, c),
        be.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32),
        s.astype(jnp.float32).reshape(b, 1),
    )
    specs = [
        _strip_spec(ws, ww, c, bsub),
        _full_spec((c, 3 * c)),
        _row_spec(3 * c),
        _row_spec(num_heads),
        _full_spec((c, c)),
        _row_spec(c),
        _row_spec(c),
        _row_spec(c),
        _full_spec(bias.shape),
        _full_spec((b, 1), pltpu.SMEM),
    ]
    return ins, specs, (hh // ws, b // bsub), bsub


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def fused_cos_attn_block(x, wq, bq, scale, wp, bp, g, be, bias, s, num_heads,
                         head_dim, window_size, eps=1e-5, interpret=False):
    """z (B,H,W,C) = x + s[b] * LN(proj(cosMHSA(qkv(x), bias, scale))).

    scale: (nh,) pre-exponentiated per-head temperature
    (exp(clamp(logit_scale))). bias: (K, nh, n, n) kind table (16*sigmoid
    CPB bias + shift mask). Post-norm SwinV2 semantics."""
    return _cos_fwd_impl(x, wq, bq, scale, wp, bp, g, be, bias, s,
                         num_heads, head_dim, window_size, eps, interpret)


def _cos_fwd_impl(x, wq, bq, scale, wp, bp, g, be, bias, s, num_heads,
                  head_dim, window_size, eps, interpret):
    b, hh, ww, c = x.shape
    ws = window_size
    kernel = functools.partial(
        _cos_attn_fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        nwh=hh // ws, kinds=bias.shape[0], eps=eps,
    )
    ins, specs, grid, bsub = _cos_call_args(
        x, wq, bq, scale, wp, bp, g, be, bias, s, ws, num_heads
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=_strip_spec(ws, ww, c, bsub),
        scratch_shapes=[pltpu.VMEM((bsub, ws, ww, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_cos_attn_block_fwd",
    )(*ins)


def _cos_fwd(x, wq, bq, scale, wp, bp, g, be, bias, s, num_heads, head_dim,
             window_size, eps, interpret):
    z = _cos_fwd_impl(x, wq, bq, scale, wp, bp, g, be, bias, s, num_heads,
                      head_dim, window_size, eps, interpret)
    return z, (x, wq, bq, scale, wp, bp, g, be, bias, s)


def _cos_bwd(num_heads, head_dim, window_size, eps, interpret, res, do):
    x, wq, bq, scale, wp, bp, g, be, bias, s = res
    b, hh, ww, c = x.shape
    ws = window_size
    n = ws * ws
    kinds = bias.shape[0]
    f32 = jnp.float32
    kernel = functools.partial(
        _cos_attn_bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        nwh=hh // ws, kinds=kinds, eps=eps,
    )
    ins, specs, grid, bsub = _cos_call_args(
        x, wq, bq, scale, wp, bp, g, be, bias, s, ws, num_heads,
        for_bwd=True,
    )
    (dx, dwq, dbq, dscale, dwp, dbp, dg, dbe, dbias) = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct((1, num_heads), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), f32),
        ),
        grid=grid,
        in_specs=specs + [_strip_spec(ws, ww, c, bsub)],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _full_spec((c, 3 * c)), _row_spec(3 * c),
            _row_spec(num_heads),
            _full_spec((c, c)), _row_spec(c),
            _row_spec(c), _row_spec(c),
            _full_spec((kinds, num_heads, n, n)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsub, ws, ww, c), x.dtype),
            pltpu.VMEM((bsub, ws, ww, 3 * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_cos_attn_block_bwd",
    )(*ins, do)
    return (
        dx,
        dwq.astype(wq.dtype),
        dbq.reshape(3 * c).astype(bq.dtype),
        dscale.reshape(num_heads).astype(scale.dtype),
        dwp.astype(wp.dtype),
        dbp.reshape(c).astype(bp.dtype),
        dg.reshape(c).astype(g.dtype),
        dbe.reshape(c).astype(be.dtype),
        dbias.astype(bias.dtype),
        jnp.zeros_like(s),
    )


fused_cos_attn_block.defvjp(_cos_fwd, _cos_bwd)


# ---------------------------------------------------------------------------
# Post-norm MLP half: out = z + s * LN2(fc2(gelu(fc1(z))))
# ---------------------------------------------------------------------------


def _pn_mlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                       s_ref, o_ref, *, eps):
    bs, ws_, w_, c = x_ref.shape
    cdt = x_ref.dtype
    t = x_ref[...].reshape(bs * ws_ * w_, c)
    h = _dot(t, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    hg = _gelu_exact(h.astype(jnp.float32)).astype(cdt)
    m = _dot(hg, w2_ref[...]).astype(cdt) + b2_ref[0].astype(cdt)
    y32, _, _ = _ln_f32(m.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    srow = _scale_rows(s_ref, bs, ws_ * w_)
    o_ref[...] = (t.astype(jnp.float32) + srow * y32).astype(cdt).reshape(
        bs, ws_, w_, c
    )


def _pn_mlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, be_ref,
                       s_ref, do_ref,
                       dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref,
                       dbe_ref, *, eps):
    bs, ws_, w_, c = x_ref.shape
    cdt = x_ref.dtype
    i, b = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (b == 0))
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)

    t = x_ref[...].reshape(bs * ws_ * w_, c)
    do = do_ref[...].reshape(bs * ws_ * w_, c)
    g = g_ref[0]
    h = _dot(t, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    h32 = h.astype(jnp.float32)
    hg = _gelu_exact(h32).astype(cdt)
    m = _dot(hg, w2_ref[...]).astype(cdt) + b2_ref[0].astype(cdt)
    _, xn, inv = _ln_f32(m.astype(jnp.float32), g, be_ref[0], eps)

    srow = _scale_rows(s_ref, bs, ws_ * w_)
    dy = do.astype(jnp.float32) * srow
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dm = _ln_bwd(dy, xn, inv, g)
    dm_lo = dm.astype(cdt)
    dw2_ref[...] += _dot(hg, dm_lo, (((0,), (0,)), ((), ())))
    db2_ref[...] += jnp.sum(dm, axis=0, keepdims=True)
    dhg = _dot(dm_lo, w2_ref[...], (((1,), (1,)), ((), ())))
    dh = dhg * _gelu_exact_grad(h32)
    dh_lo = dh.astype(cdt)
    dw1_ref[...] += _dot(t, dh_lo, (((0,), (0,)), ((), ())))
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dt = _dot(dh_lo, w1_ref[...], (((1,), (1,)), ((), ())))
    dx_ref[...] = (do.astype(jnp.float32) + dt.astype(jnp.float32)).astype(
        cdt
    ).reshape(bs, ws_, w_, c)


def _pn_mlp_call_args(x, w1, b1, w2, b2, g, be, s, window_size):
    from trainner_redux_tpu.ops.pallas.fused_block import _mlp_bsub

    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    bsub = _mlp_bsub(b, hh, ww, c, hidden, ws, dtype_bytes=x.dtype.itemsize)
    ins = (
        x,
        w1.astype(x.dtype),
        b1.astype(jnp.float32).reshape(1, hidden),
        w2.astype(x.dtype),
        b2.astype(jnp.float32).reshape(1, c),
        g.astype(jnp.float32).reshape(1, c),
        be.astype(jnp.float32).reshape(1, c),
        s.astype(jnp.float32).reshape(b, 1),
    )
    specs = [
        _strip_spec(ws, ww, c, bsub),
        _full_spec((c, hidden)),
        _row_spec(hidden),
        _full_spec((hidden, c)),
        _row_spec(c),
        _row_spec(c),
        _row_spec(c),
        _full_spec((b, 1), pltpu.SMEM),
    ]
    return ins, specs, (hh // ws, b // bsub), bsub


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_postnorm_mlp(x, w1, b1, w2, b2, g, be, s, window_size, eps=1e-5,
                       interpret=False):
    """out (B,H,W,C) = x + s[b] * LN(fc2(gelu(fc1(x)))) — SwinV2 post-norm."""
    return _pn_mlp_fwd_impl(x, w1, b1, w2, b2, g, be, s, window_size, eps,
                            interpret)


def _pn_mlp_fwd_impl(x, w1, b1, w2, b2, g, be, s, window_size, eps,
                     interpret):
    ins, specs, grid, bsub = _pn_mlp_call_args(
        x, w1, b1, w2, b2, g, be, s, window_size
    )
    return pl.pallas_call(
        functools.partial(_pn_mlp_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=_strip_spec(window_size, x.shape[2], x.shape[3], bsub),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_postnorm_mlp_fwd",
    )(*ins)


def _pn_mlp_fwd(x, w1, b1, w2, b2, g, be, s, window_size, eps, interpret):
    out = _pn_mlp_fwd_impl(x, w1, b1, w2, b2, g, be, s, window_size, eps,
                           interpret)
    return out, (x, w1, b1, w2, b2, g, be, s)


def _pn_mlp_bwd(window_size, eps, interpret, res, do):
    x, w1, b1, w2, b2, g, be, s = res
    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    f32 = jnp.float32
    ins, specs, grid, bsub = _pn_mlp_call_args(
        x, w1, b1, w2, b2, g, be, s, window_size
    )
    dx, dw1, db1, dw2, db2, dg, dbe = pl.pallas_call(
        functools.partial(_pn_mlp_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((c, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        grid=grid,
        in_specs=specs + [_strip_spec(ws, ww, c, bsub)],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _full_spec((c, hidden)), _row_spec(hidden),
            _full_spec((hidden, c)), _row_spec(c),
            _row_spec(c), _row_spec(c),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_postnorm_mlp_bwd",
    )(*ins, do)
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.reshape(hidden).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(c).astype(b2.dtype),
        dg.reshape(c).astype(g.dtype),
        dbe.reshape(c).astype(be.dtype),
        jnp.zeros_like(s),
    )


fused_postnorm_mlp.defvjp(_pn_mlp_fwd, _pn_mlp_bwd)
