"""Pallas TPU kernels: fully-fused pre-LN transformer block halves.

Why: the round-3/4 HLO byte attribution (scripts/benchmarking/hlo_bytes.py,
docs/perf/hlo_bytes_swinir_m_*.json) showed the SwinIR-M b8 forward moves
~19.8 GB of HBM traffic against a ~0.9 GB intrinsic need: every LayerNorm,
qkv projection, attention output, proj, and MLP hidden state makes a full
HBM round trip between matmuls, and XLA cannot fuse across matmul
boundaries. These kernels keep one window-row strip resident in VMEM and
run the whole block half in one pass:

  fused_attn_block : z  = x + s*( proj( window-MHSA( qkv( LN1(x) ) ) ) )
  fused_ln_mlp     : out = z + s*( fc2( gelu( fc1( LN2(z) ) ) ) )

`s` is the per-sample DropPath keep scale (0 or 1/keep; ones when rate=0 or
eval). Per block the residual stream makes exactly two round trips
(~47 MB at SwinIR-M b8 geometry) instead of ~380 MB.

Both kernels carry recompute-based custom VJPs: backward saves only the
block input + params, re-derives every intermediate in VMEM (flash-attention
style for the MHSA half, reusing window_attention.py's group-tiled math) and
accumulates parameter gradients into never-moving full-array output blocks
across the (strip, batch) grid — the accumulation pattern proven by
window_attention.py's dbias.

Layout contract mirrors window_attention.py: x is NHWC (B, H, W, C) with H
a multiple of window_size; the grid is (H/ws, B) over (1, ws, W, C) strips.
Cyclic shifts stay outside (jnp.roll by the caller) — LN/Dense/MLP are
per-token so the whole block commutes with the roll.

Reference semantics: /root/reference/traiNNer/archs/swinir_arch.py:139-229
(SwinTransformerBlock: norm1/attn/drop_path + norm2/mlp chains).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trainner_redux_tpu.ops.pallas.window_attention import (
    _bias_tile,
    _gather_windows,
    _head_qkv,
    _scatter_windows,
    _window_groups,
)

_VMEM_LIMIT = 64 * 1024 * 1024


def fused_block_interpret() -> bool:
    """True when TRAINNER_FUSED_BLOCK=interpret: run the kernels through the
    Pallas interpreter (CPU), used by the module-level equivalence tests."""
    import os

    return os.environ.get("TRAINNER_FUSED_BLOCK", "1") == "interpret"


def fused_block_supported(
    h: int,
    w: int,
    window_size: int,
    channels: int,
    num_heads: int,
    hidden: int,
    dtype_bytes: int = 2,
) -> bool:
    """Gate for the fused block kernels: TPU backend, window-aligned dims,
    and strip + parameter + scratch footprint within VMEM. Respects
    TRAINNER_FUSED_BLOCK=0 (and TRAINNER_FUSED_ATTN=0) as off switches."""
    import os

    mode = os.environ.get("TRAINNER_FUSED_BLOCK", "1")
    if mode == "0":
        return False
    if os.environ.get("TRAINNER_FUSED_ATTN", "1") == "0":
        return False
    if mode != "interpret":
        try:
            if jax.default_backend() != "tpu":
                return False
        except Exception:
            return False
    if h % window_size or w % window_size:
        return False
    n = window_size * window_size
    t = window_size * w  # tokens per strip
    c = channels
    # strips (x, z, dz, dqkv scratch) + params (qkv dominates) + fp32 tile
    # temps + grad accumulators, with 2x headroom for Mosaic double-buffering.
    # The train path additionally saves per-window P tiles + the attention
    # output per strip (fused_attn_block_train).
    p_save = (w // window_size) * num_heads * n * n * dtype_bytes
    strips = t * (3 * c * 4 + 2 * c * dtype_bytes * 3) + p_save + t * c * dtype_bytes
    params = (c * 3 * c + c * c + 2 * c * hidden) * dtype_bytes * 2
    acc = (c * 3 * c + c * c + 2 * c * hidden) * 4
    bias = 4 * num_heads * n * n * 4
    tiles = 4 * 128 * max(n, hidden, 128) * 16
    return (strips + params + acc + 2 * bias + tiles) * 2 <= _VMEM_LIMIT


def _backend_ok() -> bool:
    import os

    mode = os.environ.get("TRAINNER_FUSED_BLOCK", "1")
    if mode == "0" or os.environ.get("TRAINNER_FUSED_ATTN", "1") == "0":
        return False
    if mode == "interpret":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fused_mlp_supported(
    h: int, w: int, rows: int, channels: int, hidden: int,
    dtype_bytes: int = 2,
) -> bool:
    """Gate for fused_ln_mlp alone (archs whose attention half differs but
    whose pre-LN MLP matches): strip + params + fp32 temps within VMEM."""
    if not _backend_ok():
        return False
    if rows <= 0 or h % rows:
        return False
    t = rows * w
    footprint = (
        t * (2 * channels * dtype_bytes + channels * 4 + hidden * 4 * 2)
        + 2 * channels * hidden * (dtype_bytes + 4)
    )
    return footprint * 2 <= _VMEM_LIMIT


def _ln_f32(t32, g, b, eps):
    """LayerNorm over the last axis, all fp32 in VMEM. Returns (y, xn, inv)
    where xn is the normalized pre-affine value and inv = 1/sqrt(var+eps)."""
    mu = jnp.mean(t32, axis=-1, keepdims=True)
    xc = t32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xn = xc * inv
    return xn * g + b, xn, inv


def _ln_bwd(dy32, xn, inv, g):
    """Gradient of LayerNorm wrt its input, given upstream dy (fp32)."""
    dxn = dy32 * g
    m1 = jnp.mean(dxn, axis=-1, keepdims=True)
    m2 = jnp.mean(dxn * xn, axis=-1, keepdims=True)
    return inv * (dxn - m1 - xn * m2)


def _erf(x32):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — far below
    bf16 resolution): Mosaic has no erf lowering, so the exact-gelu chain
    builds it from exp."""
    ax = jnp.abs(x32)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x32) * y


def _gelu_exact(x32):
    return 0.5 * x32 * (1.0 + _erf(x32 * (2.0**-0.5)))


def _gelu_exact_grad(x32):
    cdf = 0.5 * (1.0 + _erf(x32 * (2.0**-0.5)))
    pdf = jnp.exp(-0.5 * x32 * x32) * 0.3989422804014327
    return cdf + x32 * pdf


def _dot(a, b, dims=(((1,), (0,)), ((), ()))):
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Kernel B: z -> z + s * fc2(gelu(fc1(LN2(z))))
#
# Both kernels are BATCH-BLOCKED: the grid is (H/ws, B/bsub) over
# (bsub, ws, W, C) blocks. bsub > 1 (picked by VMEM fit, usually the whole
# batch) merges samples into one program so the LN/qkv/proj/MLP matmuls run
# at bsub x the rows — measured on-chip, the per-sample grid spent most of
# its time in per-program overhead, not math (see
# scripts/benchmarking/bench_block_kernel.py).
# ---------------------------------------------------------------------------


def _mlp_fwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    s_ref, o_ref, *, eps):
    bs, ws_, w_, c = x_ref.shape
    cdt = x_ref.dtype
    t = x_ref[...].reshape(bs * ws_ * w_, c)
    y32, _, _ = _ln_f32(t.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    y = y32.astype(cdt)
    h = _dot(y, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    hg = _gelu_exact(h.astype(jnp.float32)).astype(cdt)
    m = _dot(hg, w2_ref[...]).astype(cdt) + b2_ref[0].astype(cdt)
    srow = _scale_rows(s_ref, bs, ws_ * w_).astype(cdt)  # (bs*t, 1)
    o_ref[...] = (t + srow * m).reshape(bs, ws_, w_, c)


def _mlp_bwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    s_ref, do_ref,
                    dx_ref, dg_ref, dbe_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, *, eps):
    bs, ws_, w_, c = x_ref.shape
    cdt = x_ref.dtype
    i, b = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (b == 0))
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    t = x_ref[...].reshape(bs * ws_ * w_, c)
    do = do_ref[...].reshape(bs * ws_ * w_, c)
    g = g_ref[0]
    # recompute forward intermediates (mirroring fwd quantization points)
    y32, xn, inv = _ln_f32(t.astype(jnp.float32), g, be_ref[0], eps)
    y = y32.astype(cdt)
    h = _dot(y, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    h32 = h.astype(jnp.float32)
    hg = _gelu_exact(h32).astype(cdt)

    srow = _scale_rows(s_ref, bs, ws_ * w_)  # (bs*t, 1) fp32
    dm = do.astype(jnp.float32) * srow
    dm_lo = dm.astype(cdt)
    dw2_ref[...] += _dot(hg, dm_lo, (((0,), (0,)), ((), ())))
    db2_ref[...] += jnp.sum(dm, axis=0, keepdims=True)
    dhg = _dot(dm_lo, w2_ref[...], (((1,), (1,)), ((), ())))
    dh = dhg * _gelu_exact_grad(h32)
    dh_lo = dh.astype(cdt)
    dw1_ref[...] += _dot(y, dh_lo, (((0,), (0,)), ((), ())))
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dy = _dot(dh_lo, w1_ref[...], (((1,), (1,)), ((), ())))
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dt = _ln_bwd(dy, xn, inv, g)
    dx_ref[...] = (do.astype(jnp.float32) + dt).astype(cdt).reshape(
        bs, ws_, w_, c
    )


def _strip_spec(ws, w, ch, bsub=1):
    return pl.BlockSpec(
        (bsub, ws, w, ch), lambda i, bb: (bb, i, 0, 0), memory_space=pltpu.VMEM
    )


def _full_spec(shape, space=pltpu.VMEM):
    return pl.BlockSpec(shape, lambda i, bb: (0,) * len(shape), memory_space=space)


def _row_spec(n):
    return _full_spec((1, n))


def _scale_rows(s_ref, bs: int, t: int):
    """(bs*t, 1) fp32 column of per-sample DropPath keep scales.

    Assembled from SMEM scalars via splats: Mosaic cannot lower a
    (bsub, 1, 1) VECTOR broadcast into both sublanes and lanes
    ("Broadcast in both sublanes and lanes", observed on v5e), but a
    dynamic SMEM scalar splat to (t, 1) is supported. The unrolled
    concatenate emits O(bsub) Mosaic ops; bsub is bounded by the train
    batch per chip (<= 32 in every shipped config), so code size stays
    trivial (ADVICE r4, low)."""
    b0 = pl.program_id(1) * bs
    return jnp.concatenate(
        [
            jnp.full((t, 1), s_ref[b0 + bb, 0], jnp.float32)
            for bb in range(bs)
        ],
        axis=0,
    )


def _pick_bsub(b: int, per_sample_bytes: float, fixed_bytes: float) -> int:
    """Largest divisor of b whose working set fits in half the VMEM budget
    (the other half is headroom for Mosaic's block double-buffering)."""
    import os

    forced = os.environ.get("TRAINNER_FUSED_BM_BSUB")
    if forced:
        try:
            want = max(1, min(b, int(forced)))
        except ValueError:
            want = 0  # non-numeric override: fall through to auto-pick
        if want:
            # snap DOWN to a divisor of b: a non-divisor bsub would make the
            # grid drop b % bsub samples silently (ADVICE r4, medium)
            while b % want:
                want -= 1
            return want
    budget = _VMEM_LIMIT / 2
    for cand in range(b, 0, -1):
        if b % cand:
            continue
        if fixed_bytes + cand * per_sample_bytes <= budget:
            return cand
    return 1


def _mlp_bsub(b, hh, ww, c, hidden, window_size, dtype_bytes=2) -> int:
    t = window_size * ww  # tokens per window-row strip per sample
    # per sample: x/do/dx strips (cdt) + fp32 LN temps + fp32 MLP hidden x2
    per = t * (3 * c * dtype_bytes + 3 * c * 4 + 2 * hidden * 4)
    fixed = 2 * c * hidden * (dtype_bytes + 4) + 4 * c * 4
    return _pick_bsub(b, per, fixed)


def _attn_bsub(b, hh, ww, c, num_heads, window_size, kinds,
               dtype_bytes=2) -> int:
    ws = window_size
    t = ws * ww
    n = ws * ws
    # per sample: x/do/dx strips + qkv + att/dqkv scratch (cdt) + fp32 LN/dy
    per = t * (
        (3 * c + 3 * c + c + 3 * c) * dtype_bytes + (3 * c + 3 * c) * 4
    )
    fixed = (
        (c * 3 * c + c * c) * (dtype_bytes + 4)  # weights + grad accums
        + 2 * kinds * num_heads * n * n * 4  # bias table + dbias
        + 4 * 128 * max(n, 128) * 16  # attention tile temps
    )
    return _pick_bsub(b, per, fixed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ln_mlp(x, g, be, w1, b1, w2, b2, s, window_size, eps=1e-5,
                 interpret=False):
    """out (B,H,W,C) = x + s[b] * fc2(gelu(fc1(LN(x)))).

    g/be: (C,) fp32 LayerNorm affine. w1 (C,hidden), b1 (hidden,),
    w2 (hidden,C), b2 (C,) in the compute dtype. s: (B,) fp32 per-sample
    DropPath keep scale (use ones for eval / rate 0; its cotangent is not
    produced — it is RNG-derived, never optimized)."""
    return _mlp_fwd_impl(x, g, be, w1, b1, w2, b2, s, window_size, eps,
                         interpret)


def _mlp_call_args(x, g, be, w1, b1, w2, b2, s, window_size):
    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    bsub = _mlp_bsub(b, hh, ww, c, hidden, ws,
                     dtype_bytes=x.dtype.itemsize)
    ins = (
        x,
        g.astype(jnp.float32).reshape(1, c),
        be.astype(jnp.float32).reshape(1, c),
        w1.astype(x.dtype),
        b1.astype(jnp.float32).reshape(1, hidden),
        w2.astype(x.dtype),
        b2.astype(jnp.float32).reshape(1, c),
        s.astype(jnp.float32).reshape(b, 1),
    )
    specs = [
        _strip_spec(ws, ww, c, bsub),
        _row_spec(c),
        _row_spec(c),
        _full_spec((c, hidden)),
        _row_spec(hidden),
        _full_spec((hidden, c)),
        _row_spec(c),
        _full_spec((b, 1), pltpu.SMEM),
    ]
    return ins, specs, (hh // ws, b // bsub), bsub


def _mlp_fwd_impl(x, g, be, w1, b1, w2, b2, s, window_size, eps, interpret):
    b, hh, ww, c = x.shape
    ins, specs, grid, bsub = _mlp_call_args(
        x, g, be, w1, b1, w2, b2, s, window_size
    )
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=specs,
        out_specs=_strip_spec(window_size, ww, c, bsub),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_ln_mlp_fwd",
    )(*ins)


def _mlp_fwd(x, g, be, w1, b1, w2, b2, s, window_size, eps, interpret):
    out = _mlp_fwd_impl(x, g, be, w1, b1, w2, b2, s, window_size, eps,
                        interpret)
    return out, (x, g, be, w1, b1, w2, b2, s)


def _mlp_bwd(window_size, eps, interpret, res, do):
    x, g, be, w1, b1, w2, b2, s = res
    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    ins, specs, grid, bsub = _mlp_call_args(
        x, g, be, w1, b1, w2, b2, s, window_size
    )
    f32 = jnp.float32
    dx, dg, dbe, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        grid=grid,
        in_specs=specs + [_strip_spec(ws, ww, c, bsub)],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _row_spec(c), _row_spec(c),
            _full_spec((c, hidden)), _row_spec(hidden),
            _full_spec((hidden, c)), _row_spec(c),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_ln_mlp_bwd",
    )(*ins, do)
    return (
        dx,
        dg.reshape(c).astype(g.dtype),
        dbe.reshape(c).astype(be.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(hidden).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(c).astype(b2.dtype),
        jnp.zeros_like(s),
    )


fused_ln_mlp.defvjp(_mlp_fwd, _mlp_bwd)


# ---------------------------------------------------------------------------
# Kernel A: x -> x + s * proj(window-MHSA(qkv(LN1(x))))
# ---------------------------------------------------------------------------


def _scatter_windows_b(ref, tile, bb, group, ws: int, cols: int):
    """Scatter a (len(group)*n, cols) window tile into sample bb of a
    (bsub, ws, W, cols) ref."""
    n = ws * ws
    for idx, j in enumerate(group):
        ref[bb, :, j * ws : (j + 1) * ws, :] = tile[
            idx * n : (idx + 1) * n
        ].reshape(ws, ws, cols)


def _attn_block_fwd_kernel(x_ref, g_ref, be_ref, wq_ref, bq_ref, wp_ref,
                           bp_ref, bias_ref, s_ref, o_ref, att_ref,
                           *, nh, hd, ws, w, scale, nwh, kinds, eps):
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    is_bottom = pl.program_id(0) == nwh - 1

    t = x_ref[...].reshape(bs * ws * w, c)
    y32, _, _ = _ln_f32(t.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            outs = []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                # transposed softmax (see _swin_block_fwd_kernel): bias_ref
                # arrives TRANSPOSED from the impl
                s_t = _dot(k, q, (((1,), (1,)), ((), ())))
                s_t = s_t * scale + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
                m = jnp.max(s_t)
                p_t = jnp.exp(s_t - m)
                l = jnp.maximum(
                    jnp.sum(p_t, axis=0, keepdims=True), 1e-30
                )
                p_lo = (p_t / l).astype(cdt)
                outs.append(
                    _dot(p_lo, v, (((0,), (0,)), ((), ()))).astype(cdt)
                )
            _scatter_windows_b(att_ref, jnp.concatenate(outs, axis=-1),
                               bb, group, ws, c)
    att_t = att_ref[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    srow = _scale_rows(s_ref, bs, ws * w).astype(cdt)  # (bs*t, 1)
    o_ref[...] = (t + srow * proj).reshape(bs, ws, w, c)


def _attn_block_bwd_kernel(
    x_ref, g_ref, be_ref, wq_ref, bq_ref, wp_ref, bp_ref, bias_ref, s_ref,
    do_ref,
    dx_ref, dg_ref, dbe_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref, dbias_ref,
    att_scratch, dqkv_scratch,
    *, nh, hd, ws, w, scale, nwh, kinds, eps,
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
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    t = x_ref[...].reshape(bs * ws * w, c)
    do_t = do_ref[...].reshape(bs * ws * w, c)
    g = g_ref[0]
    y32, xn, inv = _ln_f32(t.astype(jnp.float32), g, be_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    srow = _scale_rows(s_ref, bs, ws * w)  # (bs*t, 1) fp32
    dz32 = do_t.astype(jnp.float32) * srow
    dz_lo = dz32.astype(cdt)
    dbp_ref[...] += jnp.sum(dz32, axis=0, keepdims=True)
    # datt needs only Wp, so it can lead the single recompute loop below:
    # each head's S/softmax is built ONCE and used for BOTH the attention
    # output (-> att_scratch, consumed by dWp afterwards) and the grads
    datt = _dot(dz_lo, wp_ref[...], (((1,), (1,)), ((), ()))).astype(
        cdt
    ).reshape(bs, ws, w, c)

    # dbias accumulates in VMEM temporaries across the unrolled loops (a
    # single output write at the end) instead of per-window ref +=
    dbias_acc = [
        [jnp.zeros((n, n), jnp.float32) for _ in range(nh)]
        for _ in range(kinds)
    ]
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            da_tile = _gather_windows(datt[bb], group, ws, c)
            outs, head_dq, head_dk, head_dv = [], [], [], []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                doh = da_tile[:, h * hd : (h + 1) * hd].astype(jnp.float32)
                # transposed softmax recompute (bias_ref arrives TRANSPOSED
                # from the impl; every reduction lands on sublanes)
                s_t = _dot(k, q, (((1,), (1,)), ((), ())))
                s_t = s_t * scale + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
                m = jnp.max(s_t)
                p_t = jnp.exp(s_t - m)
                l = jnp.maximum(
                    jnp.sum(p_t, axis=0, keepdims=True), 1e-30
                )
                p = p_t / l
                p_lo = p.astype(cdt)
                outs.append(
                    _dot(p_lo, v, (((0,), (0,)), ((), ()))).astype(cdt)
                )
                dv = _dot(p_lo, doh.astype(cdt))
                dp_t = _dot(v, doh.astype(cdt), (((1,), (1,)), ((), ())))
                ds_t = p * (dp_t - jnp.sum(dp_t * p, axis=0, keepdims=True))
                for a, j in enumerate(group):
                    blk = ds_t[a * n : (a + 1) * n, a * n : (a + 1) * n]
                    if kinds == 1:
                        dbias_acc[0][h] += blk
                    else:
                        base = 1 if j == nww - 1 else 0
                        zero = jnp.zeros_like(blk)
                        dbias_acc[base][h] += jnp.where(is_bottom, zero, blk)
                        dbias_acc[base + 2][h] += jnp.where(
                            is_bottom, blk, zero
                        )
                ds_lo = (ds_t * scale).astype(cdt)
                dq = _dot(ds_lo, k, (((0,), (0,)), ((), ())))
                dk = _dot(ds_lo, q)
                head_dq.append(dq.astype(cdt))
                head_dk.append(dk.astype(cdt))
                head_dv.append(dv.astype(cdt))
            _scatter_windows_b(
                att_scratch, jnp.concatenate(outs, axis=-1), bb, group, ws, c
            )
            dtile = jnp.concatenate(head_dq + head_dk + head_dv, axis=-1)
            # scatter the (g*n, 3C) qkv grad back to strip token order
            for a, j in enumerate(group):
                dqkv_scratch[bb, :, j * ws : (j + 1) * ws, :] = dtile[
                    a * n : (a + 1) * n
                ].reshape(ws, ws, 3 * c)

    dbias_ref[...] += jnp.stack(
        [jnp.stack(row) for row in dbias_acc]
    )
    att_t = att_scratch[...].reshape(bs * ws * w, c)
    dwp_ref[...] += _dot(att_t, dz_lo, (((0,), (0,)), ((), ())))
    dqkv = dqkv_scratch[...].reshape(bs * ws * w, 3 * c)
    dqkv32 = dqkv.astype(jnp.float32)
    dwq_ref[...] += _dot(y, dqkv, (((0,), (0,)), ((), ())))
    dbq_ref[...] += jnp.sum(dqkv32, axis=0, keepdims=True)
    dy = _dot(dqkv, wq_ref[...], (((1,), (1,)), ((), ())))
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dt = _ln_bwd(dy, xn, inv, g)
    dx_ref[...] = (do_t.astype(jnp.float32) + dt).astype(cdt).reshape(
        bs, ws, w, c
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_attn_block(x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim,
                     window_size, eps=1e-5, interpret=False):
    """z (B,H,W,C) = x + s[b] * proj(window-MHSA(qkv(LN(x)), bias)).

    bias: (K, nh, n, n) fp32 kind table (relative-position bias + shift mask,
    see window_attention.shift_mask_kinds). s: (B,) fp32 DropPath keep scale
    (cotangent not produced — RNG-derived). Cyclic shift is the caller's
    job: pass x already rolled and unroll z (the block is per-token outside
    attention, so it commutes with the roll)."""
    return _attn_fwd_impl(x, g, be, wq, bq, wp, bp, bias, s, num_heads,
                          head_dim, window_size, eps, interpret)


def _attn_call_args(x, g, be, wq, bq, wp, bp, bias, s, window_size,
                    num_heads):
    b, hh, ww, c = x.shape
    ws = window_size
    bsub = _attn_bsub(b, hh, ww, c, num_heads, ws, bias.shape[0],
                      dtype_bytes=x.dtype.itemsize)
    ins = (
        x,
        g.astype(jnp.float32).reshape(1, c),
        be.astype(jnp.float32).reshape(1, c),
        wq.astype(x.dtype),
        bq.astype(jnp.float32).reshape(1, 3 * c),
        wp.astype(x.dtype),
        bp.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32),
        s.astype(jnp.float32).reshape(b, 1),
    )
    specs = [
        _strip_spec(ws, ww, c, bsub),
        _row_spec(c),
        _row_spec(c),
        _full_spec((c, 3 * c)),
        _row_spec(3 * c),
        _full_spec((c, c)),
        _row_spec(c),
        _full_spec(bias.shape),
        _full_spec((b, 1), pltpu.SMEM),
    ]
    return ins, specs, (hh // ws, b // bsub), bsub


def _attn_fwd_impl(x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim,
                   window_size, eps, interpret):
    b, hh, ww, c = x.shape
    ws = window_size
    kernel = functools.partial(
        _attn_block_fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        scale=head_dim**-0.5, nwh=hh // ws, kinds=bias.shape[0], eps=eps,
    )
    # the kernel computes S^T (transposed softmax) and reads bias^T
    ins, specs, grid, bsub = _attn_call_args(
        x, g, be, wq, bq, wp, bp, bias.transpose(0, 1, 3, 2), s, ws,
        num_heads
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
        name="fused_attn_block_fwd",
    )(*ins)


def _attn_fwd(x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim,
              window_size, eps, interpret):
    z = _attn_fwd_impl(x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim,
                       window_size, eps, interpret)
    return z, (x, g, be, wq, bq, wp, bp, bias, s)


def _attn_bwd(num_heads, head_dim, window_size, eps, interpret, res, do):
    x, g, be, wq, bq, wp, bp, bias, s = res
    b, hh, ww, c = x.shape
    ws = window_size
    n = ws * ws
    kinds = bias.shape[0]
    f32 = jnp.float32
    kernel = functools.partial(
        _attn_block_bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        scale=head_dim**-0.5, nwh=hh // ws, kinds=kinds, eps=eps,
    )
    # transposed-softmax recompute: kernel reads bias^T, emits d(bias^T)
    ins, specs, grid, bsub = _attn_call_args(
        x, g, be, wq, bq, wp, bp, bias.transpose(0, 1, 3, 2), s, ws,
        num_heads
    )
    dx, dg, dbe, dwq, dbq, dwp, dbp, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), f32),
        ),
        grid=grid,
        in_specs=specs + [_strip_spec(ws, ww, c, bsub)],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _row_spec(c), _row_spec(c),
            _full_spec((c, 3 * c)), _row_spec(3 * c),
            _full_spec((c, c)), _row_spec(c),
            _full_spec((kinds, num_heads, n, n)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsub, ws, ww, c), x.dtype),
            pltpu.VMEM((bsub, ws, ww, 3 * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_attn_block_bwd",
    )(*ins, do)
    return (
        dx,
        dg.reshape(c).astype(g.dtype),
        dbe.reshape(c).astype(be.dtype),
        dwq.astype(wq.dtype),
        dbq.reshape(3 * c).astype(bq.dtype),
        dwp.astype(wp.dtype),
        dbp.reshape(c).astype(bp.dtype),
        dbias.transpose(0, 1, 3, 2).astype(bias.dtype),
        jnp.zeros_like(s),
    )


fused_attn_block.defvjp(_attn_fwd, _attn_bwd)


# ---------------------------------------------------------------------------
# Kernel A-train: forward that SAVES the softmax probabilities P (per-window
# (n, n) tiles, compute dtype) and the attention output, so the backward
# runs 4 MXU products per window-head unit (dV, dP, dQ, dK) instead of the
# recompute path's 6 (S, PV, dV, dP, dQ, dK) and skips the softmax
# max/exp/sum chain entirely. Measured motivation: the recompute backward
# was 58.8 ms of the 99 ms SwinIR-M step (docs/perf/
# components_swinir_m_bwd.json); P+att round-trip ~3.2 ms/step of HBM.
# P is exact zeros off the window diagonal (the -1e9 cross-window bias
# underflows exp), so per-window saving loses nothing. In fp32 parity mode
# the compute dtype is fp32 and the saved-P gradients are bit-comparable to
# the recompute path.
# ---------------------------------------------------------------------------


def _attn_block_fwd_train_kernel(
    x_ref, g_ref, be_ref, wq_ref, bq_ref, wp_ref, bp_ref, bias_ref, s_ref,
    o_ref, p_ref, att_ref,
    *, nh, hd, ws, w, scale, nwh, kinds, eps,
):
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    is_bottom = pl.program_id(0) == nwh - 1

    t = x_ref[...].reshape(bs * ws * w, c)
    y32, _, _ = _ln_f32(t.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            outs = []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                sc = _dot(q, k, (((1,), (1,)), ((), ())))
                sc = sc * scale + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
                m = jnp.max(sc, axis=-1, keepdims=True)
                p = jnp.exp(sc - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                p_lo = p.astype(cdt)
                for a, j in enumerate(group):
                    p_ref[bb, 0, j, h] = p_lo[
                        a * n : (a + 1) * n, a * n : (a + 1) * n
                    ]
                outs.append(_dot(p_lo, v).astype(cdt))
            _scatter_windows_b(att_ref, jnp.concatenate(outs, axis=-1),
                               bb, group, ws, c)
    att_t = att_ref[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    srow = _scale_rows(s_ref, bs, ws * w).astype(cdt)
    o_ref[...] = (t + srow * proj).reshape(bs, ws, w, c)


def _attn_block_bwd_saved_kernel(
    x_ref, g_ref, be_ref, wq_ref, bq_ref, wp_ref, bp_ref, s_ref, p_in_ref,
    att_in_ref, do_ref,
    dx_ref, dg_ref, dbe_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref, dbias_ref,
    dqkv_scratch,
    *, nh, hd, ws, w, scale, nwh, kinds, eps,
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
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        dwq_ref[...] = jnp.zeros_like(dwq_ref)
        dbq_ref[...] = jnp.zeros_like(dbq_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    t = x_ref[...].reshape(bs * ws * w, c)
    do_t = do_ref[...].reshape(bs * ws * w, c)
    g = g_ref[0]
    # recompute LN + qkv only (big well-shaped matmuls; S/softmax/PV come
    # from the saved tensors)
    y32, xn, inv = _ln_f32(t.astype(jnp.float32), g, be_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    srow = _scale_rows(s_ref, bs, ws * w)
    dz32 = do_t.astype(jnp.float32) * srow
    dz_lo = dz32.astype(cdt)
    dbp_ref[...] += jnp.sum(dz32, axis=0, keepdims=True)
    datt = _dot(dz_lo, wp_ref[...], (((1,), (1,)), ((), ()))).astype(
        cdt
    ).reshape(bs, ws, w, c)

    dbias_acc = [
        [jnp.zeros((n, n), jnp.float32) for _ in range(nh)]
        for _ in range(kinds)
    ]
    zero_off = jnp.zeros((n, n), cdt)
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            da_tile = _gather_windows(datt[bb], group, ws, c)
            head_dq, head_dk, head_dv = [], [], []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                doh = da_tile[:, h * hd : (h + 1) * hd].astype(jnp.float32)
                # saved per-window P -> block-diagonal group tile (the
                # cross-window entries are exact zeros by construction)
                gsz = len(group)
                if gsz == 1:
                    p_lo = p_in_ref[bb, 0, group[0], h]
                else:
                    rows = []
                    for a, j in enumerate(group):
                        blk = p_in_ref[bb, 0, j, h]
                        rows.append(jnp.concatenate(
                            [blk if bcol == a else zero_off
                             for bcol in range(gsz)], axis=1
                        ))
                    p_lo = jnp.concatenate(rows, axis=0)
                p = p_lo.astype(jnp.float32)
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
                ds_lo = (ds * scale).astype(cdt)
                head_dq.append(_dot(ds_lo, k).astype(cdt))
                head_dk.append(
                    _dot(ds_lo, q, (((0,), (0,)), ((), ()))).astype(cdt)
                )
                head_dv.append(dv.astype(cdt))
            dtile = jnp.concatenate(head_dq + head_dk + head_dv, axis=-1)
            for a, j in enumerate(group):
                dqkv_scratch[bb, :, j * ws : (j + 1) * ws, :] = dtile[
                    a * n : (a + 1) * n
                ].reshape(ws, ws, 3 * c)

    dbias_ref[...] += jnp.stack([jnp.stack(row) for row in dbias_acc])
    att_t = att_in_ref[...].reshape(bs * ws * w, c)
    dwp_ref[...] += _dot(att_t, dz_lo, (((0,), (0,)), ((), ())))
    dqkv = dqkv_scratch[...].reshape(bs * ws * w, 3 * c)
    dqkv32 = dqkv.astype(jnp.float32)
    dwq_ref[...] += _dot(y, dqkv, (((0,), (0,)), ((), ())))
    dbq_ref[...] += jnp.sum(dqkv32, axis=0, keepdims=True)
    dy = _dot(dqkv, wq_ref[...], (((1,), (1,)), ((), ())))
    dg_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dt = _ln_bwd(dy, xn, inv, g)
    dx_ref[...] = (do_t.astype(jnp.float32) + dt).astype(cdt).reshape(
        bs, ws, w, c
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_attn_block_train(x, g, be, wq, bq, wp, bp, bias, s, num_heads,
                           head_dim, window_size, eps=1e-5, interpret=False):
    """Training-path fused_attn_block: identical forward values, but the
    VJP consumes softmax probabilities + attention output SAVED by the
    forward instead of recomputing them (4 vs 6 MXU products per
    window-head unit in the backward). Use for train steps; eval paths
    should call fused_attn_block (no extra outputs)."""
    z, _, _ = _attn_fwd_train_impl(
        x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim, window_size,
        eps, interpret,
    )
    return z


def _attn_fwd_train_impl(x, g, be, wq, bq, wp, bp, bias, s, num_heads,
                         head_dim, window_size, eps, interpret):
    b, hh, ww, c = x.shape
    ws = window_size
    n = ws * ws
    nww = ww // ws
    kernel = functools.partial(
        _attn_block_fwd_train_kernel, nh=num_heads, hd=head_dim, ws=ws,
        w=ww, scale=head_dim**-0.5, nwh=hh // ws, kinds=bias.shape[0],
        eps=eps,
    )
    ins, specs, grid, bsub = _attn_call_args(
        x, g, be, wq, bq, wp, bp, bias, s, ws, num_heads
    )
    nwh = hh // ws
    z, p, att = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, nwh, nww, num_heads, n, n), x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ),
        grid=grid,
        in_specs=specs,
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            pl.BlockSpec(
                (bsub, 1, nww, num_heads, n, n),
                lambda i, bb: (bb, i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _strip_spec(ws, ww, c, bsub),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_attn_block_train_fwd",
    )(*ins)
    return z, p, att


def _attn_train_fwd(x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim,
                    window_size, eps, interpret):
    z, p, att = _attn_fwd_train_impl(
        x, g, be, wq, bq, wp, bp, bias, s, num_heads, head_dim, window_size,
        eps, interpret,
    )
    return z, (x, g, be, wq, bq, wp, bp, bias, s, p, att)


def _attn_train_bwd(num_heads, head_dim, window_size, eps, interpret, res,
                    do):
    x, g, be, wq, bq, wp, bp, bias, s, p, att = res
    b, hh, ww, c = x.shape
    ws = window_size
    n = ws * ws
    nww = ww // ws
    nwh = hh // ws
    kinds = bias.shape[0]
    f32 = jnp.float32
    kernel = functools.partial(
        _attn_block_bwd_saved_kernel, nh=num_heads, hd=head_dim, ws=ws,
        w=ww, scale=head_dim**-0.5, nwh=nwh, kinds=kinds, eps=eps,
    )
    ins, specs, grid, bsub = _attn_call_args(
        x, g, be, wq, bq, wp, bp, bias, s, ws, num_heads
    )
    # drop bias from the inputs (the saved-P backward never reads it)
    ins = ins[:7] + (ins[8],)
    specs = specs[:7] + [specs[8]]
    p_spec = pl.BlockSpec(
        (bsub, 1, nww, num_heads, n, n),
        lambda i, bb: (bb, i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    dx, dg, dbe, dwq, dbq, dwp, dbp, dbias = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), f32),
        ),
        grid=grid,
        in_specs=specs + [
            p_spec,
            _strip_spec(ws, ww, c, bsub),
            _strip_spec(ws, ww, c, bsub),
        ],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _row_spec(c), _row_spec(c),
            _full_spec((c, 3 * c)), _row_spec(3 * c),
            _full_spec((c, c)), _row_spec(c),
            _full_spec((kinds, num_heads, n, n)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsub, ws, ww, 3 * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_attn_block_train_bwd",
    )(*ins, p, att, do)
    return (
        dx,
        dg.reshape(c).astype(g.dtype),
        dbe.reshape(c).astype(be.dtype),
        dwq.astype(wq.dtype),
        dbq.reshape(3 * c).astype(bq.dtype),
        dwp.astype(wp.dtype),
        dbp.reshape(c).astype(bp.dtype),
        dbias.astype(bias.dtype),
        jnp.zeros_like(s),
    )


fused_attn_block_train.defvjp(_attn_train_fwd, _attn_train_bwd)


# ---------------------------------------------------------------------------
# Whole-block train kernel: BOTH halves (LN1+qkv+window-MHSA+proj+residual
# AND LN2+MLP+residual) in one pallas_call per direction, with the saved-P
# backward. Eliminates the inter-half z/do HBM round trips and halves the
# per-block kernel-call count (36 calls instead of 72 per direction).
# The mid-block residual z is saved for the backward (one write; the
# two-kernel form wrote AND re-read it).
# ---------------------------------------------------------------------------


def _swin_block_fwd_kernel(
    x_ref, g1_ref, be1_ref, wq_ref, bq_ref, wp_ref, bp_ref, bias_ref,
    g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
    o_ref, p_ref, att_ref, z_ref,
    *, nh, hd, ws, w, scale, nwh, kinds, eps,
):
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    is_bottom = pl.program_id(0) == nwh - 1

    t = x_ref[...].reshape(bs * ws * w, c)
    y32, _, _ = _ln_f32(t.astype(jnp.float32), g1_ref[0], be1_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            outs = []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                # TRANSPOSED softmax (measured: softmax was 74% of this
                # kernel's time, bench_block_kernel.py): S^T = k q^T puts
                # the normalization axis on SUBLANES, where the row-sum is
                # a ~18-op vreg tree instead of a ~112-op lane reduction;
                # the per-row max is replaced by the tile-scalar max (same
                # overflow guard; l is epsilon-floored against pathological
                # all-underflow columns).
                s_t = _dot(k, q, (((1,), (1,)), ((), ())))
                s_t = s_t * scale + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
                m = jnp.max(s_t)
                p_t = jnp.exp(s_t - m)
                l = jnp.maximum(
                    jnp.sum(p_t, axis=0, keepdims=True), 1e-30
                )
                p_t = p_t / l
                p_lo = p_t.astype(cdt)  # P^T, saved transposed
                for a, j in enumerate(group):
                    p_ref[bb, 0, j, h] = p_lo[
                        a * n : (a + 1) * n, a * n : (a + 1) * n
                    ]
                outs.append(
                    _dot(p_lo, v, (((0,), (0,)), ((), ()))).astype(cdt)
                )
            _scatter_windows_b(att_ref, jnp.concatenate(outs, axis=-1),
                               bb, group, ws, c)
    att_t = att_ref[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    srow1 = _scale_rows(s1_ref, bs, ws * w).astype(cdt)
    z = t + srow1 * proj
    z_ref[...] = z.reshape(bs, ws, w, c)

    y2_32, _, _ = _ln_f32(z.astype(jnp.float32), g2_ref[0], be2_ref[0], eps)
    y2 = y2_32.astype(cdt)
    h1 = _dot(y2, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    hg = _gelu_exact(h1.astype(jnp.float32)).astype(cdt)
    m2 = _dot(hg, w2_ref[...]).astype(cdt) + b2_ref[0].astype(cdt)
    srow2 = _scale_rows(s2_ref, bs, ws * w).astype(cdt)
    o_ref[...] = (z + srow2 * m2).reshape(bs, ws, w, c)


def _swin_block_bwd_kernel(
    x_ref, g1_ref, be1_ref, wq_ref, bq_ref, wp_ref, bp_ref,
    g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref, s1_ref, s2_ref,
    p_in_ref, att_in_ref, z_in_ref, do_ref,
    dx_ref, dg1_ref, dbe1_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref,
    dbias_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dqkv_scratch,
    *, nh, hd, ws, w, scale, nwh, kinds, eps,
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
        for r in (dg1_ref, dbe1_ref, dwq_ref, dbq_ref, dwp_ref, dbp_ref,
                  dbias_ref, dg2_ref, dbe2_ref, dw1_ref, db1_ref, dw2_ref,
                  db2_ref):
            r[...] = jnp.zeros_like(r)

    do_t = do_ref[...].reshape(bs * ws * w, c)
    z = z_in_ref[...].reshape(bs * ws * w, c)
    g2 = g2_ref[0]

    # ---- MLP half backward (recompute fc1/gelu from saved z) ----
    y2_32, xn2, inv2 = _ln_f32(z.astype(jnp.float32), g2, be2_ref[0], eps)
    y2 = y2_32.astype(cdt)
    h1 = _dot(y2, w1_ref[...]).astype(cdt) + b1_ref[0].astype(cdt)
    h32 = h1.astype(jnp.float32)
    hg = _gelu_exact(h32).astype(cdt)
    srow2 = _scale_rows(s2_ref, bs, ws * w)
    dm = do_t.astype(jnp.float32) * srow2
    dm_lo = dm.astype(cdt)
    dw2_ref[...] += _dot(hg, dm_lo, (((0,), (0,)), ((), ())))
    db2_ref[...] += jnp.sum(dm, axis=0, keepdims=True)
    dhg = _dot(dm_lo, w2_ref[...], (((1,), (1,)), ((), ())))
    dh = dhg * _gelu_exact_grad(h32)
    dh_lo = dh.astype(cdt)
    dw1_ref[...] += _dot(y2, dh_lo, (((0,), (0,)), ((), ())))
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dy2 = _dot(dh_lo, w1_ref[...], (((1,), (1,)), ((), ())))
    dg2_ref[...] += jnp.sum(dy2 * xn2, axis=0, keepdims=True)
    dbe2_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
    dz32 = do_t.astype(jnp.float32) + _ln_bwd(dy2, xn2, inv2, g2)

    # ---- attention half backward (saved P + att; recompute LN1+qkv) ----
    t = x_ref[...].reshape(bs * ws * w, c)
    g1 = g1_ref[0]
    y32, xn, inv = _ln_f32(t.astype(jnp.float32), g1, be1_ref[0], eps)
    y = y32.astype(cdt)
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    srow1 = _scale_rows(s1_ref, bs, ws * w)
    dzp32 = dz32 * srow1  # d wrt proj output
    dzp_lo = dzp32.astype(cdt)
    dbp_ref[...] += jnp.sum(dzp32, axis=0, keepdims=True)
    datt = _dot(dzp_lo, wp_ref[...], (((1,), (1,)), ((), ()))).astype(
        cdt
    ).reshape(bs, ws, w, c)

    dbias_acc = [
        [jnp.zeros((n, n), jnp.float32) for _ in range(nh)]
        for _ in range(kinds)
    ]
    zero_off = jnp.zeros((n, n), cdt)
    for bb in range(bs):
        for group in _window_groups(nww, n):
            tile = _gather_windows(qkv[bb], group, ws, 3 * c)
            da_tile = _gather_windows(datt[bb], group, ws, c)
            head_dq, head_dk, head_dv = [], [], []
            for h in range(nh):
                q, k, v = _head_qkv(tile, h, nh, hd)
                doh = da_tile[:, h * hd : (h + 1) * hd].astype(jnp.float32)
                gsz = len(group)
                if gsz == 1:
                    p_lo = p_in_ref[bb, 0, group[0], h]
                else:
                    rows = []
                    for a, j in enumerate(group):
                        blk = p_in_ref[bb, 0, j, h]
                        rows.append(jnp.concatenate(
                            [blk if bcol == a else zero_off
                             for bcol in range(gsz)], axis=1
                        ))
                    p_lo = jnp.concatenate(rows, axis=0)
                # p_lo holds P^T (the forward's transposed softmax); all
                # reductions land on SUBLANES (cheap vreg trees)
                p = p_lo.astype(jnp.float32)
                dv = _dot(p_lo, doh.astype(cdt))
                dp_t = _dot(v, doh.astype(cdt), (((1,), (1,)), ((), ())))
                ds_t = p * (dp_t - jnp.sum(dp_t * p, axis=0, keepdims=True))
                for a, j in enumerate(group):
                    blk = ds_t[a * n : (a + 1) * n, a * n : (a + 1) * n]
                    if kinds == 1:
                        dbias_acc[0][h] += blk
                    else:
                        base = 1 if j == nww - 1 else 0
                        zero = jnp.zeros_like(blk)
                        dbias_acc[base][h] += jnp.where(is_bottom, zero, blk)
                        dbias_acc[base + 2][h] += jnp.where(
                            is_bottom, blk, zero
                        )
                ds_lo = (ds_t * scale).astype(cdt)
                head_dq.append(
                    _dot(ds_lo, k, (((0,), (0,)), ((), ()))).astype(cdt)
                )
                head_dk.append(_dot(ds_lo, q).astype(cdt))
                head_dv.append(dv.astype(cdt))
            dtile = jnp.concatenate(head_dq + head_dk + head_dv, axis=-1)
            for a, j in enumerate(group):
                dqkv_scratch[bb, :, j * ws : (j + 1) * ws, :] = dtile[
                    a * n : (a + 1) * n
                ].reshape(ws, ws, 3 * c)

    dbias_ref[...] += jnp.stack([jnp.stack(row) for row in dbias_acc])
    att_t = att_in_ref[...].reshape(bs * ws * w, c)
    dwp_ref[...] += _dot(att_t, dzp_lo, (((0,), (0,)), ((), ())))
    dqkv = dqkv_scratch[...].reshape(bs * ws * w, 3 * c)
    dwq_ref[...] += _dot(y, dqkv, (((0,), (0,)), ((), ())))
    dbq_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dy = _dot(dqkv, wq_ref[...], (((1,), (1,)), ((), ())))
    dg1_ref[...] += jnp.sum(dy * xn, axis=0, keepdims=True)
    dbe1_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    dt = _ln_bwd(dy, xn, inv, g1)
    dx_ref[...] = (dz32 + dt).astype(cdt).reshape(bs, ws, w, c)


def _swin_block_call_args(x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1,
                          w2, b2, s1, s2, window_size, num_heads):
    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    # conservative: the block kernel holds both halves' working sets
    bsub_a = _attn_bsub(b, hh, ww, c, num_heads, ws, bias.shape[0],
                        dtype_bytes=x.dtype.itemsize)
    bsub_m = _mlp_bsub(b, hh, ww, c, hidden, ws,
                       dtype_bytes=x.dtype.itemsize)
    bsub = min(bsub_a, bsub_m)
    while b % bsub:
        bsub -= 1
    ins = (
        x,
        g1.astype(jnp.float32).reshape(1, c),
        be1.astype(jnp.float32).reshape(1, c),
        wq.astype(x.dtype),
        bq.astype(jnp.float32).reshape(1, 3 * c),
        wp.astype(x.dtype),
        bp.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32),
        g2.astype(jnp.float32).reshape(1, c),
        be2.astype(jnp.float32).reshape(1, c),
        w1.astype(x.dtype),
        b1.astype(jnp.float32).reshape(1, hidden),
        w2.astype(x.dtype),
        b2.astype(jnp.float32).reshape(1, c),
        s1.astype(jnp.float32).reshape(b, 1),
        s2.astype(jnp.float32).reshape(b, 1),
    )
    ws_ = window_size
    specs = [
        _strip_spec(ws_, ww, c, bsub),
        _row_spec(c), _row_spec(c),
        _full_spec((c, 3 * c)), _row_spec(3 * c),
        _full_spec((c, c)), _row_spec(c),
        _full_spec(bias.shape),
        _row_spec(c), _row_spec(c),
        _full_spec((c, hidden)), _row_spec(hidden),
        _full_spec((hidden, c)), _row_spec(c),
        _full_spec((b, 1), pltpu.SMEM),
        _full_spec((b, 1), pltpu.SMEM),
    ]
    return ins, specs, (hh // ws_, b // bsub), bsub


@functools.partial(jax.custom_vjp, nondiff_argnums=(16, 17, 18, 19, 20))
def fused_swin_block_train(x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1,
                           b1, w2, b2, s1, s2, num_heads, head_dim,
                           window_size, eps=1e-5, interpret=False):
    """One-kernel pre-LN Swin block (train): out = mlp_half(attn_half(x)).
    Saves P + attention output + the mid-block residual z for a saved-P
    backward; numerically identical to fused_attn_block_train followed by
    fused_ln_mlp."""
    out, _, _, _ = _swin_block_fwd_impl(
        x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2, b2, s1, s2,
        num_heads, head_dim, window_size, eps, interpret,
    )
    return out


def _swin_block_fwd_impl(x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1,
                         w2, b2, s1, s2, num_heads, head_dim, window_size,
                         eps, interpret):
    b, hh, ww, c = x.shape
    ws = window_size
    n = ws * ws
    nww = ww // ws
    nwh = hh // ws
    kernel = functools.partial(
        _swin_block_fwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        scale=head_dim**-0.5, nwh=nwh, kinds=bias.shape[0], eps=eps,
    )
    # the kernel computes S^T (transposed softmax), so it consumes the
    # TRANSPOSED bias table; dbias is transposed back in the VJP
    bias_t = bias.transpose(0, 1, 3, 2)
    ins, specs, grid, bsub = _swin_block_call_args(
        x, g1, be1, wq, bq, wp, bp, bias_t, g2, be2, w1, b1, w2, b2, s1, s2,
        window_size, num_heads,
    )
    out, p, att, z = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, nwh, nww, num_heads, n, n), x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(x.shape, x.dtype),
        ),
        grid=grid,
        in_specs=specs,
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            pl.BlockSpec(
                (bsub, 1, nww, num_heads, n, n),
                lambda i, bb: (bb, i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            _strip_spec(ws, ww, c, bsub),
            _strip_spec(ws, ww, c, bsub),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_swin_block_train_fwd",
    )(*ins)
    return out, p, att, z


def _swin_block_fwd(x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2,
                    b2, s1, s2, num_heads, head_dim, window_size, eps,
                    interpret):
    out, p, att, z = _swin_block_fwd_impl(
        x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2, b2, s1, s2,
        num_heads, head_dim, window_size, eps, interpret,
    )
    return out, (x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2, b2,
                 s1, s2, p, att, z)


def _swin_block_bwd(num_heads, head_dim, window_size, eps, interpret, res,
                    do):
    (x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2, b2, s1, s2, p,
     att, z) = res
    b, hh, ww, c = x.shape
    hidden = w1.shape[1]
    ws = window_size
    n = ws * ws
    nww = ww // ws
    nwh = hh // ws
    kinds = bias.shape[0]
    f32 = jnp.float32
    kernel = functools.partial(
        _swin_block_bwd_kernel, nh=num_heads, hd=head_dim, ws=ws, w=ww,
        scale=head_dim**-0.5, nwh=nwh, kinds=kinds, eps=eps,
    )
    ins, specs, grid, bsub = _swin_block_call_args(
        x, g1, be1, wq, bq, wp, bp, bias, g2, be2, w1, b1, w2, b2, s1, s2,
        window_size, num_heads,
    )
    # bias is not read by the backward; drop it from inputs
    ins = ins[:7] + ins[8:]
    specs = specs[:7] + specs[8:]
    p_spec = pl.BlockSpec(
        (bsub, 1, nww, num_heads, n, n),
        lambda i, bb: (bb, i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    (dx, dg1, dbe1, dwq, dbq, dwp, dbp, dbias, dg2, dbe2, dw1, db1, dw2,
     db2) = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, 3 * c), f32),
            jax.ShapeDtypeStruct((1, 3 * c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((kinds, num_heads, n, n), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ),
        grid=grid,
        in_specs=specs + [
            p_spec,
            _strip_spec(ws, ww, c, bsub),
            _strip_spec(ws, ww, c, bsub),
            _strip_spec(ws, ww, c, bsub),
        ],
        out_specs=(
            _strip_spec(ws, ww, c, bsub),
            _row_spec(c), _row_spec(c),
            _full_spec((c, 3 * c)), _row_spec(3 * c),
            _full_spec((c, c)), _row_spec(c),
            _full_spec((kinds, num_heads, n, n)),
            _row_spec(c), _row_spec(c),
            _full_spec((c, hidden)), _row_spec(hidden),
            _full_spec((hidden, c)), _row_spec(c),
        ),
        scratch_shapes=[
            pltpu.VMEM((bsub, ws, ww, 3 * c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        name="fused_swin_block_train_bwd",
    )(*ins, p, att, z, do)
    return (
        dx,
        dg1.reshape(c).astype(g1.dtype),
        dbe1.reshape(c).astype(be1.dtype),
        dwq.astype(wq.dtype),
        dbq.reshape(3 * c).astype(bq.dtype),
        dwp.astype(wp.dtype),
        dbp.reshape(c).astype(bp.dtype),
        # the kernel accumulated d/d(bias^T); undo the entry transpose
        dbias.transpose(0, 1, 3, 2).astype(bias.dtype),
        dg2.reshape(c).astype(g2.dtype),
        dbe2.reshape(c).astype(be2.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(hidden).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(c).astype(b2.dtype),
        jnp.zeros_like(s1),
        jnp.zeros_like(s2),
    )


fused_swin_block_train.defvjp(_swin_block_fwd, _swin_block_bwd)
