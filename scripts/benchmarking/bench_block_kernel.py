"""Decompose the fused attn-block Pallas kernel's on-chip time.

The round-4 fused block kernels put SwinIR-M's forward at ~27 ms (b8), of
which ~11 ms is 36x the attn-block kernel at ~0.305 ms — 10x above its
analytic HBM-traffic bound (~0.03 ms). This script times ablated kernel
variants at production geometry to attribute the in-kernel cost:

  full        : the production kernel body (LN+qkv+window-MHSA+proj+residual)
  no-softmax  : softmax replaced by a scale (keeps matmuls, bias, copies)
  no-bias     : bias-tile assembly skipped (keeps softmax, matmuls, copies)
  no-gather   : per-group gather/scatter replaced by a single strip-shaped
                tile (keeps matmul count/shapes, drops window regrouping)
  qkv-proj    : attention inner loop removed entirely (big matmuls only)
  ln-only     : LN1 + residual copy (kernel floor: strip IO + LN)

Each variant runs via the same pallas_call plumbing and is slope-timed with
scan-chained iterations (bench_window_attention.py method). Usage:

  python scripts/benchmarking/bench_block_kernel.py [--quick]

Prints one JSON line per variant; deltas between variants attribute the
kernel's microseconds. Reference geometry: SwinIR-M b8 64px (C=180, nh=6,
hd=30, ws=8).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trainner_redux_tpu.ops.pallas.fused_block import (
    _VMEM_LIMIT,
    _attn_call_args,
    _dot,
    _ln_f32,
    _scale_rows,
    _scatter_windows_b,
)
from trainner_redux_tpu.ops.pallas.window_attention import (
    _bias_tile,
    _gather_windows,
    _head_qkv,
    _window_groups,
)


def _variant_kernel(x_ref, g_ref, be_ref, wq_ref, bq_ref, wp_ref, bp_ref,
                    bias_ref, s_ref, o_ref, att_ref,
                    *, nh, hd, ws, w, scale, nwh, kinds, eps, mode):
    # batch-blocked, mirroring fused_block._attn_block_fwd_kernel
    bs = x_ref.shape[0]
    c = nh * hd
    n = ws * ws
    nww = w // ws
    cdt = x_ref.dtype
    is_bottom = pl.program_id(0) == nwh - 1
    srow = _scale_rows(s_ref, bs, ws * w).astype(cdt)

    t = x_ref[...].reshape(bs * ws * w, c)
    y32, _, _ = _ln_f32(t.astype(jnp.float32), g_ref[0], be_ref[0], eps)
    y = y32.astype(cdt)
    if mode == "ln-only":
        o_ref[...] = (t + srow * y).reshape(bs, ws, w, c)
        return
    qkv = (_dot(y, wq_ref[...]).astype(cdt) + bq_ref[0].astype(cdt)).reshape(
        bs, ws, w, 3 * c
    )
    if mode == "qkv-proj":
        att = qkv.reshape(bs * ws * w, 3 * c)[:, :c]
        proj = _dot(att, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
        o_ref[...] = (t + srow * proj).reshape(bs, ws, w, c)
        return

    def heads(tile, group):
        outs = []
        for h in range(nh):
            q, k, v = _head_qkv(tile, h, nh, hd)
            sc = _dot(q, k, (((1,), (1,)), ((), ())))
            if mode != "no-bias":
                sc = sc * scale + _bias_tile(
                    bias_ref, h, group, nww, kinds, is_bottom
                )
            if mode == "no-softmax":
                p = sc * scale
            else:
                m = jnp.max(sc, axis=-1, keepdims=True)
                p = jnp.exp(sc - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = _dot(p.astype(cdt), v)
            outs.append(o.astype(cdt))
        return jnp.concatenate(outs, axis=-1)

    if mode == "no-gather":
        # fat tiles in plain token order: same matmul shapes/count as the
        # 128-row window groups when n=64, minus the window regrouping copies
        for bb in range(bs):
            tile = qkv[bb].reshape(ws * w, 3 * c)
            for gi, r0 in enumerate(range(0, ws * w, 2 * n)):
                att_ref[bb, :, gi * 2 * ws : (gi + 1) * 2 * ws, :] = heads(
                    tile[r0 : r0 + 2 * n], [0, 1]
                ).reshape(ws, 2 * ws, c)
    else:
        for bb in range(bs):
            for group in _window_groups(nww, n):
                tile = _gather_windows(qkv[bb], group, ws, 3 * c)
                _scatter_windows_b(att_ref, heads(tile, group), bb, group, ws, c)
    att_t = att_ref[...].reshape(bs * ws * w, c)
    proj = _dot(att_t, wp_ref[...]).astype(cdt) + bp_ref[0].astype(cdt)
    o_ref[...] = (t + srow * proj).reshape(bs, ws, w, c)


def _build(mode, b, hh, ww, c, nh, ws, kinds):
    hd = c // nh
    key = jax.random.key(0)
    x = jax.random.normal(key, (b, hh, ww, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    be = jnp.zeros((c,), jnp.float32)
    wq = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.05
    bq = jnp.zeros((3 * c,), jnp.float32)
    wp = jax.random.normal(key, (c, c), jnp.bfloat16) * 0.05
    bp = jnp.zeros((c,), jnp.float32)
    n = ws * ws
    bias = jax.random.normal(key, (kinds, nh, n, n), jnp.float32)
    s = jnp.ones((b,), jnp.float32)

    kernel = functools.partial(
        _variant_kernel, nh=nh, hd=hd, ws=ws, w=ww, scale=hd**-0.5,
        nwh=hh // ws, kinds=kinds, eps=1e-5, mode=mode,
    )

    def call(xx):
        ins, specs, grid, bsub = _attn_call_args(
            xx, g, be, wq, bq, wp, bp, bias, s, ws, nh
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(xx.shape, xx.dtype),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (bsub, ws, ww, c), lambda i, bb: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((bsub, ws, ww, c), xx.dtype)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        )(*ins)

    return call, x


def _slope_ms(fn, x, n1, n2) -> float:
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(xx, n):
        def body(carry, _):
            out = fn(carry)
            return out, None

        return jax.lax.scan(body, xx, None, length=n)[0]

    def run(n: int) -> float:
        r = chain(x, n)
        np.asarray(jax.device_get(r[0, 0, 0, :1]))
        t0 = time.perf_counter()
        r = chain(x, n)
        np.asarray(jax.device_get(r[0, 0, 0, :1]))
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1) * 1000.0


def main() -> None:
    quick = "--quick" in sys.argv
    n1, n2 = (20, 60) if quick else (100, 300)
    b, hh, ww, c, nh, ws = 8, 64, 64, 180, 6, 8
    for kinds, tag in [(1, "unshift"), (4, "shift")]:
        for mode in ["full", "no-bias", "no-softmax", "no-gather",
                     "qkv-proj", "ln-only"]:
            call, x = _build(mode, b, hh, ww, c, nh, ws, kinds)
            ms = _slope_ms(call, x, n1, n2)
            print(json.dumps({"variant": mode, "mask": tag,
                              "ms_per_block": round(ms, 4)}))


if __name__ == "__main__":
    main()
