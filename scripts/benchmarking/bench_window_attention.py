"""Measure the fused Pallas window-MHSA against the plain-XLA formulation
on the real chip, forward and forward+backward, at SwinIR-M production
geometry. Uses the device_get-forced slope method (bench.py docstring).

Usage: python scripts/benchmarking/bench_window_attention.py
Prints one JSON line per (geometry, variant).
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

from trainner_redux_tpu.ops.pallas.window_attention import (
    fused_window_mhsa,
    reference_window_mhsa,
    shift_mask_kinds,
)

GEOMETRIES = [
    # (name, b, h, w, nh, hd, ws, shifted) — swinir_m: C=180, nh=6, hd=30
    ("swinir_m_b8_64px", 8, 64, 64, 6, 30, 8, False),
    ("swinir_m_b8_64px_shift", 8, 64, 64, 6, 30, 8, True),
    # hat-style larger window
    ("hat_b4_64px_ws16", 4, 64, 64, 6, 30, 16, False),
]


def _slope_ms(fn, args, n1=100, n2=500) -> float:
    """ms per op via lax.scan-chained iterations inside ONE jit: the carry
    (qkv) is perturbed by each iteration's output so no step can be elided
    or overlapped, per-dispatch tunnel overhead amortizes across the scan
    length, and the slope between two lengths cancels what remains."""
    qkv, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(q, n):
        def body(carry, _):
            outs = fn(carry, *rest)
            # fold a tiny multiple of every output leaf back into the carry:
            # a data dependency XLA cannot simplify away (eps is a nonzero
            # constant; bf16 keeps it representable)
            leaves = jax.tree.leaves(outs)
            bump = jnp.zeros((), jnp.float32)
            for leaf in leaves:
                bump = bump + jnp.sum(leaf.astype(jnp.float32)) * 1e-12
            return carry + bump.astype(carry.dtype), None

        return jax.lax.scan(body, q, None, length=n)[0]

    def run(n: int) -> float:
        t0 = time.perf_counter()
        out = chain(qkv, n)
        # fetch a TINY data-dependent slice: forces completion while keeping
        # the host transfer (tunnel jitter) negligible vs the signal
        np.asarray(jax.device_get(out[0, 0, 0, :8]))
        return time.perf_counter() - t0

    chain(qkv, n1), chain(qkv, n2)  # compile both lengths
    run(n1)  # warm
    t1 = min(run(n1) for _ in range(5))
    t2 = min(run(n2) for _ in range(5))
    return (t2 - t1) / (n2 - n1) * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    for name, b, hh, ww, nh, hd, ws, shifted in GEOMETRIES:
        c = nh * hd
        n = ws * ws
        nwh, nww = hh // ws, ww // ws
        qkv = jnp.asarray(
            rng.standard_normal((b, hh, ww, 3 * c)) * 0.1, jnp.bfloat16
        )
        rel = jnp.asarray(rng.standard_normal((nh, n, n)) * 0.1, jnp.float32)
        if shifted:
            masks = jnp.asarray(shift_mask_kinds(ws, ws // 2))
            bias_kinds = rel[None] + masks[:, None]
        else:
            bias_kinds = rel[None]
        kind_map = []
        for i in range(nwh):
            for j in range(nww):
                kind_map.append(
                    ((2 if i == nwh - 1 else 0) + (1 if j == nww - 1 else 0))
                    if shifted
                    else 0
                )
        bias_full = jnp.asarray(np.asarray(bias_kinds)[kind_map])

        fused_f = jax.jit(
            lambda q, bk: fused_window_mhsa(q, bk, nh, hd, ws, False)
        )
        ref_f = jax.jit(
            lambda q, bf: reference_window_mhsa(q, bf, nh, hd, ws)
        )
        fused_g = jax.jit(
            jax.grad(
                lambda q, bk: jnp.sum(
                    fused_window_mhsa(q, bk, nh, hd, ws, False).astype(jnp.float32)
                ),
                argnums=(0, 1),
            )
        )
        ref_g = jax.jit(
            jax.grad(
                lambda q, bf: jnp.sum(
                    reference_window_mhsa(q, bf, nh, hd, ws).astype(jnp.float32)
                ),
                argnums=(0, 1),
            )
        )

        for variant, fn, args in (
            ("xla_fwd", ref_f, (qkv, bias_full)),
            ("pallas_fwd", fused_f, (qkv, bias_kinds)),
            ("xla_fwdbwd", ref_g, (qkv, bias_full)),
            ("pallas_fwdbwd", fused_g, (qkv, bias_kinds)),
        ):
            try:
                ms = _slope_ms(fn, args)
                print(
                    json.dumps(
                        {"geometry": name, "variant": variant, "ms": round(ms, 4)}
                    ),
                    flush=True,
                )
            except Exception as e:
                print(
                    json.dumps(
                        {"geometry": name, "variant": variant, "error": str(e)[:300]}
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
