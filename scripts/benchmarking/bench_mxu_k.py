"""MXU cost model probe: does a (128,K)@(K,128) in-kernel dot cost ~K
cycles (streaming) or a fixed full pass regardless of K?

Decides the round-5 fused-block backward design: the window-attention
products have K=hd=30 (S, dQ, dK) or N=30 (PV, dV) — if small-K dots are
~4x cheaper than K=128, the per-unit product count is what matters and
saving P (softmax probabilities) to HBM to cut 6 products to 4 is the
right trade; if each dot costs a fixed pass, fewer-but-fatter dots win.

Times a kernel that runs `reps` chained dots of shape (M,K)@(K,N) entirely
in VMEM (no HBM traffic in the loop), via the scan-chained slope recipe.

Usage: python scripts/benchmarking/bench_mxu_k.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _force(x):
    np.asarray(jax.device_get(jax.tree.leaves(x)[0])).ravel()[:1]


def make_fn(m, k, n, reps):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        acc = jnp.zeros((m, n), jnp.float32)
        for _ in range(reps):
            acc = acc + jax.lax.dot_general(
                a[:, :k], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # perturb a so the unrolled dots can't be CSE'd
            a = a + acc[:, :1].astype(a.dtype) * 1e-6
        o_ref[...] = acc

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        name=f"mxu_k_{m}_{k}_{n}_{reps}",
    )

    # chain ITERS kernel calls inside ONE dispatch (fori_loop): per-dispatch
    # tunnel overhead is tens of ms and would swamp µs-scale kernels
    # (profile_components.py slope recipe)
    @jax.jit
    def run(a, b, iters):
        def body(_, carry):
            o = call(carry, b)
            return carry + (o[:, :1] * 1e-6).astype(carry.dtype)

        return jax.lax.fori_loop(0, iters, body, a)

    return run


def main() -> None:
    rows = []
    reps = 64
    for m, k, n in [
        (128, 128, 128), (128, 64, 128), (128, 30, 128), (128, 8, 128),
        (128, 128, 30), (128, 30, 30),
        (256, 30, 128), (512, 30, 128), (512, 128, 128),
        (1024, 30, 128), (1024, 128, 128), (1024, 180, 540),
    ]:
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((m, 128)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        fn = make_fn(m, k, n, reps)
        _force(fn(a, b, 1))  # compile

        def run_n(iters):
            t0 = time.perf_counter()
            _force(fn(a, b, iters))
            return time.perf_counter() - t0

        t1 = min(run_n(8) for _ in range(2))
        t2 = min(run_n(64) for _ in range(2))
        per_call = (t2 - t1) / 56
        per_dot_us = per_call / reps * 1e6
        gmac = m * k * n / 1e9
        rows.append({
            "mkn": f"{m}x{k}x{n}", "per_dot_us": round(per_dot_us, 3),
            "eff_tflops": round(2 * gmac / per_dot_us * 1e-3, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    os.makedirs("docs/perf", exist_ok=True)
    with open("docs/perf/mxu_k_cost.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
