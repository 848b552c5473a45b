"""Per-arch inference/training benchmark sweep.

Parity: /root/reference/scripts/benchmarking/benchmark_archs.py (speed/VRAM/
params sweep over the registries, CSV/markdown output) — measured with jit
warmup + block_until_ready timing on the current JAX backend, with HBM usage
from device memory stats when available.

Usage:
    python scripts/benchmarking/benchmark_archs.py [--scale 4] [--size 480x640]
        [--archs span_s,compact,...] [--train] [--csv out.csv] [--true-sync]

Timing note: standard JAX timing (`block_until_ready`) is used by default.
On remote/tunneled backends that acknowledge dispatch before execution
completes, pass --true-sync to force completion by fetching a scalar that
depends on the result — slower, but honest on such hosts.
"""

from __future__ import annotations

import argparse
import sys
import time
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

DEFAULT_ARCHS = [
    "superultracompact", "ultracompact", "compact", "span_s", "span",
    "artcnn_r8f64", "plksr_tiny", "safmn", "esrgan_lite", "esrgan",
    "rcan", "man_light", "swinir_s", "swinir_m", "dat_light",
]


def bench_one(name: str, scale: int, h: int, w: int, train: bool, runs: int = 5,
              true_sync: bool = False):
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.archs import build_network

    net = build_network({"type": name, "scale": scale})
    # a DIFFERENT input per timed run: remote/caching backends can memoize
    # repeated identical executions, which turns constant-input loops into
    # fiction (measured: span_s "0.13 ms" vs a real 12 ms)
    xs = [
        jax.random.uniform(jax.random.key(i), (1, h, w, 3), jnp.float32)
        for i in range(runs)
    ]
    params = jax.jit(lambda k, v: net.init(k, v, train=False))(
        jax.random.key(0), xs[0]
    )
    n_params = sum(int(p.size) for p in jax.tree.leaves(params))

    if train:
        import optax

        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        def step(p, s, xb, yb):
            def loss(pp):
                return jnp.abs(net.apply(pp, xb, train=False) - yb).mean()

            g = jax.grad(loss)(p)
            u, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, u), s2

        fn = jax.jit(step)
        y = jnp.zeros((1, h * scale, w * scale, 3), jnp.float32)
        p2, s2 = fn(params, opt_state, xs[0], y)  # compile
        jax.block_until_ready(p2)
        t0 = time.perf_counter()
        for i in range(runs):
            p2, s2 = fn(p2, s2, xs[i], y)
        if true_sync:
            float(jnp.sum(jax.tree.leaves(p2)[0]))
        else:
            jax.block_until_ready(p2)
        dt = (time.perf_counter() - t0) / runs
    else:
        fn = jax.jit(lambda p, v: net.apply(p, v, train=False))
        out = fn(params, xs[0])
        jax.block_until_ready(out)
        if true_sync:
            float(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        outs = []
        for i in range(runs):
            outs.append(fn(params, xs[i]))
        if true_sync:
            float(jnp.sum(jnp.stack([o[0, 0, 0, 0] for o in outs])))
        else:
            jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / runs

    mem_gb = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem_gb = stats.get("peak_bytes_in_use", 0) / 1024**3
    except Exception:
        pass
    return {"arch": name, "fps": 1.0 / dt, "ms": dt * 1e3, "params": n_params, "peak_gb": mem_gb}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--size", default="480x640")
    ap.add_argument("--archs", default=",".join(DEFAULT_ARCHS))
    ap.add_argument("--train", action="store_true", help="benchmark a full train step")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--true-sync", action="store_true",
                    help="force completion via scalar fetch (for remote "
                         "backends whose block_until_ready is optimistic)")
    args = ap.parse_args()

    h, w = (int(v) for v in args.size.split("x"))
    rows = []
    print(f"{'arch':24s} {'FPS':>9s} {'ms':>9s} {'params':>12s} {'peakGB':>7s}")
    for name in args.archs.split(","):
        try:
            r = bench_one(name.strip(), args.scale, h, w, args.train, args.runs,
                          true_sync=args.true_sync)
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:80]}")
            continue
        rows.append(r)
        peak = f"{r['peak_gb']:.2f}" if r["peak_gb"] else "-"
        print(f"{r['arch']:24s} {r['fps']:9.2f} {r['ms']:9.2f} {r['params']:12,d} {peak:>7s}")

    if args.csv and rows:
        import csv

        with open(args.csv, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=list(rows[0]))
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
