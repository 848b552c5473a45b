"""Per-component profile of the SwinIR-M train step (VERDICT r2 #1a).

Slope-times (device_get-forced, like bench.py — the tunneled backend's
readiness signals are optimistic) a ladder of ablations of the flagship
bench config so the 154 ms/step can be attributed:

  train        full jitted optimizer block (the bench number)
  fwd_loss     forward + L1 loss only (no grad, no optimizer)
  fwd          forward only
  variants: fused attention on/off, batch size sweep, remat on/off

Usage: python scripts/benchmarking/profile_step.py [--quick]
Writes docs/perf/profile_swinir_m.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())  # run from repo root: python scripts/.../profile_step.py

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _force(x) -> None:
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def slope(fn, n1=4, n2=12) -> float:
    """Seconds per call via two-point slope with device_get completion."""
    def run(n):
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(r)
        _force(r)
        return time.perf_counter() - t0

    r = fn(None)
    _force(r)  # compile
    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def build(batch: int, lq: int, fused: bool, remat: bool):
    os.environ["TRAINNER_FUSED_ATTN"] = "1" if fused else "0"
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions, ReduxOptions, TrainOptions,
    )

    opt = ReduxOptions(
        name="prof", scale=4, num_gpu=len(jax.devices()), path=PathOptions(),
        network_g={"type": "swinir_m"}, manual_seed=0, is_train=True,
        compute_dtype="bfloat16", mesh={"data": len(jax.devices())},
        steps_per_dispatch=1, remat=remat,
        train=TrainOptions(
            total_iter=1000, ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 2e-4},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lqa = (rng.random((batch, lq, lq, 3)) * 255).astype(np.uint8)
    gta = (rng.random((batch, lq * 4, lq * 4, 3)) * 255).astype(np.uint8)
    model.feed_data({"lq": lqa, "gt": gta})
    return model


def time_train(model) -> float:
    it = iter(range(1, 100_000))

    def step(_):
        model.optimize_parameters(next(it))
        return model.state.params_g

    return slope(step)


def time_forward(model, batch, lq, with_loss: bool) -> float:
    lqf = jnp.asarray(
        np.random.default_rng(0).random((batch, lq, lq, 3)), jnp.float32
    )
    gtf = jnp.asarray(
        np.random.default_rng(1).random((batch, lq * 4, lq * 4, 3)), jnp.float32
    )
    net = model.net_g

    @jax.jit
    def fwd(params, x):
        out = net.apply(
            {"params": params}, x, train=True,
            rngs={"dropout": jax.random.key(0)},
        )
        if with_loss:
            return jnp.mean(jnp.abs(out - gtf))
        return out

    params = model.state.params_g
    return slope(lambda _: fwd(params, lqf))


def main():
    quick = "--quick" in sys.argv
    rows = []

    def note(name, sec, imgs):
        rows.append({"name": name, "ms": round(sec * 1e3, 2),
                     "img_s": round(imgs / sec, 2)})
        print(f"{name:42s} {sec*1e3:9.2f} ms   {imgs/sec:8.2f} img/s")

    # the bench config
    m = build(8, 64, fused=True, remat=False)
    note("train b8 fused", time_train(m), 8)
    note("fwd_loss b8 fused", time_forward(m, 8, 64, True), 8)
    note("fwd b8 fused", time_forward(m, 8, 64, False), 8)
    del m

    m = build(8, 64, fused=False, remat=False)
    note("train b8 xla-attn", time_train(m), 8)
    note("fwd b8 xla-attn", time_forward(m, 8, 64, False), 8)
    del m

    if not quick:
        for b in (16, 32):
            try:
                m = build(b, 64, fused=True, remat=False)
                note(f"train b{b} fused", time_train(m), b)
                del m
            except Exception as e:  # HBM
                print(f"train b{b} fused FAILED: {type(e).__name__}")
        m = build(8, 64, fused=True, remat=True)
        note("train b8 fused remat", time_train(m), 8)
        del m

    os.makedirs("docs/perf", exist_ok=True)
    with open("docs/perf/profile_swinir_m.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote docs/perf/profile_swinir_m.json")


if __name__ == "__main__":
    main()
