"""Attribute the span_s_gan step's pathological cost ON CHIP (VERDICT r4 #2).

bisect_gan_cost.py (XLA cost analysis, CPU) showed the ganloss+D rung alone
carries 3.05 TFLOP / 154 GB vs 0.37 TFLOP / 16 GB for bare charbonnier —
the discriminator path dominates. This script slope-times each suspect on
the real TPU to find where the ~0.9 s step (2% utilization) actually goes:

  - DUnet forward / forward+backward at GAN geometry (8, 256, 256, 3)
  - DUnet with DySample swapped for nearest-up (isolates the gather cost)
  - bilinear_sample forward and backward alone (gather / scatter-add)
  - SPAN-S generator fwd+bwd (scale reference)
  - loss towers: mssim, hsluv, perceptual (random-weight VGG) fwd+bwd
  - the full span_s_gan jitted train step (bench.py parity), plus its
    wall-clock COMPILE time (the round-4 "no output in 9.5 min" suspect)

Usage: python scripts/benchmarking/profile_gan_step.py
Writes docs/perf/profile_gan_span_s.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np

_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

os.environ.setdefault("TRAINNER_ALLOW_RANDOM_VGG", "1")

B, GT = 8, 256
RESULTS: list[dict] = []


def _force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def slope(fn, x0, n1=2, n2=8, label=""):
    """Per-call seconds of x->x-like `fn` with the repeat loop inside ONE
    dispatch (fori_loop) — same recipe as profile_components.py."""

    @jax.jit
    def looped(x, n):
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v), x)

    t0 = time.perf_counter()
    _force(looped(x0, 1))
    compile_s = time.perf_counter() - t0

    def run(n):
        t0 = time.perf_counter()
        _force(looped(x0, n))
        return time.perf_counter() - t0

    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    per = (t2 - t1) / (n2 - n1)
    row = {"name": label, "ms": round(per * 1e3, 2),
           "compile_s": round(compile_s, 1)}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)
    return per


def main() -> None:
    from trainner_redux_tpu.archs import build_network_cast

    key = jax.random.key(0)
    x_img = jax.random.uniform(key, (B, GT, GT, 3), jnp.bfloat16)

    # --- DUnet discriminator ---
    dunet = build_network_cast({"type": "dunet"}, jnp.bfloat16)
    dvars = jax.jit(dunet.init)(key, x_img[:1])

    def d_apply(x):
        out, _ = dunet.apply(dvars, x, train=True, mutable=["spectral"])
        return x + out.astype(x.dtype)

    slope(d_apply, x_img, label="dunet fwd b8 256")

    def d_grad(x):
        return jax.grad(
            lambda xx: jnp.sum(
                dunet.apply(dvars, xx, train=True, mutable=["spectral"])[0]
            )
        )(x)

    slope(d_grad, x_img, label="dunet fwd+bwd(x) b8 256")

    # --- DUnet with nearest-up in place of DySample ---
    import trainner_redux_tpu.archs.arch_util as AU
    import trainner_redux_tpu.archs.dunet_arch as DU
    from flax import linen as fnn

    class NearestUp(fnn.Module):
        in_channels: int
        out_channels: int
        scale: int = 2
        groups: int = 4
        end_convolution: bool = True
        end_kernel: int = 1
        dtype: object = jnp.bfloat16

        @fnn.compact
        def __call__(self, x, train=True):
            return AU.nearest_up(x, self.scale)

    orig = DU.DySample
    DU.DySample = NearestUp  # resolved at CALL time from module globals,
    try:                     # so the patch must span init AND apply
        dunet_nn = build_network_cast({"type": "dunet"}, jnp.bfloat16)
        nvars = jax.jit(dunet_nn.init)(key, x_img[:1])

        def dnn_grad(x):
            return jax.grad(
                lambda xx: jnp.sum(
                    dunet_nn.apply(
                        nvars, xx, train=True, mutable=["spectral"]
                    )[0]
                )
            )(x)

        slope(dnn_grad, x_img, label="dunet(nearest-up) fwd+bwd(x) b8 256")
    finally:
        DU.DySample = orig

    # --- bilinear_sample alone at the up3 geometry (128^2 x 128 -> 256^2) ---
    xs = jax.random.uniform(key, (B, 128, 128, 128), jnp.bfloat16)
    cy = jax.random.uniform(key, (B, 256, 256), jnp.float32) * 127
    cx = jax.random.uniform(key, (B, 256, 256), jnp.float32) * 127

    def bs_fwd(x):
        y = AU.bilinear_sample(x, cy, cx)
        return x + y[:, ::2, ::2, :].astype(x.dtype)

    slope(bs_fwd, xs, label="bilinear_sample fwd 128^2x128->256^2 (gather)")

    def bs_bwd(x):
        return jax.grad(lambda xx: jnp.sum(AU.bilinear_sample(xx, cy, cx)))(x)

    slope(bs_bwd, xs, label="bilinear_sample bwd (scatter-add)")

    # --- SPAN-S generator fwd+bwd ---
    span = build_network_cast({"type": "span_s"}, jnp.bfloat16)
    lq = jax.random.uniform(key, (B, 64, 64, 3), jnp.bfloat16)
    svars = jax.jit(span.init)(key, lq[:1])

    def g_grad(x):
        return jax.grad(lambda xx: jnp.sum(span.apply(svars, xx)))(x)

    slope(g_grad, lq, label="span_s G fwd+bwd b8 64")

    # --- loss towers fwd+bwd at (8, 256, 256, 3) ---
    from trainner_redux_tpu.losses import build_loss

    gt_img = jax.random.uniform(jax.random.key(1), (B, GT, GT, 3), jnp.float32)
    for ltype, kwargs in [
        ("mssimloss", {"loss_weight": 0.5}),
        ("hsluvloss", {"criterion": "charbonnier", "loss_weight": 1.0}),
        ("perceptualloss", {"criterion": "charbonnier", "loss_weight": 0.01}),
    ]:
        loss = build_loss({"type": ltype, **kwargs})

        def l_grad(x, loss=loss):
            return jax.grad(
                lambda xx: jnp.sum(
                    jax.tree.leaves(loss(xx.astype(jnp.float32), gt_img))[0]
                )
            )(x)

        slope(l_grad, x_img, label=f"{ltype} fwd+bwd b8 256")

    # --- the full bench span_s_gan step (cold-compile timed) ---
    # opt-in: by this point the process holds every prior model's arrays
    # and compiled programs, and the full GAN step on top has OOMed the
    # 16 GB chip (observed this round). bench.py span_s_gan measures the
    # full step in a clean process; run `--full` only for compile timing.
    if "--full" not in sys.argv:
        os.makedirs("docs/perf", exist_ok=True)
        with open("docs/perf/profile_gan_span_s.json", "w") as f:
            json.dump(RESULTS, f, indent=1)
        return
    sys.argv = ["bench.py"]
    import bench as _bench

    cfg = _bench.CONFIGS["span_s_gan"]
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions, ReduxOptions, TrainOptions,
    )

    opt = ReduxOptions(
        name="prof_gan", scale=4, num_gpu=1, path=PathOptions(),
        network_g=cfg["network"], network_d=cfg["network_d"], manual_seed=0,
        is_train=True, compute_dtype="bfloat16", mesh={"data": 1},
        steps_per_dispatch=1,
        train=TrainOptions(
            total_iter=1000, ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 2e-4}, optim_d=cfg["optim_d"],
            losses=cfg["losses"],
        ),
    )
    model = build_model(opt)
    rng = np.random.default_rng(0)
    model.feed_data({
        "lq": (rng.random((B, 64, 64, 3)) * 255).astype(np.uint8),
        "gt": (rng.random((B, GT, GT, 3)) * 255).astype(np.uint8),
    })
    batch = {"lq": model.lq, "gt": model.gt, "key": jax.random.key(0)}
    t0 = time.perf_counter()
    lowered = model._train_step.lower(model.state, batch)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    row = {"name": "span_s_gan full step lower+compile",
           "lower_s": round(lower_s, 1), "compile_s": round(compile_s, 1)}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)

    state = model.state
    t0 = time.perf_counter()
    state2, _ = compiled(state, batch)
    _force(state2.params_g)
    first_s = time.perf_counter() - t0

    def run(n):
        st = state
        t0 = time.perf_counter()
        for _ in range(n):
            st, _ = compiled(st, batch)
        _force(st.params_g)
        return time.perf_counter() - t0

    t1 = min(run(2) for _ in range(2))
    t2 = min(run(8) for _ in range(2))
    per = (t2 - t1) / 6
    row = {"name": "span_s_gan full step", "ms": round(per * 1e3, 2),
           "first_call_s": round(first_s, 2),
           "img_per_s": round(B / per, 2)}
    RESULTS.append(row)
    print(json.dumps(row), flush=True)

    os.makedirs("docs/perf", exist_ok=True)
    with open("docs/perf/profile_gan_span_s.json", "w") as f:
        json.dump(RESULTS, f, indent=1)


if __name__ == "__main__":
    main()
