"""Component-level attribution of the SwinIR-M step (VERDICT r3 #1a).

Two instruments, both robust to the tunneled backend's noisy per-dispatch
timing (micro-op slope timing measured +-5 ms noise — useless at sub-ms op
scale):

1. XLA cost analysis of compiled programs (deterministic): flops and HBM
   bytes accessed for the full train step, the forward, and a single
   SwinBlock — plus an ANALYTIC MAC count (the compiler's flops include the
   Pallas kernel as custom-call estimates and rematerialization, so both are
   reported). Roofline verdict: which of compute (197 TFLOP/s bf16 v5e) or
   HBM (819 GB/s v5e) binds.

2. Slope-timed `lax.scan` ablations at 36-block granularity (heavy enough
   that the two-point device_get slope is trustworthy): the full SwinBlock
   chain vs. chains with attention / MLP / LN / roll knocked out. The
   differences attribute the forward time per subcomponent x 36.

Usage: python scripts/benchmarking/profile_components.py [--train]
Writes docs/perf/components_swinir_m.json.
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

B, H, W, C = 8, 64, 64, 180
NH, WS = 6, 8
HID = 360
N_BLOCKS = 36

# v5e public specs
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def _force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def slope(fn, x0, n1=2, n2=8):
    """Per-call seconds of x->x-like `fn`, measured with the repeat loop
    INSIDE one jitted dispatch (lax.fori_loop): the tunneled backend's
    per-dispatch overhead is tens of ms and variable, so host-side chaining
    is hopeless; an internal loop makes each measurement a single dispatch
    whose fixed overhead cancels in the two-point slope over loop count."""

    @jax.jit
    def looped(x, n):  # dynamic trip count: ONE compile per variant
        return jax.lax.fori_loop(0, n, lambda i, v: fn(v), x)

    _force(looped(x0, 1))  # compile

    def run(n):
        t0 = time.perf_counter()
        _force(looped(x0, n))
        return time.perf_counter() - t0

    t1 = min(run(n1) for _ in range(2))
    t2 = min(run(n2) for _ in range(2))
    return (t2 - t1) / (n2 - n1)


def cost(jitted, *args):
    c = jitted.lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    return flops, byts


def analytic_fwd_macs(batch: int) -> dict:
    """Hand-counted MACs for one SwinIR-M forward at (batch,64,64) LR."""
    tok = H * W
    per_tok = {
        "qkv": C * 3 * C,
        "proj": C * C,
        "mlp": 2 * C * HID,
        # useful attention MACs: per window of n=64 tokens, S and PV are
        # n*n*hd per head -> per token n*hd per dot
        "attn_useful": 2 * (WS * WS) * (C // NH) * NH,
    }
    macs = {k: v * tok * N_BLOCKS * batch for k, v in per_tok.items()}
    # convs: conv_first 3->180, 6 RSTB convs + conv_after_body 180->180,
    # upsample chain at 64x64 then 128x128
    macs["convs"] = batch * tok * 9 * (
        3 * C + 7 * C * C + C * 64 + 64 * 256
    ) + batch * (4 * tok) * 9 * (64 * 256) + batch * (16 * tok) * 9 * (64 * 3)
    # the Pallas block-diagonal kernel's ACTUAL issued MACs (T x T dots)
    t = WS * W
    macs["attn_issued_blockdiag"] = (
        2 * t * t * (C // NH) * NH * (H // WS) * N_BLOCKS * batch
    )
    macs["total_useful"] = sum(
        v for k, v in macs.items() if k != "attn_issued_blockdiag"
    )
    return macs


class _FusedChain:
    """The REAL fused-block path (fused_attn_block + fused_ln_mlp custom
    VJPs) chained N_BLOCKS deep with hand-built params, so grad-of-chain
    slope-times the production forward AND backward kernels in isolation
    (shift=0; the roll is measured separately — it commutes with the
    block)."""

    def __init__(self, rng):
        n = WS * WS
        f32, bf = jnp.float32, jnp.bfloat16
        self.a = (
            jnp.ones((C,), f32), jnp.zeros((C,), f32),
            jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, bf),
            jnp.zeros((3 * C,), f32),
            jnp.asarray(rng.standard_normal((C, C)) * 0.02, bf),
            jnp.zeros((C,), f32),
            jnp.asarray(rng.standard_normal((1, NH, n, n)) * 0.02, f32),
            jnp.ones((B,), f32),
        )
        self.m = (
            jnp.ones((C,), f32), jnp.zeros((C,), f32),
            jnp.asarray(rng.standard_normal((C, HID)) * 0.02, bf),
            jnp.zeros((HID,), f32),
            jnp.asarray(rng.standard_normal((HID, C)) * 0.02, bf),
            jnp.zeros((C,), f32),
            jnp.ones((B,), f32),
        )

    def chain(self, attn=True, mlp=True, grad=False):
        from trainner_redux_tpu.ops.pallas.fused_block import (
            fused_attn_block,
            fused_ln_mlp,
        )

        def f(x):
            for _ in range(N_BLOCKS):
                if attn:
                    x = fused_attn_block(x, *self.a, NH, C // NH, WS)
                if mlp:
                    x = fused_ln_mlp(x, *self.m, WS)
            return x

        if not grad:
            return jax.jit(f)
        g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32)))
        return jax.jit(g)


class _Blocks:
    """A scan over N identical SwinBlock-shaped computations, pieces
    toggleable, sharing one (C-in == C-out) carry so calls chain."""

    def __init__(self, rng):
        self.gamma1 = jnp.ones((C,), jnp.float32)
        self.beta1 = jnp.zeros((C,), jnp.float32)
        self.gamma2 = jnp.ones((C,), jnp.float32)
        self.beta2 = jnp.zeros((C,), jnp.float32)
        self.w_qkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
        self.w_proj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
        self.w1 = jnp.asarray(rng.standard_normal((C, HID)) * 0.02, jnp.bfloat16)
        self.w2 = jnp.asarray(rng.standard_normal((HID, C)) * 0.02, jnp.bfloat16)
        bias = rng.standard_normal((1, NH, WS * WS, WS * WS)).astype(np.float32)
        self.bias_kinds = jnp.asarray(bias)
        nw = (H // WS) * (W // WS)
        self.bias_full = jnp.broadcast_to(
            jnp.asarray(bias[0])[None], (nw, NH, WS * WS, WS * WS)
        )

    def ln(self, x, g, b):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)

    def block(self, x, *, attn="pallas", mlp=True, lnorm=True, roll=False):
        from trainner_redux_tpu.ops.pallas.window_attention import (
            fused_window_mhsa,
            reference_window_mhsa,
        )

        shortcut = x
        y = self.ln(x, self.gamma1, self.beta1) if lnorm else x
        if roll:
            y = jnp.roll(y, (-4, -4), axis=(1, 2))
        if attn != "none":
            qkv = jnp.einsum("bhwc,cd->bhwd", y, self.w_qkv)
            if attn == "pallas":
                o = fused_window_mhsa(qkv, self.bias_kinds, NH, C // NH, WS)
            else:
                o = reference_window_mhsa(qkv, self.bias_full, NH, C // NH, WS)
            y = jnp.einsum("bhwc,cd->bhwd", o, self.w_proj)
        if roll:
            y = jnp.roll(y, (4, 4), axis=(1, 2))
        x = shortcut + y
        if mlp:
            z = self.ln(x, self.gamma2, self.beta2) if lnorm else x
            z = jnp.einsum("bhwc,cd->bhwd", z, self.w1)
            z = jax.nn.gelu(z, approximate=False)
            x = x + jnp.einsum("bhwd,dc->bhwc", z, self.w2)
        return x

    def chain(self, grad=False, **kw):
        def f(x):
            for _ in range(N_BLOCKS):
                x = self.block(x, **kw)
            return x

        if not grad:
            return jax.jit(f)
        g = jax.grad(lambda x: jnp.sum(f(x).astype(jnp.float32)))
        return jax.jit(g)


def main():
    rng = np.random.default_rng(0)
    rows = []

    def note(name, sec, flops=None, byts=None):
        row = {"name": name, "ms": round(sec * 1e3, 2)}
        if flops is not None:
            row["xla_gflop"] = round(flops / 1e9, 1)
            row["xla_gb"] = round(byts / 1e9, 2)
            row["ms_flop_bound"] = round(flops / PEAK_FLOPS * 1e3, 2)
            row["ms_hbm_bound"] = round(byts / PEAK_HBM * 1e3, 2)
        rows.append(row)
        extra = (
            f"  xla {row['xla_gflop']:8.1f} GF {row['xla_gb']:7.2f} GB"
            f"  bounds: flop {row['ms_flop_bound']:6.2f} / hbm {row['ms_hbm_bound']:6.2f} ms"
            if flops is not None
            else ""
        )
        print(f"{name:34s} {sec*1e3:9.2f} ms{extra}", flush=True)

    blocks = _Blocks(rng)
    x0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

    variants = [
        ("36xblock pallas-attn", dict(attn="pallas")),
        ("36xblock xla-attn", dict(attn="xla")),
        ("36xblock no-attn", dict(attn="none")),
        ("36xblock no-mlp", dict(attn="pallas", mlp=False)),
        ("36xblock no-ln", dict(attn="pallas", lnorm=False)),
        ("36xblock attn-only no-ln", dict(attn="pallas", mlp=False, lnorm=False)),
        ("36xblock pallas+roll", dict(attn="pallas", roll=True)),
        ("36xblock empty (ln only)", dict(attn="none", mlp=False)),
    ]
    bwd_only = "--bwd-only" in sys.argv
    if not bwd_only:
        for name, kw in variants:
            fn = blocks.chain(**kw)
            sec = slope(fn, x0)
            f, by = cost(fn, x0)
            note(name, sec, f, by)

    if "--bwd" in sys.argv or bwd_only:
        # Backward attribution (round-4): grad-of-chain over the PRODUCTION
        # fused kernels (custom VJPs) vs the XLA block, halves isolated.
        fc = _FusedChain(rng)
        for name, fn in [
            ("fwd 36xfusedblock", fc.chain()),
            ("grad 36xfusedblock", fc.chain(grad=True)),
            ("grad 36xfusedblock attn-half", fc.chain(mlp=False, grad=True)),
            ("grad 36xfusedblock mlp-half", fc.chain(attn=False, grad=True)),
            ("grad 36xblock xla", blocks.chain(attn="xla", grad=True)),
        ]:
            note(name, slope(fn, x0))

    # full-model anchors + cost analysis (fwd and train step)
    import trainner_redux_tpu.archs  # registries  # noqa: F401
    from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY

    for fused in () if bwd_only else (True, False):
        os.environ["TRAINNER_FUSED_ATTN"] = "1" if fused else "0"
        net = SPANDREL_REGISTRY.get("swinir_m")(scale=4, dtype=jnp.bfloat16)
        params = net.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
        )["params"]
        lq = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

        def fwd_x_to_x(x):
            out = net.apply(
                {"params": params}, x, train=True,
                rngs={"dropout": jax.random.key(0)},
            )
            return out[:, :H, :W, :]  # chainable carry

        @jax.jit
        def fwd(p, x):
            return net.apply(
                {"params": p}, x, train=True, rngs={"dropout": jax.random.key(0)}
            )

        sec = slope(fwd_x_to_x, lq)
        f, by = cost(fwd, params, lq)
        note(f"FULL fwd ({'fused' if fused else 'xla'})", sec, f, by)
    os.environ["TRAINNER_FUSED_ATTN"] = "1"

    if "--train" in sys.argv:
        from trainner_redux_tpu.models import build_model
        from trainner_redux_tpu.utils.redux_options import (
            PathOptions, ReduxOptions, TrainOptions,
        )

        opt = ReduxOptions(
            name="prof", scale=4, num_gpu=len(jax.devices()), path=PathOptions(),
            network_g={"type": "swinir_m"}, manual_seed=0, is_train=True,
            compute_dtype="bfloat16", mesh={"data": len(jax.devices())},
            steps_per_dispatch=1,
            train=TrainOptions(
                total_iter=1000, ema_decay=0.999,
                optim_g={"type": "AdamW", "lr": 2e-4},
                losses=[{"type": "l1loss", "loss_weight": 1.0}],
            ),
        )
        model = build_model(opt)
        lqa = (rng.random((B, H, W, 3)) * 255).astype(np.uint8)
        gta = (rng.random((B, H * 4, W * 4, 3)) * 255).astype(np.uint8)
        model.feed_data({"lq": lqa, "gt": gta})
        batch = {"lq": model.lq, "gt": model.gt, "key": jax.random.key(0)}
        f, by = cost(model._train_step, model.state, batch)
        note("TRAIN step (xla cost only)", 0.0, f, by)

        # slope the FULL train step (state carry) and a bare fwd+bwd+SGD
        # over the same net — the difference is Adam+EMA+loss bookkeeping
        def step_carry(s):
            return model._train_step(s, batch)[0]

        sec = slope(step_carry, model.state)
        note("TRAIN step (slope)", sec)

        netg = model.net_g
        lq_f = jnp.asarray(lqa, jnp.float32) / 255.0
        gt_f = jnp.asarray(gta, jnp.float32) / 255.0

        def sgd_carry(p):
            def lossf(pp):
                out = netg.apply(
                    {"params": pp}, lq_f, train=True,
                    rngs={"dropout": jax.random.key(0)},
                )
                return jnp.mean(jnp.abs(out - gt_f))

            g = jax.grad(lossf)(p)
            return jax.tree.map(lambda a, b: a - 1e-4 * b, p, g)

        sec = slope(sgd_carry, model.state.params_g)
        note("FULL fwd+bwd+sgd (slope)", sec)

    macs = analytic_fwd_macs(B)
    print("\nanalytic fwd MACs (batch 8):")
    for k, v in macs.items():
        print(f"  {k:24s} {v/1e9:9.2f} GMAC = {2*v/1e9:9.2f} GFLOP")
    rows.append({"analytic_fwd_gmac": {k: round(v / 1e9, 2) for k, v in macs.items()}})

    os.makedirs("docs/perf", exist_ok=True)
    out = (
        "docs/perf/components_swinir_m_bwd.json"
        if bwd_only
        else "docs/perf/components_swinir_m.json"
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
