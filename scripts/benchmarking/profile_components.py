"""Component-level attribution of the SwinIR-M forward (VERDICT r3 #1a).

Slope-times each building block of a SwinBlock at the flagship bench shape
(B=8, 64x64 LR, C=180, window 8, heads 6) so the ~42-48 ms forward can be
attributed op-by-op: LayerNorm, qkv/proj Dense, MLP (exact vs tanh gelu),
jnp.roll, the XLA einsum attention path, the Pallas fused attention kernel,
and the row-bias expansion that feeds it. Each row reports ms per call and
the ms contribution to one SwinIR-M forward (36 blocks, 18 shifted).

Usage: python scripts/benchmarking/profile_components.py
Writes docs/perf/components_swinir_m.json.
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

_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, W, C = 8, 64, 64, 180
NH, WS = 6, 8
HID = 360
N_BLOCKS, N_SHIFTED = 36, 18


def _force(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def slope(fn, *args, n1=5, n2=20):
    r = fn(*args)
    _force(r)  # compile

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        _force(r)
        return time.perf_counter() - t0

    t1, t2 = run(n1), run(n2)
    return (t2 - t1) / (n2 - n1)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    xg = jnp.asarray(rng.standard_normal((B, H, W, 3 * C)), jnp.bfloat16)
    gamma = jnp.ones((C,), jnp.float32)
    beta = jnp.zeros((C,), jnp.float32)
    w_qkv = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.02, jnp.bfloat16)
    w_proj = jnp.asarray(rng.standard_normal((C, C)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((C, HID)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((HID, C)) * 0.02, jnp.bfloat16)
    bias_kinds = jnp.asarray(rng.standard_normal((4, NH, WS * WS, WS * WS)), jnp.float32)

    rows = []

    def note(name, sec, count):
        rows.append(
            {"name": name, "ms": round(sec * 1e3, 3),
             "count_per_fwd": count, "fwd_ms": round(sec * 1e3 * count, 2)}
        )
        print(f"{name:40s} {sec*1e3:8.3f} ms x{count:3d} = {sec*1e3*count:7.2f} ms/fwd")

    @jax.jit
    def ln(x):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, -1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(x.dtype)

    note("layernorm fp32", slope(ln, x), 2 * N_BLOCKS + 7)

    @jax.jit
    def dense_qkv(x):
        return jnp.einsum("bhwc,cd->bhwd", x, w_qkv)

    note("qkv dense (C->3C)", slope(dense_qkv, x), N_BLOCKS)

    @jax.jit
    def dense_proj(x):
        return jnp.einsum("bhwc,cd->bhwd", x, w_proj)

    note("proj dense (C->C)", slope(dense_proj, x), N_BLOCKS)

    @jax.jit
    def mlp_exact(x):
        h = jnp.einsum("bhwc,cd->bhwd", x, w1)
        h = jax.nn.gelu(h, approximate=False)
        return jnp.einsum("bhwd,dc->bhwc", h, w2)

    note("mlp gelu-exact", slope(mlp_exact, x), N_BLOCKS)

    @jax.jit
    def mlp_tanh(x):
        h = jnp.einsum("bhwc,cd->bhwd", x, w1)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.einsum("bhwd,dc->bhwc", h, w2)

    note("mlp gelu-tanh", slope(mlp_tanh, x), N_BLOCKS)

    @jax.jit
    def roll2(x):
        return jnp.roll(x, (-4, -4), axis=(1, 2))

    note("jnp.roll", slope(roll2, x), 2 * N_SHIFTED)

    @jax.jit
    def residual_add(x):
        return x + x

    note("residual add", slope(residual_add, x), 2 * N_BLOCKS)

    # XLA einsum attention path on pre-computed qkv (partition..reverse)
    from trainner_redux_tpu.ops.pallas.window_attention import (
        _expand_row_bias,
        fused_window_mhsa,
        reference_window_mhsa,
    )

    n = WS * WS
    nw = (H // WS) * (W // WS)
    bias_full = jnp.broadcast_to(bias_kinds[0][None], (nw, NH, n, n))

    @jax.jit
    def xla_attn(qkv):
        return reference_window_mhsa(qkv, bias_full, NH, C // NH, WS)

    note("attention XLA einsum (given qkv)", slope(xla_attn, xg), N_BLOCKS)

    @jax.jit
    def pallas_attn(qkv):
        return fused_window_mhsa(qkv, bias_kinds[:1], NH, C // NH, WS)

    note("attention Pallas fused (given qkv)", slope(pallas_attn, xg), N_BLOCKS)

    @jax.jit
    def pallas_attn_shifted(qkv):
        return fused_window_mhsa(qkv, bias_kinds, NH, C // NH, WS)

    note("attention Pallas shifted (given qkv)", slope(pallas_attn_shifted, xg), 0)

    @jax.jit
    def bias_expand(b):
        return _expand_row_bias(b, WS, W)

    note("_expand_row_bias (4 kinds)", slope(bias_expand, bias_kinds), N_SHIFTED)

    @jax.jit
    def bias_expand1(b):
        return _expand_row_bias(b, WS, W)

    note("_expand_row_bias (1 kind)", slope(bias_expand1, bias_kinds[:1]), N_SHIFTED)

    # conv contribution: RSTB 3x3 conv + the head/tail convs
    wc = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)

    @jax.jit
    def conv3(x):
        return jax.lax.conv_general_dilated(
            x, wc, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    note("3x3 conv 180->180", slope(conv3, x), 7)

    # whole-model anchors, fused vs not (forward only)
    for fused in (True, False):
        os.environ["TRAINNER_FUSED_ATTN"] = "1" if fused else "0"
        from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY

        net = SPANDREL_REGISTRY.get("swinir_m")(scale=4, dtype=jnp.bfloat16)
        params = net.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3), jnp.float32), train=False
        )["params"]
        lq = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

        @jax.jit
        def fwd(p, x):
            return net.apply({"params": p}, x, train=True,
                             rngs={"dropout": jax.random.key(0)})

        sec = slope(fwd, params, lq, n1=3, n2=9)
        note(f"FULL swinir_m fwd ({'fused' if fused else 'xla'})", sec, 1)
    os.environ["TRAINNER_FUSED_ATTN"] = "1"

    os.makedirs("docs/perf", exist_ok=True)
    with open("docs/perf/components_swinir_m.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("wrote docs/perf/components_swinir_m.json")


if __name__ == "__main__":
    main()
