"""Analytic FLOP/byte counter tests (utils/flops.py; VERDICT r3 #6).

Pins (a) dot/conv FLOP counts against hand arithmetic, (b) scan-length
multipliers (XLA's own cost analysis counts a scan body ONCE — the analytic
walker must not repeat that mistake), (c) the Pallas window-MHSA byte model
on a known-shape kernel call, and (d) the unrecognized-pallas warning
(ADVICE r3: silent 0 would make the counters quietly wrong).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.utils import flops as fl


def test_dot_flops_exact() -> None:
    def f(a, b):
        return a @ b

    a = jnp.zeros((8, 64), jnp.float32)
    b = jnp.zeros((64, 32), jnp.float32)
    jaxpr = jax.make_jaxpr(f)(a, b)
    assert fl.jaxpr_flops(jaxpr) == 2 * 8 * 64 * 32


def test_conv_flops_exact() -> None:
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    k = jnp.zeros((3, 3, 3, 8), jnp.float32)
    jaxpr = jax.make_jaxpr(f)(x, k)
    assert fl.jaxpr_flops(jaxpr) == 2 * 2 * 16 * 16 * 8 * 3 * 9


def test_scan_multiplies_body() -> None:
    def f(x):
        def body(c, _):
            return c @ c, None

        return jax.lax.scan(body, x, None, length=8)[0]

    x = jnp.zeros((16, 16), jnp.float32)
    jaxpr = jax.make_jaxpr(f)(x)
    assert fl.jaxpr_flops(jaxpr) == 8 * 2 * 16 * 16 * 16


def test_pallas_window_mhsa_flops_and_bytes() -> None:
    """Known-shape fused_window_mhsa call (interpret mode so it traces on
    CPU): B=2, H=W=16, ws=8 -> 4 windows, nh=2, hd=8, n=64."""
    from trainner_redux_tpu.ops.pallas.window_attention import fused_window_mhsa

    b, h, w, nh, hd, ws = 2, 16, 16, 2, 8, 8
    c = nh * hd
    n = ws * ws
    qkv = jnp.zeros((b, h, w, 3 * c), jnp.bfloat16)
    bias = jnp.zeros((1, nh, n, n), jnp.float32)

    def f(qkv, bias):
        return fused_window_mhsa(qkv, bias, nh, hd, ws, True)

    jaxpr = jax.make_jaxpr(f)(qkv, bias)
    n_windows = (h // ws) * (w // ws)
    want_flops = 2 * 2 * b * nh * n_windows * n * n * hd  # S + PV
    assert fl.jaxpr_flops(jaxpr) == want_flops

    want_bytes = (
        qkv.size * 2  # bf16 in
        + bias.size * 4  # fp32 kind table (cast to f32 before the call)
        + b * h * w * c * 2  # bf16 out
    )
    assert fl.jaxpr_pallas_bytes(jaxpr) == want_bytes


def test_pallas_backward_counts_2p5x() -> None:
    from trainner_redux_tpu.ops.pallas.window_attention import fused_window_mhsa

    b, h, w, nh, hd, ws = 1, 16, 16, 2, 8, 8
    c = nh * hd
    n = ws * ws
    qkv = jnp.zeros((b, h, w, 3 * c), jnp.bfloat16)
    bias = jnp.zeros((1, nh, n, n), jnp.float32)

    def loss(qkv, bias):
        return jnp.sum(
            fused_window_mhsa(qkv, bias, nh, hd, ws, True).astype(jnp.float32)
        )

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(qkv, bias)
    n_windows = (h // ws) * (w // ws)
    per_pass = 2 * 2 * b * nh * n_windows * n * n * hd
    # fwd (recorded by custom_vjp fwd) + bwd at 2.5x
    assert fl.jaxpr_flops(jaxpr) == pytest.approx(per_pass * 3.5)
    # bwd bytes: qkv + bias + dout in; dq/dk/dv/dbias out (+ fwd pass bytes)
    fwd_bytes = qkv.size * 2 + bias.size * 4 + b * h * w * c * 2
    bwd_bytes = (
        qkv.size * 2 + bias.size * 4 + b * h * w * c * 2  # in
        + 3 * b * h * w * c * 2 + bias.size * 4  # out
    )
    assert fl.jaxpr_pallas_bytes(jaxpr) == fwd_bytes + bwd_bytes


def test_pallas_fused_attn_block_flops() -> None:
    """fused_attn_block: fwd = 2P + 8*T*C^2; bwd = 7P + 22*T*C^2 (the kernel
    recomputes qkv + the attention forward, see fused_block.py)."""
    from trainner_redux_tpu.ops.pallas.fused_block import fused_attn_block

    b, h, w, nh, hd, ws = 2, 16, 16, 2, 8, 8
    c = nh * hd
    n = ws * ws
    x = jnp.zeros((b, h, w, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    be = jnp.zeros((c,), jnp.float32)
    wq = jnp.zeros((c, 3 * c), jnp.bfloat16)
    bq = jnp.zeros((3 * c,), jnp.float32)
    wp = jnp.zeros((c, c), jnp.bfloat16)
    bp = jnp.zeros((c,), jnp.float32)
    bias = jnp.zeros((1, nh, n, n), jnp.float32)
    s = jnp.ones((b,), jnp.float32)

    def f(x, g, be, wq, bq, wp, bp, bias, s):
        return fused_attn_block(x, g, be, wq, bq, wp, bp, bias, s, nh, hd,
                                ws, 1e-5, True)

    jaxpr = jax.make_jaxpr(f)(x, g, be, wq, bq, wp, bp, bias, s)
    t = b * h * w
    n_windows = (h // ws) * (w // ws)
    p = 2 * b * nh * n_windows * n * n * hd
    assert fl.jaxpr_flops(jaxpr) == 2 * p + 8 * t * c * c

    def loss(x, g, be, wq, bq, wp, bp, bias, s):
        return jnp.sum(f(x, g, be, wq, bq, wp, bp, bias, s).astype(jnp.float32))

    jaxpr_b = jax.make_jaxpr(jax.grad(loss, argnums=(0, 3)))(
        x, g, be, wq, bq, wp, bp, bias, s
    )
    # custom_vjp fwd + bwd
    assert fl.jaxpr_flops(jaxpr_b) == (2 * p + 8 * t * c * c) + (
        7 * p + 22 * t * c * c
    )
    assert fl.jaxpr_pallas_bytes(jaxpr_b) > 0.0


def test_pallas_fused_ln_mlp_flops() -> None:
    """fused_ln_mlp: fwd = 4*T*C*h; bwd = 12*T*C*h."""
    from trainner_redux_tpu.ops.pallas.fused_block import fused_ln_mlp

    b, h, w, c, hidden, ws = 2, 16, 16, 32, 64, 8
    x = jnp.zeros((b, h, w, c), jnp.bfloat16)
    g = jnp.ones((c,), jnp.float32)
    be = jnp.zeros((c,), jnp.float32)
    w1 = jnp.zeros((c, hidden), jnp.bfloat16)
    b1 = jnp.zeros((hidden,), jnp.float32)
    w2 = jnp.zeros((hidden, c), jnp.bfloat16)
    b2 = jnp.zeros((c,), jnp.float32)
    s = jnp.ones((b,), jnp.float32)

    def f(x, g, be, w1, b1, w2, b2, s):
        return fused_ln_mlp(x, g, be, w1, b1, w2, b2, s, ws, 1e-5, True)

    jaxpr = jax.make_jaxpr(f)(x, g, be, w1, b1, w2, b2, s)
    t = b * h * w
    assert fl.jaxpr_flops(jaxpr) == 4 * t * c * hidden

    def loss(*a):
        return jnp.sum(f(*a).astype(jnp.float32))

    jaxpr_b = jax.make_jaxpr(jax.grad(loss, argnums=(0, 3)))(
        x, g, be, w1, b1, w2, b2, s
    )
    assert fl.jaxpr_flops(jaxpr_b) == 4 * t * c * hidden + 12 * t * c * hidden
    assert fl.jaxpr_pallas_bytes(jaxpr_b) > 0.0


def test_unrecognized_pallas_warns() -> None:
    """A pallas_call the model doesn't know must warn, not silently count 0."""
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=True,
        )(x)

    x = jnp.zeros((8, 128), jnp.float32)
    jaxpr = jax.make_jaxpr(f)(x)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = fl.jaxpr_flops(jaxpr)
    assert got == 0.0
    assert any("unrecognized pallas_call" in str(w.message) for w in rec)


def test_device_peaks_known_kind() -> None:
    peak_flops, peak_bw = fl.device_peaks()
    assert peak_flops > 1e12 and peak_bw > 1e11
