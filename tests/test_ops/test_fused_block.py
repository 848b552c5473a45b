"""Fused transformer-block kernels vs plain-jnp references (interpret mode).

Covers fused_ln_mlp and fused_attn_block forward + full gradient set
(input, every parameter, bias kind table), unshifted and shifted, in fp32
for tight tolerances plus a bf16 smoke. Reference semantics:
/root/reference/traiNNer/archs/swinir_arch.py:139-229 (SwinTransformerBlock
norm1/attn/drop_path + norm2/mlp chains).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.ops.pallas.fused_block import (
    fused_attn_block,
    fused_ln_mlp,
)
from trainner_redux_tpu.ops.pallas.window_attention import (
    reference_window_mhsa,
    shift_mask_kinds,
)

EPS = 1e-5


def _ln(t, g, b):
    mu = jnp.mean(t, axis=-1, keepdims=True)
    var = jnp.mean((t - mu) ** 2, axis=-1, keepdims=True)
    return (t - mu) * jax.lax.rsqrt(var + EPS) * g + b


def _ref_mlp(x, g, be, w1, b1, w2, b2, s):
    t = x.reshape(-1, x.shape[-1])
    y = _ln(t, g, be)
    h = jax.nn.gelu(y @ w1 + b1, approximate=False)
    m = h @ w2 + b2
    out = t + s.repeat(t.shape[0] // x.shape[0])[:, None] * m
    return out.reshape(x.shape)


def _bias_full_from_kinds(bias_kinds, nwh, nww):
    k = bias_kinds.shape[0]
    if k == 1:
        return jnp.broadcast_to(bias_kinds, (nwh * nww,) + bias_kinds.shape[1:])
    rows = []
    for i in range(nwh):
        for j in range(nww):
            kind = (2 if i == nwh - 1 else 0) + (1 if j == nww - 1 else 0)
            rows.append(bias_kinds[kind])
    return jnp.stack(rows)


def _ref_attn_block(x, g, be, wq, bq, wp, bp, bias_kinds, s, nh, hd, ws):
    b, hh, ww, c = x.shape
    t = x.reshape(-1, c)
    y = _ln(t, g, be)
    qkv = (y @ wq + bq).reshape(b, hh, ww, 3 * c)
    bias_full = _bias_full_from_kinds(bias_kinds, hh // ws, ww // ws)
    att = reference_window_mhsa(qkv, bias_full, nh, hd, ws)
    proj = att.reshape(-1, c) @ wp + bp
    out = t + s.repeat(t.shape[0] // b)[:, None] * proj
    return out.reshape(x.shape)


def _mlp_inputs(dtype=jnp.float32):
    rng = np.random.default_rng(7)
    b, hh, ww, c, hidden = 2, 16, 24, 32, 64
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), dtype)
    g = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, hidden)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((hidden, c)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    s = jnp.asarray([1.0, 1.25], jnp.float32)
    return x, g, be, w1, b1, w2, b2, s


def test_fused_ln_mlp_fwd_and_grads():
    x, g, be, w1, b1, w2, b2, s = _mlp_inputs()
    ws = 8

    out = fused_ln_mlp(x, g, be, w1, b1, w2, b2, s, ws, EPS, True)
    ref = _ref_mlp(x, g, be, w1, b1, w2, b2, s)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    def loss_fused(*a):
        return jnp.sum(fused_ln_mlp(*a, s, ws, EPS, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref_mlp(*a, s) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for a, b_, name in zip(
        gf, gr, ["dx", "dg", "dbe", "dw1", "db1", "dw2", "db2"]
    ):
        np.testing.assert_allclose(
            a, b_, atol=5e-4, rtol=5e-4, err_msg=name
        )


@pytest.mark.parametrize(
    "shifted", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_fused_attn_block_fwd_and_grads(shifted):
    rng = np.random.default_rng(3 if shifted else 4)
    b, hh, ww = 2, 16, 24
    nh, hd, ws = 3, 8, 8
    c = nh * hd
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal(c) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.standard_normal(3 * c) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    rel = jnp.asarray(rng.standard_normal((nh, n, n)) * 0.1, jnp.float32)
    if shifted:
        masks = jnp.asarray(shift_mask_kinds(ws, ws // 2))
        bias = rel[None] + masks[:, None]
    else:
        bias = rel[None]
    s = jnp.asarray([1.0, 0.8], jnp.float32)

    out = fused_attn_block(x, g, be, wq, bq, wp, bp, bias, s, nh, hd, ws,
                           EPS, True)
    ref = _ref_attn_block(x, g, be, wq, bq, wp, bp, bias, s, nh, hd, ws)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)

    def loss_fused(*a):
        return jnp.sum(
            fused_attn_block(*a, s, nh, hd, ws, EPS, True) ** 2
        )

    def loss_ref(*a):
        return jnp.sum(_ref_attn_block(*a, s, nh, hd, ws) ** 2)

    gf = jax.grad(loss_fused, argnums=tuple(range(8)))(
        x, g, be, wq, bq, wp, bp, bias
    )
    gr = jax.grad(loss_ref, argnums=tuple(range(8)))(
        x, g, be, wq, bq, wp, bp, bias
    )
    for a, b_, name in zip(
        gf, gr, ["dx", "dg", "dbe", "dwq", "dbq", "dwp", "dbp", "dbias"]
    ):
        np.testing.assert_allclose(a, b_, atol=2e-3, rtol=2e-3, err_msg=name)


def test_fused_ln_mlp_bf16_smoke():
    x, g, be, w1, b1, w2, b2, s = _mlp_inputs(jnp.bfloat16)
    ws = 8
    out = fused_ln_mlp(x, g, be, w1, b1, w2, b2, s, ws, EPS, True)
    ref = _ref_mlp(
        x.astype(jnp.float32), g, be, w1.astype(jnp.float32), b1,
        w2.astype(jnp.float32), b2, s,
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref, atol=0.1, rtol=0.1
    )
