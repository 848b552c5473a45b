"""fused_attn_block_train (saved-P backward) vs the recompute path.

The train kernel must produce identical forward values and parameter
gradients to the recompute-VJP kernel AND the unfused flax composition —
the only difference is WHAT the backward reads (saved P + attention output
vs a full forward recompute). Interpret mode (CPU Pallas interpreter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs.swinir_arch import SwinBlock


@pytest.mark.parametrize(
    "shift", [pytest.param(0, marks=pytest.mark.slow), 4]
)
def test_train_path_matches_recompute_and_unfused(monkeypatch, shift):
    b, h, w, c, nh = 2, 16, 24, 24, 3
    block = SwinBlock(
        dim=c, num_heads=nh, window_size=8, shift_size=shift,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((b, h, w, c)), jnp.float32
    )
    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    params = block.init(jax.random.key(0), x, False)["params"]

    def loss(p, train):
        return jnp.sum(block.apply({"params": p}, x, train) ** 2)

    # unfused reference, train=True (DropPath rate 0 is a passthrough)
    out_ref = block.apply({"params": params}, x, True)
    g_ref = jax.grad(loss)(params, True)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    # train=True -> fused_attn_block_train (saved-P backward)
    out_train = block.apply({"params": params}, x, True)
    g_train = jax.grad(loss)(params, True)
    # train=False -> fused_attn_block (recompute backward)
    out_eval = block.apply({"params": params}, x, False)

    np.testing.assert_allclose(out_train, out_ref, atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(out_train, out_eval, atol=1e-6, rtol=1e-6)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    train_leaves = jax.tree_util.tree_leaves_with_path(g_train)
    for (pr, vr), (pt, vt) in zip(ref_leaves, train_leaves):
        assert pr == pt
        np.testing.assert_allclose(
            vt, vr, atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pr)}",
        )


def test_train_vs_recompute_grads_bitwise_close(monkeypatch):
    """Directly compare the two fused VJPs (no unfused reference): in fp32
    the saved-P backward must match the recompute backward to float
    round-off — they compute the same math from the same inputs."""
    from trainner_redux_tpu.ops.pallas.fused_block import (
        fused_attn_block,
        fused_attn_block_train,
    )

    rng = np.random.default_rng(2)
    b, hh, ww, c, nh, ws = 2, 16, 16, 24, 3, 8
    hd = c // nh
    n = ws * ws
    x = jnp.asarray(rng.standard_normal((b, hh, ww, c)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    be = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.standard_normal((3 * c,)) * 0.1, jnp.float32)
    wp = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bp = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, nh, n, n)) * 0.1, jnp.float32)
    s = jnp.ones((b,), jnp.float32)

    args = (x, g, be, wq, bq, wp, bp, bias, s)

    def f_rec(*a):
        return jnp.sum(fused_attn_block(*a, nh, hd, ws, 1e-5, True) ** 2)

    def f_sav(*a):
        return jnp.sum(fused_attn_block_train(*a, nh, hd, ws, 1e-5, True) ** 2)

    v_rec, g_rec = jax.value_and_grad(f_rec, argnums=tuple(range(8)))(*args)
    v_sav, g_sav = jax.value_and_grad(f_sav, argnums=tuple(range(8)))(*args)
    np.testing.assert_allclose(v_sav, v_rec, rtol=1e-6)
    for a, bgrad in zip(g_rec, g_sav):
        np.testing.assert_allclose(bgrad, a, atol=2e-5, rtol=2e-5)
