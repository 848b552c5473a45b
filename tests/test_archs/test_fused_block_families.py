"""Fused-kernel paths across transformer families vs their unfused flax
paths, same params (Pallas interpreter on CPU).

Families wired this round: HAT (HAB + OCAB pre-LN MLP halves), SRFormer
(MLP half), SRFormerV2 SwinBlockV2 (full fused block). DRCT inherits the
full fused block by reusing swinir_arch.SwinBlock (covered by
test_swinir_fused_block.py). Reference semantics:
/root/reference/traiNNer/archs/hat_arch.py, srformer_arch.py,
srformerv2_arch.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _x(b, h, w, c, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, h, w, c)), jnp.float32
    )


def _compare(monkeypatch, block, call_args, atol=3e-5, grads=False):
    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    params = block.init(jax.random.key(0), *call_args)["params"]
    out_ref = block.apply({"params": params}, *call_args)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    params_fused = block.init(jax.random.key(0), *call_args)["params"]
    assert jax.tree.structure(params_fused) == jax.tree.structure(params)
    out_fused = block.apply({"params": params}, *call_args)
    np.testing.assert_allclose(out_fused, out_ref, atol=atol, rtol=atol)

    if grads:
        def loss(p, env):
            monkeypatch.setenv("TRAINNER_FUSED_BLOCK", env)
            return jnp.sum(block.apply({"params": p}, *call_args) ** 2)

        g_ref = jax.grad(lambda p: loss(p, "0"))(params)
        g_fused = jax.grad(lambda p: loss(p, "interpret"))(params)
        for (pr, vr), (pf, vf) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_fused),
        ):
            assert pr == pf
            np.testing.assert_allclose(
                vf, vr, atol=2e-3, rtol=2e-3, err_msg=jax.tree_util.keystr(pr)
            )


@pytest.mark.parametrize(
    "shift", [pytest.param(0, marks=pytest.mark.slow), 4]
)
def test_hat_hab_fused_mlp(monkeypatch, shift):
    from trainner_redux_tpu.archs.hat_arch import HAB

    block = HAB(
        dim=24, num_heads=3, window_size=8, shift_size=shift,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    _compare(monkeypatch, block, (_x(2, 16, 16, 24), False), grads=(shift == 0))


def test_hat_ocab_fused_mlp(monkeypatch):
    from trainner_redux_tpu.archs.hat_arch import OCAB

    block = OCAB(dim=24, num_heads=3, window_size=8, mlp_ratio=2.0,
                 dtype=jnp.float32)
    _compare(monkeypatch, block, (_x(2, 16, 16, 24), False))


@pytest.mark.parametrize("shift", [0, 4])
def test_srformer_block_fused_mlp(monkeypatch, shift):
    from trainner_redux_tpu.archs.srformer_arch import SRFormerBlock

    block = SRFormerBlock(
        dim=24, num_heads=3, window_size=8, shift_size=shift,
        mlp_ratio=2.0, drop_path=0.0, dtype=jnp.float32,
    )
    _compare(monkeypatch, block, (_x(2, 16, 16, 24), False))


@pytest.mark.parametrize("shift", [0, 4])
def test_srformerv2_swinblock_full_fused(monkeypatch, shift):
    from trainner_redux_tpu.archs.srformerv2_arch import SwinBlockV2

    block = SwinBlockV2(
        dim=24, num_heads=3, window_size=8, shift_size=shift,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    _compare(monkeypatch, block, (_x(2, 16, 16, 24),), grads=(shift == 4))
