"""Swin2Block fused-v2 kernel path vs the unfused flax path, same params.

The fused post-norm cosine-attention kernels (TRAINNER_FUSED_BLOCK=interpret
-> Pallas interpreter on CPU) must produce the same forward values and
parameter gradients as the plain composition (TRAINNER_FUSED_BLOCK=0), and
declare an identical parameter tree. Reference semantics:
/root/reference/traiNNer/archs/swin2sr_arch.py (SwinV2 cosine attention,
post-norm residuals)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs.swin2sr_arch import Swin2Block


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        out = []
        for k, v in tree.items():
            out += _tree_paths(v, f"{prefix}/{k}")
        return out
    return [(prefix, jnp.shape(tree))]


@pytest.mark.parametrize(
    "shift", [pytest.param(0, marks=pytest.mark.slow), 4]
)
def test_swin2_fused_matches_unfused(monkeypatch, shift):
    b, h, w, c, nh = 2, 16, 24, 24, 3
    block = Swin2Block(
        dim=c, num_heads=nh, window_size=8, shift_size=shift,
        mlp_ratio=2.0, drop_path=0.0, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, c)), jnp.float32
    )

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    params_ref = block.init(jax.random.key(0), x, False)["params"]

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    params_fused = block.init(jax.random.key(0), x, False)["params"]
    assert sorted(_tree_paths(params_fused)) == sorted(_tree_paths(params_ref))

    def loss(p):
        return jnp.sum(block.apply({"params": p}, x, True) ** 2)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    out_ref = block.apply({"params": params_ref}, x, True)
    g_ref = jax.grad(loss)(params_ref)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    out_fused = block.apply({"params": params_ref}, x, True)
    g_fused = jax.grad(loss)(params_ref)

    np.testing.assert_allclose(out_fused, out_ref, atol=3e-5, rtol=3e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(g_ref)
    fused_leaves = jax.tree_util.tree_leaves_with_path(g_fused)
    assert len(ref_leaves) == len(fused_leaves)
    for (pr, vr), (pf, vf) in zip(ref_leaves, fused_leaves):
        assert pr == pf
        np.testing.assert_allclose(
            vf, vr, atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pr)}",
        )
