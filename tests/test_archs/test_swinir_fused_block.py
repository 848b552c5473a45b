"""SwinBlock fused-kernel path vs the unfused flax path, same params.

The fused path (TRAINNER_FUSED_BLOCK=interpret -> Pallas interpreter on CPU)
must produce the same forward values and parameter gradients as the plain
flax composition (TRAINNER_FUSED_BLOCK=0), and must declare an identical
parameter tree (checkpoint/converter compatibility). Reference semantics:
/root/reference/traiNNer/archs/swinir_arch.py:139-229.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs.swinir_arch import SwinBlock


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
def test_fused_block_matches_unfused(monkeypatch, shift):
    b, h, w, c, nh = 2, 16, 24, 24, 3
    block = SwinBlock(
        dim=c, num_heads=nh, window_size=8, shift_size=shift,
        mlp_ratio=2.0, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, c)), jnp.float32
    )

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    params_ref = block.init(jax.random.key(0), x, False)["params"]

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    params_fused = block.init(jax.random.key(0), x, False)["params"]

    # identical checkpoint tree (names + shapes)
    assert sorted(_tree_paths(params_fused)) == sorted(_tree_paths(params_ref))

    def run(params):
        return block.apply({"params": params}, x, False)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    out_ref = run(params_ref)
    g_ref = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params_ref)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    out_fused = run(params_ref)
    g_fused = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params_ref)

    np.testing.assert_allclose(out_fused, out_ref, atol=3e-5, rtol=3e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fused = jax.tree_util.tree_leaves_with_path(g_fused)
    for (pr, vr), (pf, vf) in zip(flat_ref, flat_fused):
        assert pr == pf
        np.testing.assert_allclose(
            vf, vr, atol=2e-3, rtol=2e-3,
            err_msg=jax.tree_util.keystr(pr),
        )
