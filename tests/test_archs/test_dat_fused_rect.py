"""DAT fused rectangular-window MHSA vs the unfused path, same params.

fused_rect_mhsa (interpret mode) must reproduce AdaptiveSpatialAttention's
values and parameter gradients for both orientations, shifted and
unshifted. Reference: /root/reference/traiNNer/archs/dat_arch.py
(Spatial_Attention dual-branch rect windows + dynamic position bias)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs.dat_arch import AdaptiveSpatialAttention


@pytest.mark.parametrize(
    "do_shift", [pytest.param(False, marks=pytest.mark.slow), True]
)
def test_rect_fused_matches_unfused(monkeypatch, do_shift):
    b, h, w, c, nh = 2, 8, 16, 32, 4
    mod = AdaptiveSpatialAttention(
        dim=c, num_heads=nh, split_size=(2, 4), shift_size=(1, 2),
        do_shift=do_shift, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b, h, w, c)), jnp.float32
    )

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "0")
    params = mod.init(jax.random.key(0), x, False)["params"]

    def loss(p):
        return jnp.sum(mod.apply({"params": p}, x, True) ** 2)

    out_ref = mod.apply({"params": params}, x, True)
    g_ref = jax.grad(loss)(params)

    monkeypatch.setenv("TRAINNER_FUSED_BLOCK", "interpret")
    params_fused = mod.init(jax.random.key(0), x, False)["params"]
    assert jax.tree.structure(params_fused) == jax.tree.structure(params)
    out_fused = mod.apply({"params": params}, x, True)
    g_fused = jax.grad(loss)(params)

    np.testing.assert_allclose(out_fused, out_ref, atol=3e-5, rtol=3e-5)
    for (pr, vr), (pf, vf) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        assert pr == pf
        np.testing.assert_allclose(
            vf, vr, atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pr)}",
        )
