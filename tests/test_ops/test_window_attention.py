"""Fused Pallas window-MHSA vs the plain-XLA formulation (interpret mode).

Covers forward + backward (dqkv and dbias), unshifted (1 bias kind) and
shifted (4 mask kinds), at SwinIR-like geometry. Reference semantics:
/root/reference/traiNNer/archs/swinir_arch.py:77-136 (WindowAttention).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.ops.pallas.window_attention import (
    fused_window_mhsa,
    reference_window_mhsa,
    shift_mask_kinds,
)


def _bias_full_from_kinds(bias_kinds, nwh, nww):
    """Expand (K, nh, n, n) kind bias to per-window (nW, nh, n, n)."""
    k = bias_kinds.shape[0]
    if k == 1:
        return jnp.broadcast_to(bias_kinds, (nwh * nww,) + bias_kinds.shape[1:])
    rows = []
    for i in range(nwh):
        for j in range(nww):
            kind = (2 if i == nwh - 1 else 0) + (1 if j == nww - 1 else 0)
            rows.append(bias_kinds[kind])
    return jnp.stack(rows)


@pytest.mark.parametrize("shifted", [False, True])
def test_fused_window_mhsa_forward_and_grads(shifted):
    b, hh, ww = 2, 16, 24
    nh, hd, ws = 3, 8, 8
    c = nh * hd
    n = ws * ws
    nwh, nww = hh // ws, ww // ws
    rng = np.random.default_rng(0 if shifted else 1)

    qkv = jnp.asarray(rng.standard_normal((b, hh, ww, 3 * c)), jnp.float32)
    rel_bias = jnp.asarray(rng.standard_normal((nh, n, n)) * 0.1, jnp.float32)
    if shifted:
        masks = jnp.asarray(shift_mask_kinds(ws, ws // 2))  # (4, n, n)
        bias_kinds = rel_bias[None] + masks[:, None]  # (4, nh, n, n)
    else:
        bias_kinds = rel_bias[None]  # (1, nh, n, n)

    def fused(qkv, bias_kinds):
        out = fused_window_mhsa(qkv, bias_kinds, nh, hd, ws, True)
        return out

    def ref(qkv, bias_kinds):
        bias_full = _bias_full_from_kinds(bias_kinds, nwh, nww)
        return reference_window_mhsa(qkv, bias_full, nh, hd, ws)

    out_fused = fused(qkv, bias_kinds)
    out_ref = ref(qkv, bias_kinds)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=2e-5, rtol=1e-5
    )

    g = jnp.asarray(rng.standard_normal(out_ref.shape), jnp.float32)

    def loss_fused(qkv, bk):
        return jnp.sum(fused(qkv, bk) * g)

    def loss_ref(qkv, bk):
        return jnp.sum(ref(qkv, bk) * g)

    dq_f, db_f = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias_kinds)
    dq_r, db_r = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias_kinds)
    np.testing.assert_allclose(np.asarray(dq_f), np.asarray(dq_r), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r), atol=5e-5, rtol=1e-4)


def test_swinir_fused_wiring_matches_plain(monkeypatch):
    """The SwinBlock fused path (qkv layout, shift handling, bias kinds)
    must produce the same output as the window-partition XLA path."""
    import trainner_redux_tpu.ops.pallas.window_attention as wa
    from trainner_redux_tpu.archs.swinir_arch import SwinIR

    model = SwinIR(
        upscale=2, embed_dim=16, depths=(2,), num_heads=(2,), window_size=8,
        upsampler="pixelshuffledirect", drop_path_rate=0.0,
    )
    x = jnp.asarray(
        np.random.default_rng(7).random((1, 16, 16, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), x, train=False)
    ref = model.apply(params, x, train=False)

    orig = wa.fused_window_mhsa
    monkeypatch.setattr(
        wa, "fused_window_mhsa_supported", lambda *a, **k: True
    )
    monkeypatch.setattr(
        wa,
        "fused_window_mhsa",
        lambda qkv, bk, nh, hd, ws: orig(qkv, bk, nh, hd, ws, True),
    )
    fused = model.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "family", [pytest.param("hat", marks=pytest.mark.slow), "atd"]
)
def test_hat_atd_fused_wiring_matches_plain(monkeypatch, family):
    """HAT's HAB and ATD's ATDLayer reuse swinir WindowAttention; their fused
    wiring (shift handling, mask kinds) must match the partitioned path."""
    import trainner_redux_tpu.ops.pallas.window_attention as wa

    if family == "hat":
        from trainner_redux_tpu.archs.hat_arch import HAT

        model = HAT(
            upscale=2, embed_dim=16, depths=(2,), num_heads=(2,),
            window_size=8, upsampler="pixelshuffledirect",
        )
        x_hw = 16
    else:
        from trainner_redux_tpu.archs.atd_arch import ATD

        model = ATD(
            upscale=2, embed_dim=16, depths=(2,), num_heads=(2,),
            window_size=8, category_size=16, num_tokens=8, reducted_dim=4,
            upsampler="pixelshuffledirect",
        )
        x_hw = 16
    x = jnp.asarray(
        np.random.default_rng(11).random((1, x_hw, x_hw, 3)), jnp.float32
    )
    params = model.init(jax.random.key(0), x, train=False)
    ref = model.apply(params, x, train=False)

    orig = wa.fused_window_mhsa
    monkeypatch.setattr(wa, "fused_window_mhsa_supported", lambda *a, **k: True)
    monkeypatch.setattr(
        wa,
        "fused_window_mhsa",
        lambda qkv, bk, nh, hd, ws: orig(qkv, bk, nh, hd, ws, True),
    )
    fused = model.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_shift_mask_kinds_match_reference_mask():
    """The 4 kind masks must reproduce the reference's calculate_mask for
    every window position (swinir_arch.py:240-266 semantics)."""
    from trainner_redux_tpu.archs.swinir_arch import _attn_mask

    ws, shift = 8, 4
    hp, wp = 24, 32
    nwh, nww = hp // ws, wp // ws
    ref = _attn_mask(hp, wp, ws, shift)  # (nW, n, n)
    kinds = shift_mask_kinds(ws, shift)  # (4, n, n)
    for i in range(nwh):
        for j in range(nww):
            kind = (2 if i == nwh - 1 else 0) + (1 if j == nww - 1 else 0)
            np.testing.assert_array_equal(ref[i * nww + j], kinds[kind])
