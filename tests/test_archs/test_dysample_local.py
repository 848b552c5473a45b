"""dysample_local (gather-free windowed resampler) vs the exact gather path.

The windowed formulation must be BIT-MEANINGFULLY exact (fp32 association
noise only) against the grid_sample-semantics gather path whenever offsets
stay inside the window radius — including at image borders, where both
paths border-clamp. Reference semantics: /root/reference/traiNNer/
archs/arch_util.py:368-402 (grid_sample bilinear, padding_mode='border').
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from trainner_redux_tpu.archs.arch_util import (  # noqa: E402
    bilinear_sample,
    dysample_local,
)


def _gather_reference(x, off_in, s, g):
    """The exact gather path, inlined from DySample.__call__'s 'gather'
    branch (output-resolution coords + per-group bilinear_sample)."""
    n, h, w, c = x.shape
    cg = c // g
    off = off_in.transpose(0, 4, 1, 5, 2, 6, 3).reshape(n, g, h * s, w * s, 2)
    anchor = (jnp.arange(s) - (s - 1) / 2.0) / s
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), s) + jnp.tile(anchor, h)
    xs = jnp.repeat(jnp.arange(w, dtype=jnp.float32), s) + jnp.tile(anchor, w)
    base_y = jnp.broadcast_to(ys[:, None], (h * s, w * s))
    base_x = jnp.broadcast_to(xs[None, :], (h * s, w * s))
    outs = []
    for gi in range(g):
        cx = base_x[None] + off[:, gi, :, :, 0].astype(jnp.float32)
        cy = base_y[None] + off[:, gi, :, :, 1].astype(jnp.float32)
        outs.append(bilinear_sample(x[..., gi * cg : (gi + 1) * cg], cy, cx))
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("hw", [(8, 8), (12, 10)])
@pytest.mark.parametrize("off_scale", [0.02, 1.0, 3.0])
def test_local_matches_gather_within_window(hw, off_scale):
    h, w = hw
    n, c, g, s, r = 2, 16, 4, 2, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    # offsets up to +-off_scale; with anchor +-0.25 stays within radius 4
    off = jnp.asarray(
        rng.uniform(-off_scale, off_scale, (n, h, w, 2, g, s, s)), jnp.float32
    )
    y_local = dysample_local(x, off, s, g, r)
    y_gather = _gather_reference(x, off, s, g)
    np.testing.assert_allclose(
        np.asarray(y_local), np.asarray(y_gather), atol=2e-5, rtol=0
    )


def test_border_clamp_matches_gather():
    """Offsets pushing far outside the image: both paths border-clamp."""
    n, h, w, c, g, s, r = 1, 6, 6, 8, 4, 2, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.zeros((n, h, w, 2, g, s, s), jnp.float32)
    # push every sample 3.5 px toward the top-left: interior pixels stay in
    # window (exact), border pixels clamp identically in both paths
    off = off - 3.5
    y_local = dysample_local(x, off, s, g, r)
    y_gather = _gather_reference(x, off, s, g)
    np.testing.assert_allclose(
        np.asarray(y_local), np.asarray(y_gather), atol=2e-5, rtol=0
    )


@pytest.mark.slow
def test_local_grads_are_dense_and_finite():
    """The windowed path must produce finite grads for x AND offsets
    without any scatter in the backward (the whole point of the design)."""
    n, h, w, c, g, s, r = 1, 8, 8, 8, 4, 2, 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    off = jnp.asarray(
        rng.uniform(-0.4, 0.4, (n, h, w, 2, g, s, s)), jnp.float32
    )

    def loss(x_, off_):
        return jnp.sum(dysample_local(x_, off_, s, g, r) ** 2)

    gx, goff = jax.grad(loss, argnums=(0, 1))(x, off)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(goff)).all()
    assert float(jnp.abs(goff).max()) > 0  # offsets receive gradient
    # static integer indexing may legitimately appear as sorted/unique
    # gathers (XLA lowers them to slices); what must NOT appear is a
    # data-dependent gather/scatter (indices_are_sorted=False)
    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(x, off))
    assert "indices_are_sorted=False" not in jaxpr
