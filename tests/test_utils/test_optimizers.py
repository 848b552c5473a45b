"""Optimizer fidelity: SOAP, StableAdamW, schedule-free variants."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.optimizers import build_optimizer
from trainner_redux_tpu.utils.registry import OPTIMIZER_REGISTRY


def _quadratic_problem():
    key = jax.random.key(0)
    target = {
        "w": jax.random.normal(key, (8, 6)),
        "conv": jax.random.normal(jax.random.key(1), (3, 3, 4, 8)) * 0.5,
        "b": jnp.ones((6,)),
    }
    params = jax.tree.map(jnp.zeros_like, target)

    def loss_fn(p):
        return sum(
            jnp.sum((a - b) ** 2) for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(target))
        )

    return params, loss_fn


def _run(tx, params, loss_fn, steps=60):
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        return optax_apply(params, updates), state, loss

    import optax

    def optax_apply(p, u):
        return optax.apply_updates(p, u)

    first = None
    for _ in range(steps):
        params, state, loss = step(params, state)
        if first is None:
            first = float(loss)
    return float(loss_fn(params)), first, params, state


@pytest.mark.parametrize(
    "otype,kwargs",
    [
        ("soap", {"lr": 0.05, "precondition_frequency": 5}),
        ("stableadamw", {"lr": 0.05}),
        ("adanschedulefree", {"lr": 0.05}),
        ("adamwschedulefree", {"lr": 0.05}),
    ],
)
def test_optimizer_converges(otype, kwargs):
    params, loss_fn = _quadratic_problem()
    factory = OPTIMIZER_REGISTRY.get(otype)
    kw = dict(kwargs)
    lr = kw.pop("lr")
    tx = factory(lambda c: jnp.asarray(lr), **kw)
    final, first, params_out, state = _run(tx, params, loss_fn)
    assert np.isfinite(final)
    assert final < first * 0.2, f"{otype}: {first} -> {final} (insufficient descent)"
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params_out))


def test_soap_eigenbasis_updates():
    """The preconditioner eigenbasis must leave identity after freq steps."""
    from trainner_redux_tpu.optimizers.transforms import SoapState, soap

    params, loss_fn = _quadratic_problem()
    tx = soap(0.01, precondition_frequency=3)
    state = tx.init(params)
    import optax

    for _ in range(4):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert isinstance(state, SoapState)
    ql = state.ql["w"]
    assert not np.allclose(np.asarray(ql), np.eye(ql.shape[0]), atol=1e-3)
    # eigenbasis must be orthonormal
    np.testing.assert_allclose(
        np.asarray(ql.T @ ql), np.eye(ql.shape[0]), atol=1e-4
    )


def test_stable_adamw_clips_spikes():
    """A 1e6x gradient spike must not scale the update 1e6x."""
    from trainner_redux_tpu.optimizers.transforms import stable_adamw

    tx = stable_adamw(0.1, clip_threshold=1.0)
    p = {"w": jnp.ones((4, 4))}
    state = tx.init(p)
    g_normal = {"w": jnp.full((4, 4), 0.1)}
    updates, state = tx.update(g_normal, state, p)
    base = float(jnp.abs(updates["w"]).max())
    g_spike = {"w": jnp.full((4, 4), 1e6)}
    updates, state = tx.update(g_spike, state, p)
    spike = float(jnp.abs(updates["w"]).max())
    assert spike < base * 50, f"update exploded: {base} -> {spike}"


def test_schedule_free_respects_schedule():
    """adamwschedulefree with a decayed schedule must shrink its steps."""
    factory = OPTIMIZER_REGISTRY.get("adamwschedulefree")

    def schedule(c):
        return jnp.where(c < 5, 1e-2, 1e-6)

    tx = factory(schedule)
    import optax

    p = {"w": jnp.ones((4,))}
    state = tx.init(p)
    g = {"w": jnp.full((4,), 1.0)}
    sizes = []
    for _ in range(10):
        updates, state = tx.update(g, state, p)
        sizes.append(float(jnp.abs(updates["w"]).max()))
        p = optax.apply_updates(p, updates)
    # updates shrink once the schedule decays (the residual motion is the
    # z-interpolation term, which is schedule-free by design)
    assert sizes[-1] < sizes[1] * 0.5, sizes
    assert sizes[7] < sizes[3], sizes


def test_adan_sf_eval_params():
    from trainner_redux_tpu.optimizers.transforms import (
        adan_schedule_free,
        schedule_free_eval_params,
    )

    params, loss_fn = _quadratic_problem()
    tx = adan_schedule_free(0.05)
    state = tx.init(params)
    import optax

    for _ in range(5):
        grads = jax.grad(loss_fn)(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    ev = schedule_free_eval_params(state, params)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(ev))
    # eval params differ from train params (y vs x sequence)
    assert not np.allclose(np.asarray(ev["w"]), np.asarray(params["w"]))


def test_build_optimizer_integration():
    """The registry path: build_optimizer resolves new types with schedules."""
    for otype in ("SOAP", "StableAdamW", "AdanScheduleFree"):
        tx, sched = build_optimizer(
            {"type": otype, "lr": 1e-3},
            total_iter=100,
            scheduler_opt={"type": "MultiStepLR", "milestones": [50], "gamma": 0.5},
        )
        p = {"w": jnp.ones((4, 4))}
        state = tx.init(p)
        updates, _ = tx.update({"w": jnp.full((4, 4), 0.1)}, state, p)
        assert np.isfinite(np.asarray(updates["w"])).all()
