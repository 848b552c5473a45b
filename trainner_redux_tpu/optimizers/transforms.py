"""Custom optax transforms: SOAP, StableAdamW, AdanScheduleFree.

Faithful JAX implementations of the optimizers the reference takes from
pytorch-optimizer / bundles locally:
- SOAP (arXiv:2409.11321): Adam in Shampoo's eigenbasis; per-matrix L/R
  gradient covariances, eigenbasis refresh every `precondition_frequency`
  steps via eigh under lax.cond (reference optimizers/__init__.py:30-31).
- StableAdamW (arXiv:2304.13013): AdamW with per-tensor RMS learning-rate
  clipping lr/max(1, RMS(g^2/v_hat)/clip_threshold).
- AdanScheduleFree: the reference's local schedule-free Adan
  (reference optimizers/adanschedulefree_optim.py:12-272): Adan moments on
  the gradient + gradient difference, z-iterate averaging with
  ckp1 = w_t / sum(w) interpolation, warmup via effective-lr tracking.

Everything is jit-compatible: static per-leaf python branching on shapes,
traced lax.cond only for the periodic eigendecomposition.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray] | float


def _sched(learning_rate: Schedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return jnp.asarray(learning_rate(count), jnp.float32)
    return jnp.asarray(learning_rate, jnp.float32)


# ---------------------------------------------------------------------------
# SOAP
# ---------------------------------------------------------------------------


class SoapState(NamedTuple):
    count: jnp.ndarray
    m: Any
    v: Any
    lmat: Any
    rmat: Any
    ql: Any
    qr: Any


def soap(
    learning_rate: Schedule,
    b1: float = 0.95,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    precondition_frequency: int = 10,
    max_precond_dim: int = 4096,
    shampoo_beta: float | None = None,
) -> optax.GradientTransformation:
    sb = b2 if shampoo_beta is None else shampoo_beta

    def _dims(p) -> tuple[int, int] | None:
        if p.ndim < 2 or p.size <= 1:
            return None
        return int(np.prod(p.shape[:-1])), int(p.shape[-1])

    def init(params):
        def zeros_like(p):
            return jnp.zeros(p.shape, jnp.float32)

        def mat(p, side):
            d = _dims(p)
            if d is None:
                return jnp.zeros(())
            n = d[0] if side == 0 else d[1]
            if n > max_precond_dim:
                return jnp.zeros(())
            return jnp.zeros((n, n), jnp.float32)

        def eye(p, side):
            d = _dims(p)
            if d is None:
                return jnp.zeros(())
            n = d[0] if side == 0 else d[1]
            if n > max_precond_dim:
                return jnp.zeros(())
            return jnp.eye(n, dtype=jnp.float32)

        return SoapState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(zeros_like, params),
            v=jax.tree.map(
                lambda p: jnp.zeros(_dims(p) or p.shape, jnp.float32), params
            ),
            lmat=jax.tree.map(lambda p: mat(p, 0), params),
            rmat=jax.tree.map(lambda p: mat(p, 1), params),
            ql=jax.tree.map(lambda p: eye(p, 0), params),
            qr=jax.tree.map(lambda p: eye(p, 1), params),
        )

    def update(grads, state, params):
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        do_eig = (count % precondition_frequency) == 0
        lr = _sched(learning_rate, count - 1)

        def leaf(g, p, m, v, lm, rm, ql, qr):
            g = g.astype(jnp.float32)
            m_new = b1 * m + (1 - b1) * g
            d = _dims(p)
            if d is None:  # vectors/scalars: plain AdamW
                v_new = b2 * v + (1 - b2) * g * g
                u = (m_new / bc1) / (jnp.sqrt(v_new / bc2) + eps)
                upd = -lr * (u + weight_decay * p)
                return upd.astype(p.dtype), m_new, v_new, lm, rm, ql, qr

            d1, d2 = d
            gm = g.reshape(d1, d2)
            has_l, has_r = d1 <= max_precond_dim, d2 <= max_precond_dim

            def rot(x, transpose=False):
                if has_l:
                    x = (ql.T if not transpose else ql) @ x
                if has_r:
                    x = x @ (qr if not transpose else qr.T)
                return x

            g_r = rot(gm)
            v_new = b2 * v + (1 - b2) * g_r * g_r
            m_r = rot(m_new.reshape(d1, d2))
            u_r = (m_r / bc1) / (jnp.sqrt(v_new / bc2) + eps)
            u = rot(u_r, transpose=True).reshape(p.shape)
            upd = -lr * (u + weight_decay * p)

            lm_new = sb * lm + (1 - sb) * (gm @ gm.T) if has_l else lm
            rm_new = sb * rm + (1 - sb) * (gm.T @ gm) if has_r else rm

            def refresh(q, cov):
                _, vecs = jnp.linalg.eigh(cov)
                return vecs[:, ::-1]  # descending eigenvalue order

            ql_new = (
                jax.lax.cond(do_eig, lambda: refresh(ql, lm_new), lambda: ql)
                if has_l else ql
            )
            qr_new = (
                jax.lax.cond(do_eig, lambda: refresh(qr, rm_new), lambda: qr)
                if has_r else qr
            )
            return upd.astype(p.dtype), m_new, v_new, lm_new, rm_new, ql_new, qr_new

        out = jax.tree.map(
            leaf, grads, params, state.m, state.v, state.lmat, state.rmat,
            state.ql, state.qr,
        )
        treedef = jax.tree.structure(grads)
        flat = treedef.flatten_up_to(out)
        cols = list(zip(*flat))
        unflat = [treedef.unflatten(c) for c in cols]
        new_state = SoapState(count, *unflat[1:])
        return unflat[0], new_state

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# StableAdamW
# ---------------------------------------------------------------------------


class StableAdamWState(NamedTuple):
    count: jnp.ndarray
    m: Any
    v: Any


def stable_adamw(
    learning_rate: Schedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    clip_threshold: float = 1.0,
) -> optax.GradientTransformation:
    def init(params):
        z = lambda p: jnp.zeros(p.shape, jnp.float32)
        return StableAdamWState(
            jnp.zeros((), jnp.int32), jax.tree.map(z, params), jax.tree.map(z, params)
        )

    def update(grads, state, params):
        count = state.count + 1
        fc = count.astype(jnp.float32)
        bc1, bc2 = 1.0 - b1**fc, 1.0 - b2**fc
        lr = _sched(learning_rate, count - 1)

        def leaf(g, p, m, v):
            g = g.astype(jnp.float32)
            m_new = b1 * m + (1 - b1) * g
            v_new = b2 * v + (1 - b2) * g * g
            v_hat = v_new / bc2
            # per-tensor RMS of g^2 / v_hat -> lr clipping (StableAdamW eq. 3)
            rms = jnp.sqrt(jnp.mean(g * g / jnp.maximum(v_hat, eps * eps)))
            eta = lr / jnp.maximum(1.0, rms / clip_threshold)
            u = (m_new / bc1) / (jnp.sqrt(v_hat) + eps)
            upd = -eta * (u + weight_decay * p)
            return upd.astype(p.dtype), m_new, v_new

        out = jax.tree.map(leaf, grads, params, state.m, state.v)
        treedef = jax.tree.structure(grads)
        cols = list(zip(*treedef.flatten_up_to(out)))
        unflat = [treedef.unflatten(c) for c in cols]
        return unflat[0], StableAdamWState(count, unflat[1], unflat[2])

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# AdanScheduleFree
# ---------------------------------------------------------------------------


class AdanSFState(NamedTuple):
    count: jnp.ndarray
    weight_sum: jnp.ndarray
    lr_max: jnp.ndarray
    m: Any
    v: Any
    diff: Any
    neg_pre: Any
    z: Any


def adan_schedule_free(
    learning_rate: Schedule,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    warmup_steps: int = 0,
    r: float = 0.0,
    weight_lr_power: float = 2.0,
) -> optax.GradientTransformation:
    """Schedule-free Adan. The params ARE the evaluation sequence 'y'; the
    averaged iterate z lives in the state (reference
    adanschedulefree_optim.py:209-272)."""

    def init(params):
        z = lambda p: jnp.zeros(p.shape, jnp.float32)
        return AdanSFState(
            count=jnp.zeros((), jnp.int32),
            weight_sum=jnp.zeros((), jnp.float32),
            lr_max=jnp.asarray(-1.0, jnp.float32),
            m=jax.tree.map(z, params),
            v=jax.tree.map(z, params),
            diff=jax.tree.map(z, params),
            neg_pre=jax.tree.map(z, params),
            z=jax.tree.map(lambda p: p.astype(jnp.float32), params),
        )

    def update(grads, state, params):
        count = state.count + 1
        fc = count.astype(jnp.float32)
        bc1 = 1.0 - b1**fc
        bc2 = 1.0 - b2**fc
        bc3_sqrt = jnp.sqrt(1.0 - b3**fc)
        lr = _sched(learning_rate, count - 1)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(fc / warmup_steps, 1.0)
        lr_max = jnp.maximum(lr, state.lr_max)
        weight = fc**r * lr_max**weight_lr_power
        weight_sum = state.weight_sum + weight
        ckp1 = jnp.where(weight_sum > 0, weight / weight_sum, 0.0)

        step_size = lr / bc1 * (1 - ckp1)
        step_size_diff = lr * b2 / bc2 * (1 - ckp1)

        def leaf(g, p, m, v, diff, neg_pre, z):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            # first step: neg_pre starts at -g so the difference term is 0
            neg_pre = jnp.where(count == 1, -g, neg_pre)
            gdiff = neg_pre + g
            m_new = b1 * m + (1 - b1) * g
            diff_new = b2 * diff + (1 - b2) * gdiff
            # n_t uses g + b2 * gdiff (Adan's corrected second moment)
            nt = g + b2 * gdiff
            v_new = b3 * v + (1 - b3) * nt * nt
            denom = jnp.sqrt(v_new) / bc3_sqrt + eps

            y = p32 + ckp1 * (z - p32)           # lerp toward z
            y = y * (1 - lr * weight_decay)
            y = y - step_size * (m_new / denom)
            y = y - step_size_diff * (diff_new / denom)

            z_new = z - (lr / bc1) * (m_new / denom)
            z_new = z_new - (lr * b2 / bc2) * (diff_new / denom)

            upd = (y - p32).astype(p.dtype)
            return upd, m_new, v_new, diff_new, -g, z_new

        out = jax.tree.map(
            leaf, grads, params, state.m, state.v, state.diff, state.neg_pre,
            state.z,
        )
        treedef = jax.tree.structure(grads)
        cols = list(zip(*treedef.flatten_up_to(out)))
        unflat = [treedef.unflatten(c) for c in cols]
        new_state = AdanSFState(
            count, weight_sum, lr_max, unflat[1], unflat[2], unflat[3],
            unflat[4], unflat[5],
        )
        return unflat[0], new_state

    return optax.GradientTransformation(init, update)


def schedule_free_eval_params(opt_state: Any, params: Any, b1: float = 0.98) -> Any:
    """Return the x-sequence (evaluation) weights for a schedule-free state:
    x = (1 - 1/b1) * y + (1/b1) * z equivalent via lerp(y -> z, 1 - 1/b1)
    ... following the reference's optimizer.eval() (adanschedulefree_optim.py:75-84).
    """
    # locate an AdanSFState in the (possibly chained) optax state
    def find(state):
        if isinstance(state, AdanSFState):
            return state
        if isinstance(state, (tuple, list)):
            for sub in state:
                found = find(sub)
                if found is not None:
                    return found
        return None

    sf = find(opt_state)
    if sf is None:
        return params
    w = 1.0 - 1.0 / b1
    return jax.tree.map(lambda y, z: y + w * (z - y), params, sf.z)
