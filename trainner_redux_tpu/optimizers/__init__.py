"""Optimizer factories over optax.

Parity with the reference's optimizer registry
(/root/reference/traiNNer/optimizers/__init__.py:30-31 + local Adan/
ScheduleFree/ADOPT implementations): config dicts use the torch argument
surface (lr, betas, weight_decay, eps, ...) and are translated to optax
GradientTransformations. The LR is a schedule function injected by the model
layer so the whole optimizer runs inside the jitted step.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import jax.numpy as jnp
import optax

from trainner_redux_tpu.utils.registry import OPTIMIZER_REGISTRY

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _common(opt: dict[str, Any]) -> dict[str, Any]:
    """Translate torch-style kwargs to optax-style."""
    out: dict[str, Any] = {}
    if "betas" in opt:
        betas = opt.pop("betas")
        out["b1"], out["b2"] = float(betas[0]), float(betas[1])
        if len(betas) > 2:
            out["b3"] = float(betas[2])
    if "eps" in opt:
        out["eps"] = float(opt.pop("eps"))
    if "weight_decay" in opt:
        out["weight_decay"] = float(opt.pop("weight_decay"))
    return out


@OPTIMIZER_REGISTRY.register(name="adam")
def adam(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    kw = _common(opt)
    kw.pop("weight_decay", None)  # torch Adam's weight_decay is L2; rarely used here
    return optax.adam(learning_rate, **kw)


@OPTIMIZER_REGISTRY.register(name="adamw")
def adamw(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    return optax.adamw(learning_rate, **_common(opt))


@OPTIMIZER_REGISTRY.register(name="nadam")
def nadam(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    kw = _common(opt)
    kw.pop("weight_decay", None)
    return optax.nadam(learning_rate, **kw)


@OPTIMIZER_REGISTRY.register(name="nadamw")
def nadamw(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    return optax.nadamw(learning_rate, **_common(opt))


@OPTIMIZER_REGISTRY.register(name="adan")
def adan(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    return optax.adan(learning_rate, **_common(opt))


@OPTIMIZER_REGISTRY.register(name="adopt")
def adopt(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    from optax import contrib

    kw = _common(opt)
    wd = kw.pop("weight_decay", 0.0)
    tx = contrib.adopt(learning_rate, **kw)
    if wd:
        tx = optax.chain(optax.add_decayed_weights(wd), tx)
    return tx


@OPTIMIZER_REGISTRY.register(name="adamwschedulefree")
def adamw_schedule_free(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    """Schedule-free AdamW: momentum moved into the schedule-free z/y
    averaging, base AdamW runs with b1=0. The LR *schedule* is respected —
    optax contrib.schedule_free accepts a callable learning_rate."""
    from optax import contrib

    kw = _common(opt)
    b1 = kw.pop("b1", 0.9)
    warmup = int(opt.pop("warmup_steps", 0) or 0)
    lr = learning_rate
    if warmup > 0 and callable(learning_rate):
        base = learning_rate

        def lr(count):  # reference AdamWScheduleFree's linear warmup
            return base(count) * jnp.minimum((count + 1.0) / warmup, 1.0)

    base_tx = optax.adamw(lr, b1=0.0, **kw)
    return contrib.schedule_free(base_tx, learning_rate=lr, b1=b1)


@OPTIMIZER_REGISTRY.register(name="adanschedulefree")
def adanschedulefree(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    from trainner_redux_tpu.optimizers.transforms import adan_schedule_free

    kw = _common(opt)
    return adan_schedule_free(
        learning_rate,
        b1=kw.get("b1", 0.98), b2=kw.get("b2", 0.92), b3=kw.get("b3", 0.99),
        eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 0.0),
        warmup_steps=int(opt.pop("warmup_steps", 0) or 0),
        r=float(opt.pop("r", 0.0)),
        weight_lr_power=float(opt.pop("weight_lr_power", 2.0)),
    )


@OPTIMIZER_REGISTRY.register(name="stableadamw")
def stable_adamw(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    """True StableAdamW: per-tensor RMS(g^2/v_hat) learning-rate clipping
    (arXiv:2304.13013), not optax adaptive_grad_clip."""
    from trainner_redux_tpu.optimizers.transforms import stable_adamw as _stable

    kw = _common(opt)
    return _stable(
        learning_rate,
        b1=kw.get("b1", 0.9), b2=kw.get("b2", 0.999),
        eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 0.0),
        clip_threshold=float(opt.pop("clip_threshold", 1.0)),
    )


@OPTIMIZER_REGISTRY.register(name="lion")
def lion(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    return optax.lion(learning_rate, **_common(opt))


@OPTIMIZER_REGISTRY.register(name="prodigy")
def prodigy(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    from optax import contrib

    kw = _common(opt)
    kw.pop("weight_decay", None)
    lr = learning_rate(0) if callable(learning_rate) else learning_rate
    return contrib.prodigy(learning_rate=float(lr), **kw)


@OPTIMIZER_REGISTRY.register(name="soap")
def soap(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    """True SOAP (arXiv:2409.11321): Adam in the Shampoo eigenbasis with
    periodic eigh preconditioner refresh (transforms.soap)."""
    from trainner_redux_tpu.optimizers.transforms import soap as _soap

    kw = _common(opt)
    kw.pop("b3", None)
    return _soap(
        learning_rate,
        b1=kw.get("b1", 0.95), b2=kw.get("b2", 0.95),
        eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 0.0),
        precondition_frequency=int(opt.pop("precondition_frequency", 10)),
        max_precond_dim=int(opt.pop("max_precond_dim", 4096)),
        shampoo_beta=opt.pop("shampoo_beta", None),
    )


def build_optimizer(
    optim_opt: dict[str, Any],
    total_iter: int,
    scheduler_opt: dict[str, Any] | None = None,
    warmup_iter: int = -1,
    grad_clip: bool = False,
) -> tuple[optax.GradientTransformation, Schedule]:
    """Build (optax transform, lr schedule) from a reference-style optim dict."""
    from trainner_redux_tpu.schedulers import build_scheduler, with_warmup

    opt = dict(optim_opt)
    otype = str(opt.pop("type", "Adam")).lower()
    base_lr = float(opt.pop("lr", 1e-4))
    schedule = with_warmup(build_scheduler(scheduler_opt, base_lr, total_iter), warmup_iter)

    factory = OPTIMIZER_REGISTRY.get(otype)
    tx = factory(schedule, **opt)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(1.0), tx)
    return tx, schedule
