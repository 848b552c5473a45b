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
    from optax import contrib

    kw = _common(opt)
    return contrib.schedule_free_adamw(
        learning_rate=learning_rate if not callable(learning_rate) else learning_rate(0),
        **kw,
    )


@OPTIMIZER_REGISTRY.register(name="stableadamw")
def stable_adamw(learning_rate: Schedule, **opt: Any) -> optax.GradientTransformation:
    """AdamW with per-parameter RMS update clipping (StableAdamW)."""
    kw = _common(opt)
    clip = float(opt.pop("clip_threshold", 1.0))
    return optax.chain(
        optax.adaptive_grad_clip(clip),
        optax.adamw(learning_rate, **kw),
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
    """SOAP is approximated by AdamW here until a native implementation lands;
    the config surface is accepted for compatibility."""
    kw = _common(opt)
    kw.pop("b3", None)
    opt.pop("precondition_frequency", None)
    return optax.adamw(learning_rate, **kw)


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
