"""LR schedules as pure functions (optax-style: step -> lr).

The reference maps scheduler names to torch LRScheduler classes
(/root/reference/traiNNer/models/base_model.py:268-292) plus two local ones
(CosineAnnealingRestartLR, KneeLR). Here every scheduler is a jit-traceable
function of the step counter, so LR lives inside the compiled train step.
`warmup_iter` linear warmup (base_model.py:369-391) composes multiplicatively.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from typing import Any

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def constant_lr(base_lr: float, factor: float = 1.0 / 3, total_iters: int = 5) -> Schedule:
    def sched(step):
        return jnp.where(step < total_iters, base_lr * factor, base_lr)

    return sched


def linear_lr(
    base_lr: float,
    start_factor: float = 1.0 / 3,
    end_factor: float = 1.0,
    total_iters: int = 5,
) -> Schedule:
    def sched(step):
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        return base_lr * (start_factor + (end_factor - start_factor) * t)

    return sched


def exponential_lr(base_lr: float, gamma: float) -> Schedule:
    return lambda step: base_lr * jnp.power(gamma, step)


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1) -> Schedule:
    return lambda step: base_lr * jnp.power(gamma, jnp.floor(step / step_size))


def multi_step_lr(base_lr: float, milestones: list[int], gamma: float = 0.5) -> Schedule:
    ms = jnp.asarray(sorted(milestones))

    def sched(step):
        n = jnp.sum(step >= ms)
        return base_lr * jnp.power(gamma, n)

    return sched


def polynomial_lr(base_lr: float, total_iters: int = 5, power: float = 1.0) -> Schedule:
    def sched(step):
        t = jnp.clip(step / total_iters, 0.0, 1.0)
        return base_lr * jnp.power(1.0 - t, power)

    return sched


def cosine_annealing_lr(base_lr: float, T_max: int, eta_min: float = 0.0) -> Schedule:
    def sched(step):
        t = jnp.clip(step / T_max, 0.0, 1.0)
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def cosine_annealing_warm_restarts(
    base_lr: float, T_0: int, T_mult: int = 1, eta_min: float = 0.0
) -> Schedule:
    if T_mult == 1:
        def sched(step):
            t = (step % T_0) / T_0
            return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

        return sched

    # geometric cycles: closed form for cycle index
    def sched(step):
        sf = step / T_0
        n = jnp.floor(jnp.log(sf * (T_mult - 1) + 1) / math.log(T_mult))
        cycle_start = T_0 * (jnp.power(float(T_mult), n) - 1) / (T_mult - 1)
        cycle_len = T_0 * jnp.power(float(T_mult), n)
        t = (step - cycle_start) / cycle_len
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def cosine_annealing_restart_lr(
    base_lr: float,
    periods: list[int],
    restart_weights: list[float] | None = None,
    eta_min: float = 0.0,
) -> Schedule:
    """Reference cosineannealingrestartlr_scheduler.py:8 — per-period restart
    weights scaling the peak LR of each cosine segment."""
    restart_weights = restart_weights or [1.0] * len(periods)
    assert len(periods) == len(restart_weights)
    import numpy as np

    cum = np.cumsum([0] + list(periods))
    starts = jnp.asarray(cum[:-1], jnp.float32)
    ends = jnp.asarray(cum[1:], jnp.float32)
    weights = jnp.asarray(restart_weights, jnp.float32)
    plens = jnp.asarray(periods, jnp.float32)

    def sched(step):
        step = jnp.minimum(jnp.asarray(step, jnp.float32), ends[-1] - 1.0)
        idx = jnp.clip(jnp.sum(step >= ends), 0, len(periods) - 1)
        t = jnp.clip((step - starts[idx]) / plens[idx], 0.0, 1.0)
        w = weights[idx]
        return eta_min + w * (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    return sched


def knee_lr(
    base_lr: float,
    peak_lr: float,
    total_steps: int,
    explore_ratio: float = 0.5,
    warmup_steps: int = 0,
) -> Schedule:
    """Explore-then-decay (reference kneelr_scheduler.py:6): hold peak_lr for
    the explore phase, then decay linearly to 0."""
    explore_steps = int(total_steps * explore_ratio)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(
            warmup_steps > 0, jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0), 1.0
        )
        decay_t = jnp.clip(
            (step - explore_steps) / max(total_steps - explore_steps, 1), 0.0, 1.0
        )
        return peak_lr * warm * (1.0 - decay_t)

    return sched


def one_cycle_lr(
    base_lr: float,
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> Schedule:
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = int(total_steps * pct_start)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        up_t = jnp.clip(step / max(up_steps, 1), 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * 0.5 * (1 - jnp.cos(jnp.pi * up_t))
        down_t = jnp.clip((step - up_steps) / max(total_steps - up_steps, 1), 0.0, 1.0)
        lr_down = min_lr + (max_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * down_t))
        return jnp.where(step < up_steps, lr_up, lr_down)

    return sched


def build_scheduler(
    scheduler_opt: dict[str, Any] | None,
    base_lr: float,
    total_iter: int,
) -> Schedule:
    """Resolve a scheduler config into a step->lr function. None = constant."""
    if scheduler_opt is None:
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    opt = dict(scheduler_opt)
    stype = str(opt.pop("type")).upper()
    table: dict[str, Callable[..., Schedule]] = {
        "CONSTANTLR": constant_lr,
        "LINEARLR": linear_lr,
        "EXPONENTIALLR": exponential_lr,
        "STEPLR": step_lr,
        "MULTISTEPLR": multi_step_lr,
        "POLYNOMIALLR": polynomial_lr,
        "COSINEANNEALINGLR": cosine_annealing_lr,
        "COSINEANNEALINGWARMRESTARTS": cosine_annealing_warm_restarts,
        "COSINEANNEALINGRESTARTLR": cosine_annealing_restart_lr,
        "ONECYCLELR": one_cycle_lr,
        "KNEELR": lambda base_lr, **kw: knee_lr(
            base_lr, kw.pop("peak_lr", base_lr), kw.pop("total_steps", total_iter), **kw
        ),
    }
    if stype not in table:
        raise NotImplementedError(f"Scheduler {stype} is not implemented yet.")
    return table[stype](base_lr, **opt)


def with_warmup(schedule: Schedule, warmup_iter: int) -> Schedule:
    """Linear LR warmup over the first `warmup_iter` steps (reference
    base_model.py:369-391). warmup_iter <= 0 disables."""
    if warmup_iter is None or warmup_iter <= 0:
        return schedule

    def sched(step):
        warm = jnp.clip((jnp.asarray(step, jnp.float32) + 1.0) / warmup_iter, 0.0, 1.0)
        return schedule(step) * warm

    return sched
