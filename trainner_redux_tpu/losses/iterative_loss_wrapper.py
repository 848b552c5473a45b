"""Iteration-based loss-weight scheduling (jit-traceable).

Parity: /root/reference/traiNNer/losses/iterative_loss_wrapper.py:26-320.
The effective weight is a pure function of the (traced) iteration counter, so
the whole schedule lives inside the jitted train step — no Python branching
per iteration and no recompilation when weights change.
"""

from __future__ import annotations

import jax.numpy as jnp


class IterativeLossWrapper:
    def __init__(
        self,
        loss_module,
        loss_weight: float = 1.0,
        start_iter: int = 0,
        target_iter: int | None = None,
        target_weight: float | None = None,
        disable_after: int | None = None,
        schedule_type: str = "linear",
        warn_on_unused: bool = True,
        loss_decay: float | None = None,
        loss_decay_inflection: int | None = None,
    ) -> None:
        self.loss_module = loss_module
        self.base_loss_weight = loss_weight
        self.start_iter = start_iter
        self.target_iter = target_iter if target_iter is not None else start_iter
        self.target_weight = target_weight if target_weight is not None else loss_weight
        self.disable_after = disable_after
        self.schedule_type = schedule_type.lower()
        self.warn_on_unused = warn_on_unused
        self.loss_decay = loss_decay
        self.loss_decay_inflection = loss_decay_inflection
        self.loss_weight = loss_weight

        if self.target_iter < self.start_iter:
            raise ValueError(
                f"target_iter ({self.target_iter}) must be >= start_iter ({self.start_iter})"
            )
        if self.target_weight < 0:
            raise ValueError(f"target_weight ({self.target_weight}) must be non-negative")

    def effective_weight(self, current_iter: jnp.ndarray) -> jnp.ndarray:
        """Weight multiplier relative to the loss's own loss_weight, as a
        traced scalar: w_eff(iter) / base (the loss already multiplies base)."""
        it = jnp.asarray(current_iter, jnp.float32)
        if self.target_iter <= self.start_iter:
            ramped = jnp.asarray(self.target_weight, jnp.float32)
        else:
            progress = jnp.clip(
                (it - self.start_iter) / (self.target_iter - self.start_iter), 0.0, 1.0
            )
            if self.schedule_type == "cosine":
                progress = 0.5 * (1.0 - jnp.cos(jnp.pi * progress))
            elif self.schedule_type == "step":
                progress = jnp.where(progress >= 1.0, 1.0, 0.0)
            ramped = self.base_loss_weight + progress * (
                self.target_weight - self.base_loss_weight
            )
        if self.loss_decay is not None:
            inflection = self.loss_decay_inflection or self.start_iter
            decay = jnp.power(
                jnp.asarray(self.loss_decay, jnp.float32),
                jnp.maximum(it - inflection, 0.0),
            )
            ramped = ramped * decay
        w = jnp.where(it < self.start_iter, 0.0, ramped)
        if self.disable_after is not None:
            w = jnp.where(it >= self.disable_after, 0.0, w)
        # relative multiplier (underlying loss multiplies base_loss_weight itself)
        base = self.base_loss_weight if self.base_loss_weight != 0 else 1.0
        return w / base

    def __call__(self, *args, current_iter: jnp.ndarray | None = None, **kwargs):
        raw = self.loss_module(*args, **kwargs)
        if current_iter is None:
            return raw
        w = self.effective_weight(current_iter)
        if isinstance(raw, dict):
            return {k: v * w for k, v in raw.items()}
        return raw * w

    def __getattr__(self, name):
        # delegate unknown attributes (e.g. gan_type) to the wrapped loss
        return getattr(self.loss_module, name)
