"""Training automations (opt-in, host-side controllers).

Parity: /root/reference/traiNNer/utils/training_automations.py:33-1517 —
four pluggable automations behind a manager:

- IntelligentLearningRateScheduler: plateau-aware LR scaling from the
  validation-metric history (multiplies the base schedule; the factor enters
  the jitted step as a traced scalar, no recompiles).
- DynamicBatchAndPatchSizeOptimizer: in the reference this reacts to CUDA
  OOMs at runtime; XLA is static-shape and allocation happens at compile
  time, so the TPU-native equivalent is ahead-of-time search over compiled
  (batch, patch) candidates plus bucketed downshift recommendations on
  compile-time RESOURCE_EXHAUSTED errors.
- AdaptiveGradientClipping: tracks the gradient-norm history and sets the
  clip threshold at a rolling percentile.
- IntelligentEarlyStopping: stops training when the monitored metric has not
  improved for `patience` validations.

All state is JSON-serializable and stored in the training-state checkpoint.
"""

from __future__ import annotations

from collections import deque
from typing import Any

import numpy as np


class TrainingAutomationBase:
    name = "base"

    def __init__(self, config: dict[str, Any]) -> None:
        self.config = dict(config)
        self.enabled = bool(config.get("enabled", False))
        self.enabled_iterations = 0

    def on_iteration(self, current_iter: int, logs: dict[str, float]) -> None:
        if self.enabled:
            self.enabled_iterations += 1

    def on_validation(self, current_iter: int, metrics: dict[str, float]) -> None:
        pass

    def state_dict(self) -> dict[str, Any]:
        return {"enabled": self.enabled, "enabled_iterations": self.enabled_iterations}

    def load_state_dict(self, state: dict[str, Any]) -> None:
        self.enabled_iterations = int(state.get("enabled_iterations", 0))


class IntelligentLearningRateScheduler(TrainingAutomationBase):
    """Plateau detection on validation metrics -> LR multiplier."""

    name = "intelligent_lr_scheduler"

    def __init__(self, config: dict[str, Any]) -> None:
        super().__init__(config)
        self.patience = int(config.get("patience", 5))
        self.factor = float(config.get("factor", 0.5))
        self.min_multiplier = float(config.get("min_multiplier", 1e-3))
        self.monitor = config.get("monitor", "psnr")
        self.mode = config.get("mode", "max")
        self.multiplier = 1.0
        self._best: float | None = None
        self._stale = 0

    def on_validation(self, current_iter: int, metrics: dict[str, float]) -> None:
        if not self.enabled or self.monitor not in metrics:
            return
        val = metrics[self.monitor]
        better = (
            self._best is None
            or (self.mode == "max" and val > self._best)
            or (self.mode == "min" and val < self._best)
        )
        if better:
            self._best = val
            self._stale = 0
        else:
            self._stale += 1
            if self._stale >= self.patience:
                self.multiplier = max(self.multiplier * self.factor, self.min_multiplier)
                self._stale = 0

    def state_dict(self) -> dict[str, Any]:
        return {
            **super().state_dict(),
            "multiplier": self.multiplier,
            "best": self._best,
            "stale": self._stale,
        }

    def load_state_dict(self, state: dict[str, Any]) -> None:
        super().load_state_dict(state)
        self.multiplier = float(state.get("multiplier", 1.0))
        self._best = state.get("best")
        self._stale = int(state.get("stale", 0))


class DynamicBatchAndPatchSizeOptimizer(TrainingAutomationBase):
    """AOT (batch, lq_size) candidate ladder; recommends the next smaller
    bucket on compile-time memory exhaustion. Candidates stay powers-of-two
    friendly so recompiles are bounded."""

    name = "dynamic_batch_patch_optimizer"

    def __init__(self, config: dict[str, Any]) -> None:
        super().__init__(config)
        self.min_batch = int(config.get("min_batch_size", 1))
        self.min_patch = int(config.get("min_patch_size", 16))
        self.current: tuple[int, int] | None = None

    def ladder(self, batch: int, lq_size: int) -> list[tuple[int, int]]:
        """Descending (batch, lq_size) candidates from the configured point."""
        out = [(batch, lq_size)]
        b, p = batch, lq_size
        while b > self.min_batch or p > self.min_patch:
            if b > self.min_batch:
                b = max(self.min_batch, b // 2)
            elif p > self.min_patch:
                p = max(self.min_patch, p // 2)
            out.append((b, p))
        return out

    def recommend_downshift(self, batch: int, lq_size: int) -> tuple[int, int]:
        lad = self.ladder(batch, lq_size)
        return lad[1] if len(lad) > 1 else lad[0]

    @staticmethod
    def aot_fits(step_fn, make_batch, batch: int, lq_size: int) -> bool:
        """Compile (not run) the step at the candidate shape; False on OOM."""
        import jax

        try:
            jitted = jax.jit(step_fn)
            jitted.lower(*make_batch(batch, lq_size)).compile()
            return True
        except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                return False
            raise

    def search(self, step_fn, make_batch, batch: int, lq_size: int) -> tuple[int, int]:
        for cand in self.ladder(batch, lq_size):
            if self.aot_fits(step_fn, make_batch, *cand):
                self.current = cand
                return cand
        self.current = (self.min_batch, self.min_patch)
        return self.current


class AdaptiveGradientClipping(TrainingAutomationBase):
    """Rolling-percentile gradient-norm clip threshold."""

    name = "adaptive_gradient_clipping"

    def __init__(self, config: dict[str, Any]) -> None:
        super().__init__(config)
        self.window = int(config.get("window", 200))
        self.percentile = float(config.get("percentile", 90.0))
        self.max_threshold = float(config.get("max_threshold", 10.0))
        self._norms: deque[float] = deque(maxlen=self.window)
        self.threshold = float(config.get("initial_threshold", 1.0))

    def on_iteration(self, current_iter: int, logs: dict[str, float]) -> None:
        super().on_iteration(current_iter, logs)
        if not self.enabled:
            return
        g = logs.get("grad_norm_g")
        if g is not None and np.isfinite(g):
            self._norms.append(float(g))
            if len(self._norms) >= 20:
                self.threshold = float(
                    min(np.percentile(list(self._norms), self.percentile), self.max_threshold)
                )

    def state_dict(self) -> dict[str, Any]:
        return {
            **super().state_dict(),
            "norms": list(self._norms),
            "threshold": self.threshold,
        }

    def load_state_dict(self, state: dict[str, Any]) -> None:
        super().load_state_dict(state)
        self._norms = deque(state.get("norms", []), maxlen=self.window)
        self.threshold = float(state.get("threshold", 1.0))


class IntelligentEarlyStopping(TrainingAutomationBase):
    name = "intelligent_early_stopping"

    def __init__(self, config: dict[str, Any]) -> None:
        super().__init__(config)
        self.patience = int(config.get("patience", 10))
        self.min_delta = float(config.get("min_delta", 1e-4))
        self.monitor = config.get("monitor", "psnr")
        self.mode = config.get("mode", "max")
        self.should_stop = False
        self._best: float | None = None
        self._stale = 0

    def on_validation(self, current_iter: int, metrics: dict[str, float]) -> None:
        if not self.enabled or self.monitor not in metrics:
            return
        val = metrics[self.monitor]
        improved = self._best is None or (
            (val - self._best) > self.min_delta
            if self.mode == "max"
            else (self._best - val) > self.min_delta
        )
        if improved:
            self._best = val
            self._stale = 0
        else:
            self._stale += 1
            if self._stale >= self.patience:
                self.should_stop = True

    def state_dict(self) -> dict[str, Any]:
        return {
            **super().state_dict(),
            "best": self._best,
            "stale": self._stale,
            "should_stop": self.should_stop,
        }

    def load_state_dict(self, state: dict[str, Any]) -> None:
        super().load_state_dict(state)
        self._best = state.get("best")
        self._stale = int(state.get("stale", 0))
        self.should_stop = bool(state.get("should_stop", False))


_AUTOMATION_TYPES = {
    "intelligent_lr_scheduler": IntelligentLearningRateScheduler,
    "dynamic_batch_patch_optimizer": DynamicBatchAndPatchSizeOptimizer,
    "adaptive_gradient_clipping": AdaptiveGradientClipping,
    "intelligent_early_stopping": IntelligentEarlyStopping,
}


class TrainingAutomationManager:
    def __init__(self, config: dict[str, Any]) -> None:
        self.automations: dict[str, TrainingAutomationBase] = {}
        for name, cls in _AUTOMATION_TYPES.items():
            sub = config.get(name, {})
            if isinstance(sub, dict) and sub.get("enabled", False):
                self.automations[name] = cls(sub)

    def on_iteration(self, current_iter: int, logs: dict[str, float]) -> None:
        for a in self.automations.values():
            a.on_iteration(current_iter, logs)

    def on_validation(self, current_iter: int, metrics: dict[str, float]) -> None:
        for a in self.automations.values():
            a.on_validation(current_iter, metrics)

    @property
    def lr_multiplier(self) -> float:
        a = self.automations.get("intelligent_lr_scheduler")
        return a.multiplier if a else 1.0

    @property
    def clip_threshold(self) -> float | None:
        a = self.automations.get("adaptive_gradient_clipping")
        return a.threshold if a else None

    @property
    def should_stop(self) -> bool:
        a = self.automations.get("intelligent_early_stopping")
        return bool(a and a.should_stop)

    def state_dict(self) -> dict[str, Any]:
        return {name: a.state_dict() for name, a in self.automations.items()}

    def load_state_dict(self, state: dict[str, Any]) -> None:
        for name, sub in (state or {}).items():
            if name in self.automations:
                self.automations[name].load_state_dict(sub)


def create_automation_manager(config: dict[str, Any] | None) -> TrainingAutomationManager | None:
    if not config or not config.get("enabled", False):
        return None
    return TrainingAutomationManager(config)
