"""Dynamic loss-weight rebalancing.

Parity: /root/reference/traiNNer/losses/dynamic_loss_scheduling.py:36-480:
baseline-collection phase, exponentially smoothed loss tracking, relative
imbalance correction with bounded multiplicative adaptation.

TPU design: the scheduler runs HOST-side on the loss scalars already fetched
for logging (no extra device sync); the resulting per-loss multipliers enter
the jitted train step as a small traced vector, so weight changes never
trigger recompilation.
"""

from __future__ import annotations

from typing import Any


class DynamicLossScheduler:
    def __init__(
        self,
        base_weights: dict[str, float],
        momentum: float = 0.9,
        adaptation_rate: float = 0.01,
        min_weight: float = 1e-6,
        max_weight: float = 100.0,
        adaptation_threshold: float = 0.1,
        baseline_iterations: int = 100,
        enable_monitoring: bool = True,
        enabled: bool = True,
        **_: Any,
    ) -> None:
        if not 0.0 <= momentum <= 1.0:
            raise ValueError(f"Momentum must be between 0.0 and 1.0, got {momentum}")
        if not 0.0 < adaptation_rate <= 1.0:
            raise ValueError(f"Adaptation rate must be positive, got {adaptation_rate}")
        if not 0.0 <= min_weight <= max_weight:
            raise ValueError(f"Invalid weight bounds: min={min_weight}, max={max_weight}")
        self.base_weights = dict(base_weights)
        self.momentum = momentum
        self.adaptation_rate = adaptation_rate
        self.min_weight = min_weight
        self.max_weight = max_weight
        self.adaptation_threshold = adaptation_threshold
        self.baseline_iterations = baseline_iterations
        self.enable_monitoring = enable_monitoring

        self._smoothed: dict[str, float] = {}
        self._baseline: dict[str, float] = {}
        self._multipliers: dict[str, float] = dict.fromkeys(base_weights, 1.0)
        self._iteration = 0

    @property
    def multipliers(self) -> dict[str, float]:
        return dict(self._multipliers)

    def update(self, raw_losses: dict[str, float], current_iter: int) -> dict[str, float]:
        """Feed the latest (host-fetched) loss values; returns multipliers."""
        self._iteration = current_iter
        for name, value in raw_losses.items():
            if name not in self.base_weights or value is None:
                continue
            v = abs(float(value))
            prev = self._smoothed.get(name, v)
            self._smoothed[name] = self.momentum * prev + (1 - self.momentum) * v

        if current_iter <= self.baseline_iterations:
            # baseline phase: remember the smoothed magnitudes, no adaptation
            for name, v in self._smoothed.items():
                self._baseline[name] = v
            return self.multipliers

        for name, v in self._smoothed.items():
            base = self._baseline.get(name)
            if not base or base <= 0:
                continue
            rel = v / base
            # if a loss grew/shrank relative to its baseline beyond threshold,
            # nudge its multiplier toward restoring the original balance
            if abs(rel - 1.0) > self.adaptation_threshold:
                target = 1.0 / rel
                cur = self._multipliers[name]
                new = cur + self.adaptation_rate * (target - cur)
                self._multipliers[name] = float(
                    min(max(new, self.min_weight), self.max_weight)
                )
        return self.multipliers

    def state_dict(self) -> dict[str, Any]:
        return {
            "smoothed": dict(self._smoothed),
            "baseline": dict(self._baseline),
            "multipliers": dict(self._multipliers),
            "iteration": self._iteration,
        }

    def load_state_dict(self, state: dict[str, Any]) -> None:
        self._smoothed = dict(state.get("smoothed", {}))
        self._baseline = dict(state.get("baseline", {}))
        self._multipliers.update(state.get("multipliers", {}))
        self._iteration = int(state.get("iteration", 0))
