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


# ---------------------------------------------------------------------------
# intelligent auto-calibration
# (parity: reference dynamic_loss_scheduling.py:524-830 — users set only
# `auto_calibrate: true`; scheduler hyperparameters derive from the arch
# size class, the planned iteration count, dataset complexity, and whether
# a GAN loss is present. Preset VALUES transcribed from the reference's
# ARCHITECTURE_PRESETS table since they are the behavioral surface.)
# ---------------------------------------------------------------------------

# size class -> (momentum, adaptation_rate, max_weight, adaptation_threshold,
#                baseline_iterations); min_weight is 1e-6 across the board
_SIZE_PRESETS: dict[str, tuple[float, float, float, float, int]] = {
    "nano":  (0.85, 0.015,   5.0, 0.04,  50),
    "micro": (0.87, 0.012,   7.5, 0.05,  75),
    "tiny":  (0.89, 0.010,  10.0, 0.06, 100),
    "xs":    (0.91, 0.008,  15.0, 0.07, 125),
    "s":     (0.93, 0.006,  20.0, 0.08, 150),
    "m":     (0.95, 0.005,  30.0, 0.10, 200),
    "l":     (0.96, 0.004,  50.0, 0.12, 250),
    "xl":    (0.97, 0.003, 100.0, 0.15, 300),
}

_RESERVED_KEYS = frozenset(
    ("enabled", "auto_calibrate", "architecture_type", "training_config",
     "dataset_info")
)


def _size_class(arch_type: str) -> str:
    """Map an arch type string to a size class (reference :700-740)."""
    import re

    key = (arch_type or "unknown").lower()
    for variant in ("nano", "micro", "tiny", "xs", "xl", "s", "m", "l"):
        if re.search(rf"(?:^|[^a-z]){variant}(?:[^a-z]|$)", key):
            return variant
    if "small" in key:
        return "nano"
    if "medium" in key:
        return "m"
    if "large" in key or "extra" in key:
        return "l" if "extra" not in key else "xl"
    return "nano"  # conservative fallback


def auto_calibrate_params(
    arch_type: str,
    total_iterations: int,
    loss_names: list[str],
    dataset_info: dict[str, float] | None = None,
    overrides: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Derive scheduler hyperparameters from training context."""
    mom, rate, max_w, thresh, base_iters = _SIZE_PRESETS[_size_class(arch_type)]
    params: dict[str, Any] = {
        "momentum": mom, "adaptation_rate": rate, "min_weight": 1e-6,
        "max_weight": max_w, "adaptation_threshold": thresh,
        "baseline_iterations": base_iters,
    }

    # training length (reference :745-754): short runs adapt faster with a
    # shorter baseline; long runs are more conservative
    if total_iterations < 10_000:
        params["adaptation_rate"] *= 1.5
        params["baseline_iterations"] = max(25, params["baseline_iterations"] // 2)
    elif total_iterations > 50_000:
        params["adaptation_rate"] *= 0.7
        params["baseline_iterations"] = min(
            400, int(params["baseline_iterations"] * 1.5)
        )

    # dataset complexity (reference :756-808)
    info = dataset_info or {}
    complexity = float(info.get("overall_complexity", 0.5))
    texture = float(info.get("texture_variance", 0.5))
    edges = float(info.get("edge_density", 0.5))
    color = float(info.get("color_variation", 0.5))
    if complexity > 0.7:
        params["momentum"] *= 0.9
        params["adaptation_rate"] *= 1.2
        params["adaptation_threshold"] *= 1.5
        params["max_weight"] *= 0.8
    elif complexity < 0.3:
        params["momentum"] *= 1.1
        params["adaptation_rate"] *= 0.8
        params["adaptation_threshold"] *= 0.7
        params["max_weight"] *= 1.2
    if texture > 0.6:
        params["adaptation_rate"] *= 1.1
        params["momentum"] *= 0.95
    elif texture < 0.4:
        params["adaptation_rate"] *= 0.9
        params["momentum"] *= 1.05
    if edges > 0.6:
        params["adaptation_threshold"] *= 1.2
        params["momentum"] *= 0.92
    elif edges < 0.4:
        params["adaptation_threshold"] *= 0.8
        params["momentum"] *= 1.08
    if color > 0.6:
        params["adaptation_rate"] *= 1.05
        params["max_weight"] *= 0.9
    elif color < 0.4:
        params["adaptation_rate"] *= 0.95
        params["max_weight"] *= 1.1

    # GAN losses: noisier signal -> higher threshold, lower ceiling
    if any("gan" in n.lower() for n in loss_names):
        params["adaptation_threshold"] *= 1.5
        params["max_weight"] *= 0.8

    params["momentum"] = min(params["momentum"], 0.999)
    for key, value in (overrides or {}).items():
        if key not in _RESERVED_KEYS:
            params[key] = value
    return params


def create_dynamic_loss_scheduler(
    base_weights: dict[str, float],
    config: dict[str, Any],
    arch_type: str = "unknown",
    total_iterations: int = 40_000,
    dataset_info: dict[str, float] | None = None,
) -> DynamicLossScheduler | None:
    """Factory mirroring reference create_dynamic_loss_scheduler (:495-523):
    `enabled: false` -> None; `auto_calibrate: true` -> derived parameters
    (explicit config keys still override); otherwise manual parameters."""
    if not config.get("enabled", True):
        return None
    for name, w in base_weights.items():
        if w <= 0:
            raise ValueError(f"Loss {name} has non-positive weight: {w}")
    if config.get("auto_calibrate", False):
        params = auto_calibrate_params(
            arch_type=arch_type,
            total_iterations=total_iterations,
            loss_names=list(base_weights),
            dataset_info=dataset_info or config.get("dataset_info"),
            overrides=config,
        )
    else:
        params = {k: v for k, v in config.items() if k not in _RESERVED_KEYS}
    return DynamicLossScheduler(base_weights, **params)
