"""Degradation sequence control (Paragon).

Parity: /root/reference/traiNNer/models/paragon_sequences.py:49-420 (+
paragon_video_sequences.py, paragon_comprehensive_sequences.py): named
sequences of degradation steps with per-step probabilities/parameter ranges,
a controller that picks one sequence per batch, and predefined realistic
chains (internet photo, phone camera, DSLR, social platform, video).

TPU design: step/sequence *selection* happens host-side per iteration (it is
config-level control flow), but every selected step executes through the
jitted operators in ops/degradations.py — the controller returns a plan
(list of (op_name, params)) that RealESRGANModel replays on device. The
reference's broken `enable_sequences` import path (realesrgan_model.py:64-67,
a NameError in production) is fixed by construction here.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np


@dataclass
class DegradationStep:
    degradation_type: str
    probability: float = 1.0
    parameters: dict[str, Any] = field(default_factory=dict)
    probability_range: tuple[float, float] | None = None
    parameter_ranges: dict[str, tuple[float, float]] = field(default_factory=dict)

    def should_apply(self, rng: np.random.Generator) -> bool:
        prob = (
            rng.uniform(*self.probability_range)
            if self.probability_range
            else self.probability
        )
        return rng.uniform() < prob

    def sample_parameters(self, rng: np.random.Generator) -> dict[str, Any]:
        params = dict(self.parameters)
        for name, rng_range in self.parameter_ranges.items():
            if name not in params:
                params[name] = float(rng.uniform(rng_range[0], rng_range[1]))
        return params


@dataclass
class DegradationSequence:
    name: str
    probability: float
    steps: list[DegradationStep]
    repeat: int = 1
    repeat_probability: float = 0.0

    def get_repeat_count(self, rng: np.random.Generator) -> int:
        count = self.repeat
        while rng.uniform() < self.repeat_probability:
            count += 1
        return count


class SequenceController:
    """Selects a sequence per iteration and emits an executable plan."""

    def __init__(self, sequences: list[DegradationSequence], seed: int = 0) -> None:
        self.sequences = list(sequences)
        self.rng = np.random.default_rng([seed, 900001])

    def select_sequence(self) -> DegradationSequence | None:
        if not self.sequences:
            return None
        probs = np.asarray([s.probability for s in self.sequences], np.float64)
        total = probs.sum()
        if total <= 0:
            return None
        if self.rng.uniform() > min(total, 1.0):
            return None
        probs = probs / total
        idx = int(self.rng.choice(len(self.sequences), p=probs))
        return self.sequences[idx]

    def plan(self) -> list[tuple[str, dict[str, Any]]]:
        """One iteration's degradation plan: [(op_name, params), ...]."""
        seq = self.select_sequence()
        if seq is None:
            return []
        steps: list[tuple[str, dict[str, Any]]] = []
        for _ in range(seq.get_repeat_count(self.rng)):
            for step in seq.steps:
                if step.should_apply(self.rng):
                    steps.append((step.degradation_type, step.sample_parameters(self.rng)))
        return steps


def create_predefined_sequences() -> list[DegradationSequence]:
    """Realistic chains mirroring the reference's predefined set
    (paragon_sequences.py:324-420): internet photo, phone, dslr, social."""
    return [
        DegradationSequence(
            "internet_photo",
            0.3,
            [
                DegradationStep("blur", 0.6),
                DegradationStep("jpeg", 1.0, parameter_ranges={"quality": (50, 90)}),
                DegradationStep("recompress_jpeg", 0.5, parameter_ranges={"quality": (40, 80)}),
            ],
        ),
        DegradationSequence(
            "phone_camera",
            0.3,
            [
                DegradationStep("sensor_noise", 0.8, parameter_ranges={"std": (0.01, 0.06)}),
                DegradationStep("oversharpen", 0.5, parameter_ranges={"strength": (1.0, 1.8)}),
                DegradationStep("jpeg", 1.0, parameter_ranges={"quality": (60, 95)}),
            ],
        ),
        DegradationSequence(
            "dslr",
            0.2,
            [
                DegradationStep("lens_distortion", 0.3, parameter_ranges={"strength": (-0.1, 0.1)}),
                DegradationStep("blur", 0.4),
                DegradationStep("jpeg", 0.8, parameter_ranges={"quality": (80, 98)}),
            ],
        ),
        DegradationSequence(
            "social_platform",
            0.2,
            [
                DegradationStep("exposure", 0.4, parameter_ranges={"factor": (0.8, 1.3)}),
                DegradationStep("jpeg", 1.0, parameter_ranges={"quality": (45, 80)}),
                DegradationStep("recompress_jpeg", 0.8, parameter_ranges={"quality": (35, 70)}),
            ],
            repeat=1,
            repeat_probability=0.2,
        ),
    ]


def create_video_sequences() -> list[DegradationSequence]:
    """Video-oriented chains (parity: paragon_video_sequences.py:22)."""
    return [
        DegradationSequence(
            "broadcast",
            0.5,
            [
                DegradationStep("blur", 0.5),
                DegradationStep("jpeg", 1.0, parameter_ranges={"quality": (40, 75)}),
            ],
        ),
        DegradationSequence(
            "streaming",
            0.5,
            [
                DegradationStep("sensor_noise", 0.4, parameter_ranges={"std": (0.005, 0.03)}),
                DegradationStep("jpeg", 1.0, parameter_ranges={"quality": (30, 65)}),
                DegradationStep("recompress_jpeg", 0.6, parameter_ranges={"quality": (25, 55)}),
            ],
        ),
    ]
