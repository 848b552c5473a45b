"""HBM estimation + parameter optimization (the VRAM-manager equivalent).

Parity: /root/reference/traiNNer/utils/vram_manager.py (VRAMEstimator /
ParameterOptimizer / VRAMManager, ~700 lines of runtime CUDA probing).
XLA allocates at compile time, so the TPU-native design is ahead-of-time:

- `estimate_step_hbm`: lower+compile the train step at a candidate
  (batch, lq_size) WITHOUT running it and read the compiled executable's
  memory analysis (exact, not heuristic — better than the reference's
  empirical VRAM probing).
- `ParameterOptimizer.search`: walk the candidate ladder from the requested
  configuration down until the compiled step fits the HBM budget.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass
class MemoryEstimate:
    batch: int
    lq_size: int
    total_bytes: int | None
    fits: bool


def compiled_memory_bytes(lowered) -> int | None:
    """Total device memory of a lowered+compiled computation, when exposed."""
    try:
        compiled = lowered.compile()
        analysis = compiled.memory_analysis()
        if analysis is None:
            return None
        return int(
            getattr(analysis, "temp_size_in_bytes", 0)
            + getattr(analysis, "argument_size_in_bytes", 0)
            + getattr(analysis, "output_size_in_bytes", 0)
            - getattr(analysis, "alias_size_in_bytes", 0)
        )
    except Exception:
        return None


class ParameterOptimizer:
    """AOT (batch, lq_size) search under an HBM budget."""

    def __init__(
        self,
        hbm_budget_bytes: int | None = None,
        min_batch: int = 1,
        min_patch: int = 16,
        safety_margin: float = 0.08,
    ) -> None:
        if hbm_budget_bytes is None:
            from trainner_redux_tpu.utils.hardware_detection import HardwareDetector

            info = HardwareDetector().detect()
            hbm_budget_bytes = info.hbm_bytes_per_device or (16 << 30)
        self.budget = int(hbm_budget_bytes * (1.0 - safety_margin))
        self.min_batch = min_batch
        self.min_patch = min_patch

    def candidates(self, batch: int, lq_size: int) -> list[tuple[int, int]]:
        out = [(batch, lq_size)]
        b, p = batch, lq_size
        while b > self.min_batch or p > self.min_patch:
            if b > self.min_batch:
                b = max(self.min_batch, b // 2)
            else:
                p = max(self.min_patch, p // 2)
            out.append((b, p))
        return out

    def estimate(
        self, lower_fn: Callable[[int, int], Any], batch: int, lq_size: int
    ) -> MemoryEstimate:
        """lower_fn(batch, lq_size) -> jax lowered computation."""
        try:
            lowered = lower_fn(batch, lq_size)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" in str(e):
                return MemoryEstimate(batch, lq_size, None, False)
            raise
        total = compiled_memory_bytes(lowered)
        fits = total is None or total <= self.budget
        return MemoryEstimate(batch, lq_size, total, fits)

    def search(
        self, lower_fn: Callable[[int, int], Any], batch: int, lq_size: int
    ) -> MemoryEstimate:
        last = None
        for b, p in self.candidates(batch, lq_size):
            est = self.estimate(lower_fn, b, p)
            last = est
            if est.fits:
                return est
        assert last is not None
        return last

    def suggest(
        self,
        lower_fn: Callable[[int, int], Any],
        batch: int,
        lq_size: int,
        max_upshifts: int = 3,
    ) -> list[MemoryEstimate]:
        """The user-facing `--suggest` sweep: AOT-compile the train step at
        the configured point, UP the batch ladder while it keeps fitting
        (XLA's memory analysis is exact, so upshifts are safe to recommend),
        and DOWN the (batch, patch) ladder when the configured point does
        not fit. Returns every estimate probed, largest batch first.
        Reference surface: vram_manager.py:93-700 (empirical CUDA probing;
        here compile-time exact)."""
        rows = [self.estimate(lower_fn, batch, lq_size)]
        if rows[0].fits:
            b = batch
            for _ in range(max_upshifts):
                b *= 2
                est = self.estimate(lower_fn, b, lq_size)
                rows.insert(0, est)
                if not est.fits:
                    break
        else:
            for b, p in self.candidates(batch, lq_size)[1:]:
                est = self.estimate(lower_fn, b, p)
                rows.append(est)
                if est.fits:
                    break
        return rows


def format_suggest_table(
    rows: list[MemoryEstimate], budget_bytes: int
) -> str:
    """Render the `--suggest` sweep as an aligned recommendation table."""
    lines = [
        f"AOT HBM suggestion (budget {budget_bytes / (1 << 30):.2f} GiB "
        "after safety margin):",
        f"  {'batch':>5}  {'lq':>4}  {'HBM GiB':>8}  fits",
    ]
    for r in rows:
        hbm = f"{r.total_bytes / (1 << 30):8.2f}" if r.total_bytes else "     n/a"
        lines.append(
            f"  {r.batch:>5}  {r.lq_size:>4}  {hbm}  {'yes' if r.fits else 'NO'}"
        )
    best = max(
        (r for r in rows if r.fits),
        key=lambda r: (r.batch * r.lq_size * r.lq_size),
        default=None,
    )
    if best is None:
        lines.append("  no probed configuration fits; lower the model size.")
    else:
        lines.append(
            f"recommended: batch_size_per_gpu {best.batch}, lq_size "
            f"{best.lq_size} (gt_size = lq_size * scale)"
        )
    return "\n".join(lines)
