"""Dependency verification (parity: reference traiNNer/check/check_dependencies.py:29)."""

from __future__ import annotations

import importlib
import importlib.metadata

REQUIRED = ["jax", "flax", "optax", "orbax.checkpoint", "numpy", "yaml", "cv2", "safetensors"]
OPTIONAL = ["torch", "scipy", "tensorflow", "lmdb", "wandb"]


def check_dependencies(strict: bool = False) -> dict[str, str | None]:
    """Return {module: version|None}; raise on missing required deps if strict."""
    report: dict[str, str | None] = {}
    missing = []
    for mod in REQUIRED + OPTIONAL:
        try:
            m = importlib.import_module(mod)
            report[mod] = getattr(m, "__version__", "unknown")
        except ImportError:
            report[mod] = None
            if mod in REQUIRED:
                missing.append(mod)
    if strict and missing:
        raise ImportError(f"missing required dependencies: {missing}")
    return report


if __name__ == "__main__":
    for mod, ver in check_dependencies().items():
        print(f"{mod:24s} {ver or 'MISSING'}")
