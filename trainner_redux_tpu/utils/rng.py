"""Randomness policy.

The reference uses one process-global numpy Generator seeded from the config
(/root/reference/traiNNer/utils/rng.py:7-25) plus python `random`. The
TPU-native design splits randomness into two explicit domains:

- **Host-side** (data loading / augmentation): numpy Generators, one per
  (seed, rank, worker), so multi-host data pipelines are deterministic and
  non-overlapping.
- **Device-side** (OTF degradation, MoA, noise, dropout): `jax.random` keys
  threaded through the jitted train step — one key per step, split per use.
  No global state ever enters a jitted function.
"""

from __future__ import annotations

import numpy as np


class RNG:
    """Host-side numpy Generator singleton (data pipeline only)."""

    _rng: np.random.Generator | None = None
    _seed: int | None = None

    @classmethod
    def init_rng(cls, seed: int, rank: int = 0, worker_id: int = 0) -> None:
        cls._seed = seed
        cls._rng = np.random.default_rng([seed, rank, worker_id])

    @classmethod
    def get_rng(cls) -> np.random.Generator:
        if cls._rng is None:
            from trainner_redux_tpu.utils.config import Config

            try:
                seed = Config.get_manual_seed() or 0
            except RuntimeError:
                seed = 0
            cls.init_rng(seed)
        assert cls._rng is not None
        return cls._rng

    @classmethod
    def reset(cls) -> None:
        cls._rng = None
        cls._seed = None


def worker_rng(seed: int, rank: int, worker_id: int, epoch: int = 0) -> np.random.Generator:
    """Independent per-worker generator, deterministic across restarts."""
    return np.random.default_rng([seed, rank, worker_id, epoch])


def step_key(base_seed: int, step: int):
    """Device-side: derive the per-step PRNG key fed into the jitted train step."""
    import jax

    return jax.random.fold_in(jax.random.key(base_seed), step)
