"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device semantics (sharding, pmean, per-host data sharding) are
unit-testable without TPU hardware via XLA's host-platform device count —
this is the distributed-testing gap of the reference (SURVEY.md §4) closed.
"""

import os

# Must be set before jax backends initialize. Force-override: the host env
# pins JAX_PLATFORMS to the real TPU backend (axon sitecustomize), but tests
# run on a virtual 8-device CPU platform for speed and determinism.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests exercise perceptual-loss math, not pretrained features; opt in to the
# random-init escape hatch that production construction refuses by default.
os.environ.setdefault("TRAINNER_ALLOW_RANDOM_VGG", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize may have force-selected the TPU platform at
# interpreter start; config.update wins as long as no backend is live yet.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on a single-core
# host; cached executables make repeated runs (CI, local re-runs) several
# minutes faster. Keyed by HLO + jax/XLA version, so it is always safe.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TRAINNER_TEST_CACHE", os.path.expanduser("~/.cache/trainner_jax_tests")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_devices():
    import jax

    return jax.devices()
