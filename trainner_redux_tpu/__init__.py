"""trainner_redux_tpu: TPU-native training framework for image super-resolution.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
traiNNer-redux (reference mounted at /root/reference). Compute runs through
jitted, mesh-sharded train steps; data augmentation and Real-ESRGAN-style
degradations execute on-device; checkpoints interoperate with the PyTorch
ecosystem via safetensors converters.
"""

__version__ = "0.1.0"

# Re-empower the standard JAX_PLATFORMS env var: some hosts pin a platform
# in sitecustomize (which beats the env var), so `JAX_PLATFORMS=cpu
# python script.py` silently lands on the pinned backend. If the user set
# the env var and no backend is live yet, make it authoritative.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover - jax absent or backend already live
        pass
del _os
