"""trainner_redux_tpu: TPU-native training framework for image super-resolution.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
traiNNer-redux (reference mounted at /root/reference). Compute runs through
jitted, mesh-sharded train steps; data augmentation and Real-ESRGAN-style
degradations execute on-device; checkpoints interoperate with the PyTorch
ecosystem via safetensors converters.
"""

__version__ = "0.1.0"
