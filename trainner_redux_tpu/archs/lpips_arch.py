"""LPIPS — Learned Perceptual Image Patch Similarity (flax-functional).

Parity: /root/reference/traiNNer/archs/lpips_arch.py (391 LoC) + the bundled
v0.1 linear-head weights (copied to trainner_redux_tpu/assets/lpips/): VGG16
post-ReLU features at 5 taps, per-channel unit normalization, learned 1x1
linear heads, spatial mean, sum over taps. The VGG16 backbone weights load
from TRAINNER_WEIGHTS_DIR (zero-egress: torchvision download unavailable,
same constraint as the reference).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.archs.vgg_arch import VGGFeatureExtractor

_LPIPS_TAPS = ["relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"]
# lpips input scaling (after mapping [0,1] -> [-1,1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ASSET_DIR = os.path.join(os.path.dirname(__file__), "..", "assets", "lpips")


def _load_linear_heads() -> list[np.ndarray] | None:
    path = os.path.join(_ASSET_DIR, "vgg_v0.1.pth")
    if not os.path.exists(path):
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return [sd[f"lin{i}.model.1.weight"].numpy().reshape(-1) for i in range(5)]


class LPIPS:
    """Functional LPIPS scorer; call with NHWC [0,1] images -> (N,) distances."""

    def __init__(self, net: str = "vgg", weights_path: str | None = None) -> None:
        assert net == "vgg", "only the vgg variant ships linear weights"
        self.vgg = VGGFeatureExtractor(
            _LPIPS_TAPS, vgg_type="vgg16", use_input_norm=False,
            weights_path=weights_path,
        )
        lins = _load_linear_heads()
        if lins is None:
            lins = [np.ones((c,), np.float32) / c for c in (64, 128, 256, 512, 512)]
        self.lins = [jnp.asarray(w) for w in lins]

    def _feats(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        # [0,1] -> [-1,1] -> lpips scaling
        x = x * 2.0 - 1.0
        x = (x - jnp.asarray(_SHIFT, x.dtype)) / jnp.asarray(_SCALE, x.dtype)
        f = self.vgg(x)
        return [f[t] for t in _LPIPS_TAPS]

    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = self._feats(a.astype(jnp.float32))
        fb = self._feats(b.astype(jnp.float32))
        total = jnp.zeros((a.shape[0],), jnp.float32)
        for xa, xb, lin in zip(fa, fb, self.lins, strict=True):
            na = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            nb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            diff2 = (na - nb) ** 2
            total = total + (diff2 * lin).sum(-1).mean(axis=(1, 2))
        return total


_default_lpips: LPIPS | None = None


def get_lpips() -> LPIPS:
    global _default_lpips
    if _default_lpips is None:
        _default_lpips = LPIPS()
    return _default_lpips
