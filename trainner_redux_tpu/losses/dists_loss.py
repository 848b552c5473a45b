"""DISTS — Deep Image Structure and Texture Similarity (loss form).

Parity: /root/reference/traiNNer/losses/dists_loss.py:50 (+ADISTS :45 of
adists_loss.py): VGG16 stage features; per-channel structure (correlation)
and texture (mean) terms combined with learned alpha/beta weights. The
learned weights load from a local `dists_weights.pt`-style file
(TRAINNER_WEIGHTS_DIR/dists_weights.pt); uniform weights otherwise.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.archs.vgg_arch import VGGFeatureExtractor
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY

# VGG16 stage taps used by DISTS (post-conv features at each scale)
_DISTS_LAYERS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]
_DISTS_CHANNELS = [3, 64, 128, 256, 512, 512]  # input + 5 stages


def _load_dists_weights() -> tuple[np.ndarray, np.ndarray] | None:
    candidates = [
        os.path.join(os.path.dirname(__file__), "..", "assets", "dists_weights.pt")
    ]
    wdir = os.environ.get("TRAINNER_WEIGHTS_DIR")
    if wdir:
        candidates.insert(0, os.path.join(wdir, "dists_weights.pt"))
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        return None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    alpha = sd["alpha"].numpy().reshape(-1)
    beta = sd["beta"].numpy().reshape(-1)
    return alpha, beta


@LOSS_REGISTRY.register(name="distsloss")
class DISTSLoss:
    def __init__(
        self,
        loss_weight: float = 1.0,
        use_input_norm: bool = True,
        as_loss: bool = True,
        weights_path: str | None = None,
        **_: dict,
    ) -> None:
        self.loss_weight = loss_weight
        self.vgg = VGGFeatureExtractor(
            _DISTS_LAYERS, vgg_type="vgg16", use_input_norm=use_input_norm,
            weights_path=weights_path,
        )
        total_ch = sum(_DISTS_CHANNELS)
        loaded = _load_dists_weights()
        if loaded is not None and loaded[0].size == total_ch:
            alpha, beta = loaded
        else:
            alpha = np.full((total_ch,), 0.5, np.float32)
            beta = np.full((total_ch,), 0.5, np.float32)
        self.alpha = jnp.asarray(alpha)
        self.beta = jnp.asarray(beta)

    def _features(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = self.vgg(x)
        return [x] + [feats[name] for name in _DISTS_LAYERS]

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        c1, c2 = 1e-6, 1e-6
        fx = self._features(pred.astype(jnp.float32))
        fy = self._features(jax.lax.stop_gradient(target.astype(jnp.float32)))

        dist1 = []
        dist2 = []
        for a, b in zip(fx, fy, strict=True):
            mu_a = a.mean(axis=(1, 2))
            mu_b = b.mean(axis=(1, 2))
            var_a = a.var(axis=(1, 2))
            var_b = b.var(axis=(1, 2))
            cov = ((a - mu_a[:, None, None]) * (b - mu_b[:, None, None])).mean(axis=(1, 2))
            texture = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
            structure = (2 * cov + c2) / (var_a + var_b + c2)
            dist1.append(texture)  # (N, C)
            dist2.append(structure)
        t = jnp.concatenate(dist1, axis=-1)  # (N, total_ch)
        s = jnp.concatenate(dist2, axis=-1)
        w_sum = self.alpha.sum() + self.beta.sum()
        score = ((self.alpha * t).sum(-1) + (self.beta * s).sum(-1)) / w_sum
        return self.loss_weight * (1.0 - score.mean())


@LOSS_REGISTRY.register(name="adistsloss")
class ADISTSLoss(DISTSLoss):
    """ADISTS: DISTS with adaptive per-region pooling — approximated here by
    the global DISTS statistics (documented divergence; the adaptive window
    weighting needs the upstream trained prediction head)."""
