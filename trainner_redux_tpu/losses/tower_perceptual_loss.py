"""External-tower perceptual losses: ConvNeXt / DINO / anime-ResNet50 /
LineDistiller / AESOP / CLIP-contrastive.

Parity targets:
- ConvNeXtPerceptualLoss  (reference convnext_perceptual_loss.py:48-184)
- DINOPerceptualLoss      (reference dino_perceptual_loss.py:13-342)
- PerceptualAnimeLoss     (reference perceptual_anime_loss.py:217-285)
- LineDistillerLoss       (reference line_distiller_loss.py:22-90)
- AESOPLoss               (reference aesop_loss.py:13-37)
- ContrastiveLoss         (reference contrastive_loss.py:13-189)

All towers are frozen pretrained backbones loaded from local torch state
dicts (archs/feature_towers.py) — construction fails fast with guidance when
weights are absent (except ContrastiveLoss, which mirrors the reference's
documented fallback to a simplified pixel-space InfoNCE when CLIP is
unavailable). Feature extraction for targets uses stop_gradient, matching
the reference's no_grad on gt towers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from trainner_redux_tpu.losses.loss_util import get_criterion
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY


def _charbonnier_sq(diff_sq: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Reference dino_perceptual_loss.py:68: sqrt(x + eps^2) on squared diffs."""
    return jnp.sqrt(diff_sq + eps * eps)


@LOSS_REGISTRY.register(name="convnextperceptualloss")
class ConvNeXtPerceptualLoss:
    """L1 over selected ConvNeXt-Tiny stage features, weight-sum normalized."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        layers: list[int] | None = None,
        layer_weights: list[float] | None = None,
        eps: float = 1e-6,
        weights_path: str | None = None,
        **_: object,
    ) -> None:
        from trainner_redux_tpu.archs.feature_towers import ConvNeXtFeatures

        self.loss_weight = float(loss_weight)
        self.eps = float(eps)
        self.layers = list(layers) if layers is not None else [1, 2]
        if layer_weights is None:
            layer_weights = [1.0, 0.5] if len(self.layers) == 2 else [1.0] * len(self.layers)
        if len(layer_weights) != len(self.layers):
            raise ValueError(
                f"layer_weights (len={len(layer_weights)}) must match layers "
                f"(len={len(self.layers)})."
            )
        self.layer_weights = [float(w) for w in layer_weights]
        self.tower = ConvNeXtFeatures(weights_path=weights_path)

    def _feats(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        from trainner_redux_tpu.archs.feature_towers import (
            _IMAGENET_MEAN,
            _IMAGENET_STD,
        )

        x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
        x = (x - jnp.asarray(_IMAGENET_MEAN)) / (jnp.asarray(_IMAGENET_STD) + self.eps)
        feats = self.tower(x)
        return [feats[i] for i in self.layers]

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fx = self._feats(pred)
        fy = self._feats(jax.lax.stop_gradient(target))
        loss = jnp.zeros((), jnp.float32)
        for w, a, b in zip(self.layer_weights, fx, fy):
            loss = loss + w * jnp.abs(a - b).mean()
        wsum = sum(self.layer_weights)
        if wsum > 0:
            loss = loss / wsum
        return self.loss_weight * loss


@LOSS_REGISTRY.register(name="dinoperceptualloss")
class DINOPerceptualLoss:
    """Charbonnier distance over DINO-family ViT patch-token maps."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        model_name: str = "vit_small_patch16_dinov3",
        layers: list[str | int] | None = None,
        weights: list[float] | None = None,
        resize: bool = True,
        weights_path: str | None = None,
        **_: object,
    ) -> None:
        from trainner_redux_tpu.archs.feature_towers import ViTFeatures

        self.loss_weight = float(loss_weight)
        self.layers = list(layers) if layers is not None else ["last"]
        self.weights = [1.0] * len(self.layers) if weights is None else list(weights)
        if len(self.weights) < len(self.layers):
            self.weights.extend([1.0] * (len(self.layers) - len(self.weights)))
        self.flexible_resize = resize
        self.eps = 1e-6
        idx = [i for i in self.layers if isinstance(i, int)]
        self.tower = ViTFeatures(
            weights_path=weights_path,
            model_name=model_name,
            out_indices=tuple(idx) if idx and "last" not in self.layers else None,
        )

    def _feats(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        from trainner_redux_tpu.archs.feature_towers import imagenet_norm
        from trainner_redux_tpu.ops.resize import resize as resize_op

        x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0)
        if self.flexible_resize:
            p = self.tower.patch
            h = max(p, (x.shape[1] // p) * p)
            w = max(p, (x.shape[2] // p) * p)
            if (h, w) != x.shape[1:3]:
                x = resize_op(x, (h, w), "bilinear", True)
        x = imagenet_norm(x, self.eps)
        return self.tower(x)

    def _get(self, feats: dict[str, jnp.ndarray], layer: str | int) -> jnp.ndarray:
        keys = list(feats)
        if layer == "last":
            return feats[keys[-1]]
        key = f"feat{layer}" if isinstance(layer, int) else layer
        return feats.get(key, feats[keys[-1]])

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        fx = self._feats(pred)
        fy = self._feats(jax.lax.stop_gradient(target))
        total = jnp.zeros((), jnp.float32)
        for layer, w in zip(self.layers, self.weights):
            a, b = self._get(fx, layer), self._get(fy, layer)
            total = total + w * _charbonnier_sq((a - b) ** 2, self.eps).mean()
        wsum = sum(self.weights)
        if wsum > 0:
            total = total / wsum
        return self.loss_weight * total


@LOSS_REGISTRY.register(name="perceptualanimeloss")
class PerceptualAnimeLoss:
    """Danbooru-ResNet50 labeled-tap perceptual loss (APISR)."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        layer_weights: dict[str, float] | None = None,
        criterion: str = "l1",
        weights_path: str | None = None,
        **_: object,
    ) -> None:
        from trainner_redux_tpu.archs.feature_towers import ResNet50Tap

        self.loss_weight = float(loss_weight)
        self.layer_weights = dict(
            layer_weights
            or {"0": 0.1, "4_2_conv3": 20, "5_3_conv3": 25, "6_5_conv3": 1, "7_2_conv3": 1}
        )
        self.criterion = get_criterion(criterion)
        self.tower = ResNet50Tap(
            list(self.layer_weights), weights_path=weights_path
        )

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        from trainner_redux_tpu.archs.feature_towers import imagenet_norm

        fx = self.tower(imagenet_norm(pred.astype(jnp.float32)))
        fy = self.tower(
            imagenet_norm(jax.lax.stop_gradient(target.astype(jnp.float32)))
        )
        total = jnp.zeros((), jnp.float32)
        for k, w in self.layer_weights.items():
            total = total + w * self.criterion(fx[k], fy[k])
        return self.loss_weight * total


@LOSS_REGISTRY.register(name="linedistillerloss")
class LineDistillerLoss:
    """Line-map consistency via the frozen LineDistiller extractor."""

    def __init__(
        self,
        loss_weight: float = 1.0,
        criterion: str = "l1",
        weights_path: str | None = None,
        **_: object,
    ) -> None:
        from trainner_redux_tpu.archs.feature_towers import LineDistillerNet

        self.loss_weight = float(loss_weight)
        self.criterion = get_criterion(criterion)
        self.net = LineDistillerNet(weights_path=weights_path)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        # Normalize(mean=0.5, std=0.5): [0,1] -> [-1,1]
        a = self.net((pred.astype(jnp.float32) - 0.5) / 0.5)
        b = self.net(
            jax.lax.stop_gradient((target.astype(jnp.float32) - 0.5) / 0.5)
        )
        return self.loss_weight * self.criterion(a, b)


@LOSS_REGISTRY.register(name="aesoploss")
class AESOPLoss:
    """Autoencoded-space reconstruction loss on a frozen pretrained AE.

    ``pretrain_network_ae`` points at a flax safetensors checkpoint saved by
    AEModel (models/ae_model.py) via save_network_safetensors.
    """

    def __init__(
        self,
        loss_weight: float = 1.0,
        scale: int = 4,
        pretrain_network_ae: str | None = None,
        criterion: str = "charbonnier",
        **_: object,
    ) -> None:
        from safetensors.numpy import load_file

        from trainner_redux_tpu.archs.autoencoder_arch import AutoEncoder
        from trainner_redux_tpu.archs.feature_towers import resolve_weights
        from trainner_redux_tpu.models.base_model import BaseModel

        self.loss_weight = float(loss_weight)
        if criterion == "msssiml1":
            from trainner_redux_tpu.losses.ms_ssim_l1_loss import MSSSIML1Loss

            self.criterion = MSSSIML1Loss(loss_weight=1.0)
        else:
            self.criterion = get_criterion(criterion)
        path = resolve_weights(pretrain_network_ae, "aesop_ae.safetensors", "AESOPLoss")
        flat = load_file(path)
        params = BaseModel.unflatten_params(dict(flat))
        if "params" in params:
            params = params["params"]
        self.ae = AutoEncoder(scale=scale)
        self.params = jax.tree.map(jnp.asarray, params)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        ae_sr = self.ae.apply(
            {"params": self.params}, pred.astype(jnp.float32), train=False
        )
        ae_hr = self.ae.apply(
            {"params": self.params},
            jax.lax.stop_gradient(target.astype(jnp.float32)),
            train=False,
        )
        return self.loss_weight * self.criterion(ae_sr, ae_hr)


@LOSS_REGISTRY.register(name="contrastiveloss")
class ContrastiveLoss:
    """CLIP-feature InfoNCE against the bicubic-upscaled LQ negative.

    With local CLIP ViT-B/32 weights: cosine-similarity InfoNCE on CLIP image
    features (reference contrastive_loss.py:146-176). Without them: the
    reference's own simplified fallback — pixel-space L1 InfoNCE
    (contrastive_loss.py:178-189).
    """

    def __init__(
        self,
        loss_weight: float = 0.1,
        temperature: float = 0.1,
        weights_path: str | None = None,
        **_: object,
    ) -> None:
        if temperature <= 0:
            raise ValueError("temperature must be a positive float.")
        self.loss_weight = float(loss_weight)
        self.temperature = float(temperature)
        self.clip = None
        try:
            from trainner_redux_tpu.archs.feature_towers import CLIPVisionEncoder

            self.clip = CLIPVisionEncoder(weights_path=weights_path)
        except FileNotFoundError as e:
            import logging

            logging.getLogger("trainner_redux_tpu").warning(
                "ContrastiveLoss: %s — using the simplified pixel-space "
                "fallback (same as the reference without CLIP).",
                e,
            )

    @staticmethod
    def _info_nce(pos_sim, neg_sim, temperature):
        logits = jnp.stack([pos_sim, neg_sim], axis=1) / temperature
        # cross-entropy with label 0 for every row
        return (-jax.nn.log_softmax(logits, axis=1)[:, 0]).mean()

    def __call__(
        self, sr: jnp.ndarray, gt: jnp.ndarray, lq: jnp.ndarray
    ) -> jnp.ndarray:
        from trainner_redux_tpu.ops.resize import resize

        sr = sr.astype(jnp.float32)
        gt = jax.lax.stop_gradient(gt.astype(jnp.float32))
        h, w = gt.shape[1], gt.shape[2]
        negative = jax.lax.stop_gradient(
            resize(lq.astype(jnp.float32), (h, w), "bicubic", True)
        )
        if self.clip is not None:
            f_sr = self.clip(sr)
            f_gt = jax.lax.stop_gradient(self.clip(gt))
            f_neg = jax.lax.stop_gradient(self.clip(negative))
            norm = lambda f: f / jnp.linalg.norm(f, axis=-1, keepdims=True)
            f_sr, f_gt, f_neg = norm(f_sr), norm(f_gt), norm(f_neg)
            pos = (f_sr * f_gt).sum(-1)
            neg = (f_sr * f_neg).sum(-1)
        else:
            pos = -jnp.abs(sr - gt).mean(axis=(1, 2, 3))
            neg = -jnp.abs(sr - negative).mean(axis=(1, 2, 3))
        return self.loss_weight * self._info_nce(pos, neg, self.temperature)
