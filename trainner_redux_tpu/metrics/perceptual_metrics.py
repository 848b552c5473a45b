"""Perceptual validation metrics: LPIPS, DISTS, TOPIQ.

Parity: /root/reference/traiNNer/metrics/{lpips,dists,topiq}.py. All accept
HWC float [0,1] numpy images (the validation pipeline's convention) and run
the scorer jitted on device. TOPIQ requires its pretrained CFANet weights
(not bundled upstream either); without them the metric raises with guidance.
"""

from __future__ import annotations

import numpy as np

from trainner_redux_tpu.utils.registry import METRIC_REGISTRY

_scorers: dict[str, object] = {}


def _prep(img: np.ndarray, crop_border: int = 0) -> np.ndarray:
    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]
    return img[None]  # NHWC


@METRIC_REGISTRY.register(name="calculate_lpips")
def calculate_lpips(
    img: np.ndarray, img2: np.ndarray, crop_border: int = 0, **kwargs
) -> float:
    from trainner_redux_tpu.archs.lpips_arch import get_lpips

    if "lpips" not in _scorers:
        _scorers["lpips"] = get_lpips()
    scorer = _scorers["lpips"]
    return float(np.asarray(scorer(_prep(img, crop_border), _prep(img2, crop_border)))[0])


@METRIC_REGISTRY.register(name="calculate_dists")
def calculate_dists(
    img: np.ndarray, img2: np.ndarray, crop_border: int = 0, **kwargs
) -> float:
    from trainner_redux_tpu.losses.dists_loss import DISTSLoss

    if "dists" not in _scorers:
        _scorers["dists"] = DISTSLoss(loss_weight=1.0)
    scorer = _scorers["dists"]
    # DISTSLoss returns 1 - similarity (the distance); metric convention matches
    return float(scorer(_prep(img, crop_border), _prep(img2, crop_border)))


def _get_topiq(use_ref: bool, weights_path: str | None):
    """Build a jitted CFANet scorer with converted pyiqa weights."""
    import jax

    from trainner_redux_tpu.archs.feature_towers import resolve_weights
    from trainner_redux_tpu.archs.topiq_arch import CFANet
    from trainner_redux_tpu.archs.topiq_weights import load_cfanet_params

    filename = (
        "cfanet_fr_kadid_res50.pth" if use_ref else "cfanet_nr_koniq_res50.pth"
    )
    path = resolve_weights(weights_path, filename, "TOPIQ metric")
    params = load_cfanet_params(path, use_ref=use_ref)
    net = CFANet(use_ref=use_ref)

    @jax.jit
    def score(x, y=None):
        return net.apply({"params": params}, x, y, train=False)

    return score


@METRIC_REGISTRY.register(name="calculate_topiq")
def calculate_topiq(
    img: np.ndarray, img2: np.ndarray, crop_border: int = 0,
    weights_path: str | None = None, **kwargs,
) -> float:
    """Full-reference TOPIQ (reference metrics/topiq.py:11-24)."""
    if "topiq" not in _scorers:
        _scorers["topiq"] = _get_topiq(True, weights_path)
    return float(
        np.asarray(_scorers["topiq"](_prep(img, crop_border), _prep(img2, crop_border)))[0]
    )


@METRIC_REGISTRY.register(name="calculate_topiq_nr")
def calculate_topiq_nr(
    img: np.ndarray, crop_border: int = 0, weights_path: str | None = None, **kwargs
) -> float:
    """No-reference TOPIQ (reference metrics/topiq.py:28-34)."""
    if "topiq_nr" not in _scorers:
        _scorers["topiq_nr"] = _get_topiq(False, weights_path)
    return float(np.asarray(_scorers["topiq_nr"](_prep(img, crop_border)))[0])
