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


@METRIC_REGISTRY.register(name="calculate_topiq")
def calculate_topiq(img: np.ndarray, img2: np.ndarray, **kwargs) -> float:
    raise NotImplementedError(
        "TOPIQ requires pretrained CFANet weights that are not bundled and "
        "cannot be downloaded in this environment. Place them under "
        "TRAINNER_WEIGHTS_DIR and file an issue to wire the loader, or use "
        "calculate_lpips / calculate_dists."
    )


@METRIC_REGISTRY.register(name="calculate_topiq_nr")
def calculate_topiq_nr(img: np.ndarray, **kwargs) -> float:
    raise NotImplementedError(
        "TOPIQ-NR requires pretrained weights unavailable in this environment."
    )
