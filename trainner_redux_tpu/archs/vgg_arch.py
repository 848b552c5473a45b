"""VGG feature extractor for perceptual losses (flax/NHWC).

Parity: /root/reference/traiNNer/archs/vgg_arch.py:193 (VGGFeatureExtractor):
named conv-layer taps (conv1_1 .. conv5_4), ImageNet input normalization,
optional range_norm. Pretrained torchvision weights are loaded from a local
file (zero-egress environments cannot download them — same constraint as the
reference, which fetches via torchvision): set `TRAINNER_WEIGHTS_DIR` or pass
`weights_path`. Without weights, construction FAILS by default — training a
perceptual loss or scoring LPIPS against random features is silently
meaningless. Tests opt out via allow_random_init=True or
TRAINNER_ALLOW_RANDOM_VGG=1.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

VGG19_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", 0),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), ("pool3", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), ("pool4", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), ("pool5", 0),
]
VGG16_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), ("pool1", 0),
    ("conv2_1", 128), ("conv2_2", 128), ("pool2", 0),
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("pool3", 0),
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("pool4", 0),
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("pool5", 0),
]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


class VGGFeatureExtractor:
    """Functional VGG: params held as frozen arrays, call returns a dict of
    the requested layer activations. Runs inside jitted loss functions."""

    def __init__(
        self,
        layer_name_list: list[str],
        vgg_type: str = "vgg19",
        use_input_norm: bool = True,
        range_norm: bool = False,
        weights_path: str | None = None,
        seed: int = 0,
        allow_random_init: bool = False,
    ) -> None:
        self.allow_random_init = allow_random_init
        self.layer_name_list = list(layer_name_list)
        self.cfg = VGG19_CFG if vgg_type == "vgg19" else VGG16_CFG
        self.vgg_type = vgg_type
        self.use_input_norm = use_input_norm
        self.range_norm = range_norm
        # only run the net up to the deepest requested layer;
        # 'reluX_Y' taps the post-activation of 'convX_Y' (LPIPS convention)
        names = [n for n, _ in self.cfg]
        last = max(
            names.index(n.replace("relu", "conv")) for n in self.layer_name_list
        )
        self.cfg = self.cfg[: last + 1]
        self.params = self._load_or_init(weights_path, seed)

    def _load_or_init(self, weights_path: str | None, seed: int):
        path = weights_path
        if path is None:
            wdir = os.environ.get("TRAINNER_WEIGHTS_DIR")
            if wdir:
                cand = os.path.join(wdir, f"{self.vgg_type}.pth")
                if os.path.exists(cand):
                    path = cand
        if path and os.path.exists(path):
            return load_torchvision_vgg(path, self.cfg)
        if not (
            self.allow_random_init
            or os.environ.get("TRAINNER_ALLOW_RANDOM_VGG") == "1"
        ):
            raise FileNotFoundError(
                f"Pretrained {self.vgg_type} weights not found. Perceptual/LPIPS "
                "features from a randomly initialized VGG are meaningless; refusing "
                "to train against them. Provide the torchvision state dict via "
                f"weights_path= or place {self.vgg_type}.pth under "
                "$TRAINNER_WEIGHTS_DIR. For tests/experiments only, pass "
                "allow_random_init=True or set TRAINNER_ALLOW_RANDOM_VGG=1."
            )
        import logging

        logging.getLogger("trainner_redux_tpu").warning(
            "VGG weights not found (set TRAINNER_WEIGHTS_DIR or weights_path); "
            "using random init — perceptual features are NOT meaningful."
        )
        rng = np.random.default_rng(seed)
        params = {}
        in_ch = 3
        for name, ch in self.cfg:
            if name.startswith("conv"):
                fan_in = 3 * 3 * in_ch
                params[name] = {
                    "kernel": (rng.standard_normal((3, 3, in_ch, ch)) * (2.0 / fan_in) ** 0.5).astype(np.float32),
                    "bias": np.zeros((ch,), np.float32),
                }
                in_ch = ch
        return jax.tree.map(jnp.asarray, params)

    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """x: NHWC in [0,1] (or [-1,1] with range_norm). Returns layer dict."""
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                _IMAGENET_STD, x.dtype
            )
        feats = {}
        dn = ("NHWC", "HWIO", "NHWC")
        for name, _ch in self.cfg:
            if name.startswith("pool"):
                x = _max_pool(x)
            else:
                p = self.params[name]
                x = jax.lax.conv_general_dilated(
                    x, p["kernel"].astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn,
                ) + p["bias"].astype(x.dtype)
                if name in self.layer_name_list:
                    feats[name] = x  # pre-activation tap (BasicSR convention)
                x = jax.nn.relu(x)
                relu_name = name.replace("conv", "relu")
                if relu_name in self.layer_name_list:
                    feats[relu_name] = x  # post-activation tap (LPIPS convention)
        return feats


def load_torchvision_vgg(path: str, cfg) -> dict:
    """Convert a torchvision VGG state dict (.pth) into the named tree."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    # torchvision keys: features.{idx}.weight — rebuild idx order from cfg
    params = {}
    idx = 0
    for name, _ch in cfg:
        if name.startswith("pool"):
            idx += 1
            continue
        w = sd[f"features.{idx}.weight"].numpy()
        b = sd[f"features.{idx}.bias"].numpy()
        params[name] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": b,
        }
        idx += 2  # conv + relu
    return jax.tree.map(jnp.asarray, params)
