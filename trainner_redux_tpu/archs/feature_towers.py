"""Pretrained feature towers for perceptual losses (functional, NHWC).

Backbones for the external-tower losses the reference builds on timm/
torchvision/transformers downloads:
- ConvNeXt-Tiny features   (reference convnext_perceptual_loss.py:19-44)
- ViT (DINO-family) tokens (reference dino_perceptual_loss.py:73-85)
- ResNet-50 labeled taps   (reference perceptual_anime_loss.py:92-213)
- LineDistiller U-Net      (reference line_distiller_loss.py:239-333)
- CLIP ViT vision encoder  (reference contrastive_loss.py:48-121)

Zero-egress design: every tower loads a locally provided torch state dict
(the upstream key layout — timm for ConvNeXt/ViT, torchvision for ResNet-50,
HF transformers for CLIP) via ``weights_path`` or ``$TRAINNER_WEIGHTS_DIR/
<name>``; construction fails fast with guidance when absent. Params are
frozen arrays closed over by the jitted loss (same pattern as
vgg_arch.VGGFeatureExtractor); BatchNorms fold into scale/shift at load.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_DN = ("NHWC", "HWIO", "NHWC")

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# weight resolution / loading
# ---------------------------------------------------------------------------


def resolve_weights(
    weights_path: str | None, filename: str, component: str
) -> str:
    """Find a local weights file or raise with actionable guidance."""
    if weights_path:
        if os.path.exists(weights_path):
            return weights_path
        raise FileNotFoundError(
            f"{component}: weights_path {weights_path!r} does not exist."
        )
    wdir = os.environ.get("TRAINNER_WEIGHTS_DIR")
    if wdir:
        cand = os.path.join(wdir, filename)
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"{component} requires pretrained weights that are not bundled and "
        "cannot be downloaded in a zero-egress environment. Provide the "
        f"upstream torch state dict via weights_path= or place {filename!r} "
        "under $TRAINNER_WEIGHTS_DIR."
    )


def load_torch_state(path: str) -> dict[str, np.ndarray]:
    """Load a torch .pth/.pt or .safetensors state dict as numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "params", "model", "params_ema"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def conv_w(sd: dict, key: str) -> np.ndarray:
    """torch conv weight (O,I,kh,kw) -> HWIO."""
    return np.ascontiguousarray(sd[key].transpose(2, 3, 1, 0)).astype(np.float32)


def convT_w(sd: dict, key: str) -> np.ndarray:
    """torch ConvTranspose2d weight (I,O,kh,kw) -> HWIO flipped (gradient view).

    ConvTranspose2d(x, W, s, p) == conv(dilate(x, s), flip(W)^T, pad=k-1-p).
    """
    w = sd[key].astype(np.float32)
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def fold_bn(sd: dict, prefix: str, eps: float = 1e-5) -> tuple[np.ndarray, np.ndarray]:
    """Fold frozen BatchNorm running stats into (scale, shift)."""
    mean = sd[f"{prefix}.running_mean"].astype(np.float32)
    var = sd[f"{prefix}.running_var"].astype(np.float32)
    gamma = sd.get(f"{prefix}.weight")
    beta = sd.get(f"{prefix}.bias")
    gamma = np.ones_like(mean) if gamma is None else gamma.astype(np.float32)
    beta = np.zeros_like(mean) if beta is None else beta.astype(np.float32)
    scale = gamma / np.sqrt(var + eps)
    return scale, beta - mean * scale


def _conv(x, w, b=None, stride=1, pad=0, groups=1, lhs_dilation=None):
    pad = [(pad, pad), (pad, pad)] if isinstance(pad, int) else pad
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), (stride, stride), pad,
        lhs_dilation=lhs_dilation, dimension_numbers=_DN,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + jnp.asarray(b, x.dtype)
    return y


def _conv_t(x, w, stride=2, k=4, p=1):
    """Transposed conv as input-dilated conv (weights pre-flipped by convT_w)."""
    return _conv(x, w, stride=1, pad=k - 1 - p, lhs_dilation=(stride, stride))


def _affine(x, scale, shift):
    return x * jnp.asarray(scale, x.dtype) + jnp.asarray(shift, x.dtype)


def _layernorm(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * jnp.asarray(w, x.dtype) + jnp.asarray(
        b, x.dtype
    )


def imagenet_norm(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / (
        jnp.asarray(_IMAGENET_STD, x.dtype) + eps
    )


# ---------------------------------------------------------------------------
# ConvNeXt-Tiny (timm key layout)
# ---------------------------------------------------------------------------

CONVNEXT_TINY = {"depths": (3, 3, 9, 3), "dims": (96, 192, 384, 768)}


class ConvNeXtFeatures:
    """ConvNeXt feature pyramid; returns the 4 stage outputs (NHWC).

    timm `features_only` equivalent for convnext_tiny
    (reference convnext_perceptual_loss.py:30-36).
    """

    def __init__(self, weights_path: str | None = None, cfg: dict | None = None):
        cfg = cfg or CONVNEXT_TINY
        self.depths, self.dims = cfg["depths"], cfg["dims"]
        path = resolve_weights(
            weights_path, "convnext_tiny.pth", "ConvNeXtPerceptualLoss"
        )
        sd = load_torch_state(path)
        self.params = self._convert(sd)

    def _convert(self, sd: dict) -> dict:
        p: dict[str, Any] = {
            "stem_conv": (conv_w(sd, "stem.0.weight"), sd["stem.0.bias"]),
            "stem_norm": (sd["stem.1.weight"], sd["stem.1.bias"]),
        }
        for i, depth in enumerate(self.depths):
            if i > 0:
                p[f"down{i}_norm"] = (
                    sd[f"stages.{i}.downsample.0.weight"],
                    sd[f"stages.{i}.downsample.0.bias"],
                )
                p[f"down{i}_conv"] = (
                    conv_w(sd, f"stages.{i}.downsample.1.weight"),
                    sd[f"stages.{i}.downsample.1.bias"],
                )
            for j in range(depth):
                pre = f"stages.{i}.blocks.{j}"
                p[f"s{i}b{j}"] = {
                    "dw": (conv_w(sd, f"{pre}.conv_dw.weight"), sd[f"{pre}.conv_dw.bias"]),
                    "norm": (sd[f"{pre}.norm.weight"], sd[f"{pre}.norm.bias"]),
                    "fc1": (sd[f"{pre}.mlp.fc1.weight"].T, sd[f"{pre}.mlp.fc1.bias"]),
                    "fc2": (sd[f"{pre}.mlp.fc2.weight"].T, sd[f"{pre}.mlp.fc2.bias"]),
                    "gamma": sd.get(f"{pre}.gamma"),
                }
        return jax.tree.map(jnp.asarray, p)

    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        """x: NHWC imagenet-normalized. Returns 4 stage features."""
        p = self.params
        x = _conv(x, *p["stem_conv"], stride=4)
        x = _layernorm(x, *p["stem_norm"])
        feats = []
        for i, depth in enumerate(self.depths):
            if i > 0:
                x = _layernorm(x, *p[f"down{i}_norm"])
                x = _conv(x, *p[f"down{i}_conv"], stride=2)
            for j in range(depth):
                bp = p[f"s{i}b{j}"]
                h = _conv(x, *bp["dw"], pad=3, groups=self.dims[i])
                h = _layernorm(h, *bp["norm"])
                h = jnp.dot(h, bp["fc1"][0].astype(h.dtype)) + bp["fc1"][1].astype(h.dtype)
                h = jax.nn.gelu(h, approximate=False)
                h = jnp.dot(h, bp["fc2"][0].astype(h.dtype)) + bp["fc2"][1].astype(h.dtype)
                if bp["gamma"] is not None:
                    h = h * bp["gamma"].astype(h.dtype)
                x = x + h
            feats.append(x)
        return feats


# ---------------------------------------------------------------------------
# ViT (timm DINO-family key layout)
# ---------------------------------------------------------------------------


class ViTFeatures:
    """Plain ViT encoder returning per-block patch-token maps (NHWC).

    Supports the timm key layout used by DINO/DINOv2 checkpoints
    (reference dino_perceptual_loss.py:73-85): patch_embed.proj, cls_token,
    optional reg_token/register_tokens, pos_embed, blocks.N.{norm1,attn.qkv,
    attn.proj,norm2,mlp.fc1,mlp.fc2}, final norm. Position embeddings are
    bicubic-resized for non-native grids.
    """

    def __init__(
        self,
        weights_path: str | None = None,
        model_name: str = "vit_small_patch16_dinov3",
        out_indices: tuple[int, ...] | None = None,
    ):
        self.model_name = model_name
        path = resolve_weights(weights_path, f"{model_name}.pth", "DINOPerceptualLoss")
        sd = load_torch_state(path)
        self.patch = int(sd["patch_embed.proj.weight"].shape[-1])
        self.dim = int(sd["patch_embed.proj.weight"].shape[0])
        self.n_blocks = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
        )
        self.out_indices = out_indices or tuple(range(self.n_blocks))
        head_dim = 64
        self.n_heads = max(1, self.dim // head_dim)
        self.params = self._convert(sd)

    def _convert(self, sd: dict) -> dict:
        p: dict[str, Any] = {
            "patch": (conv_w(sd, "patch_embed.proj.weight"), sd["patch_embed.proj.bias"]),
            "cls": sd["cls_token"],
        }
        reg = sd.get("reg_token", sd.get("register_tokens"))
        p["reg"] = reg
        pos = sd.get("pos_embed")
        if pos is not None:
            n_prefix = 1 if pos.shape[1] % 2 else 0  # cls included in pos grid?
            grid = pos.shape[1] - n_prefix
            side = int(round(grid**0.5))
            if side * side == grid:
                p["pos_prefix"] = pos[:, :n_prefix] if n_prefix else None
                p["pos_grid"] = pos[:, n_prefix:].reshape(1, side, side, self.dim)
            else:  # prefix-token count ambiguous; assume 1 cls token
                p["pos_prefix"] = pos[:, :1]
                side = int(round((pos.shape[1] - 1) ** 0.5))
                p["pos_grid"] = pos[:, 1:].reshape(1, side, side, self.dim)
        else:
            p["pos_prefix"] = None
            p["pos_grid"] = None
        for i in range(self.n_blocks):
            pre = f"blocks.{i}"
            p[f"b{i}"] = {
                "n1": (sd[f"{pre}.norm1.weight"], sd[f"{pre}.norm1.bias"]),
                "qkv": (sd[f"{pre}.attn.qkv.weight"].T, sd.get(f"{pre}.attn.qkv.bias")),
                "proj": (sd[f"{pre}.attn.proj.weight"].T, sd[f"{pre}.attn.proj.bias"]),
                "n2": (sd[f"{pre}.norm2.weight"], sd[f"{pre}.norm2.bias"]),
                "fc1": (sd[f"{pre}.mlp.fc1.weight"].T, sd[f"{pre}.mlp.fc1.bias"]),
                "fc2": (sd[f"{pre}.mlp.fc2.weight"].T, sd[f"{pre}.mlp.fc2.bias"]),
                "ls1": sd.get(f"{pre}.ls1.gamma"),
                "ls2": sd.get(f"{pre}.ls2.gamma"),
            }
        p["norm"] = (sd["norm.weight"], sd["norm.bias"]) if "norm.weight" in sd else None
        return jax.tree.map(jnp.asarray, p)

    def _attn(self, x, bp):
        b, n, d = x.shape
        qkv_w, qkv_b = bp["qkv"]
        qkv = jnp.dot(x, qkv_w.astype(x.dtype))
        if qkv_b is not None:
            qkv = qkv + qkv_b.astype(x.dtype)
        qkv = qkv.reshape(b, n, 3, self.n_heads, d // self.n_heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(d // self.n_heads, x.dtype)
        )
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        return jnp.dot(o, bp["proj"][0].astype(x.dtype)) + bp["proj"][1].astype(x.dtype)

    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """x: NHWC imagenet-normalized, H/W multiples of patch.

        Returns {'feat{i}': (N, h, w, D) patch-token map} for out_indices.
        """
        p = self.params
        x = _conv(x, *p["patch"], stride=self.patch)
        b, h, w, d = x.shape
        if p["pos_grid"] is not None:
            pos = p["pos_grid"]
            if pos.shape[1:3] != (h, w):
                pos = jax.image.resize(pos, (1, h, w, d), "bicubic")
            x = x + pos.astype(x.dtype)
        tokens = x.reshape(b, h * w, d)
        prefix = [jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, d))]
        if p["pos_prefix"] is not None:
            prefix[0] = prefix[0] + p["pos_prefix"].astype(x.dtype)
        if p["reg"] is not None:
            nreg = p["reg"].shape[1]
            prefix.append(jnp.broadcast_to(p["reg"].astype(x.dtype), (b, nreg, d)))
        n_prefix = sum(t.shape[1] for t in prefix)
        tokens = jnp.concatenate(prefix + [tokens], axis=1)

        feats = {}
        for i in range(self.n_blocks):
            bp = p[f"b{i}"]
            a = self._attn(_layernorm(tokens, *bp["n1"]), bp)
            if bp["ls1"] is not None:
                a = a * bp["ls1"].astype(a.dtype)
            tokens = tokens + a
            m = _layernorm(tokens, *bp["n2"])
            m = jnp.dot(m, bp["fc1"][0].astype(m.dtype)) + bp["fc1"][1].astype(m.dtype)
            m = jax.nn.gelu(m, approximate=False)
            m = jnp.dot(m, bp["fc2"][0].astype(m.dtype)) + bp["fc2"][1].astype(m.dtype)
            if bp["ls2"] is not None:
                m = m * bp["ls2"].astype(m.dtype)
            tokens = tokens + m
            if i in self.out_indices:
                t = tokens
                if i == self.n_blocks - 1 and p["norm"] is not None:
                    t = _layernorm(t, *p["norm"])
                feats[f"feat{i}"] = t[:, n_prefix:].reshape(b, h, w, d)
        return feats


# ---------------------------------------------------------------------------
# ResNet-50 with labeled taps (torchvision key layout)
# ---------------------------------------------------------------------------

_R50_BLOCKS = (3, 4, 6, 3)
_R50_MID = (64, 128, 256, 512)


class ResNet50Tap:
    """ResNet-50 body with pre-BN conv taps, torchvision/danbooru layout.

    Label grammar mirrors reference perceptual_anime_loss.py:158-173 hooks on
    the headless Sequential body: "0" = stem conv output; "{s}_{b}_conv3" =
    layerN[b].conv3 raw output where s in 4..7 maps to layer1..layer4.
    """

    def __init__(self, layer_labels: list[str], weights_path: str | None = None,
                 filename: str = "resnet50_danbooru.pth",
                 component: str = "PerceptualAnimeLoss"):
        self.layer_labels = list(layer_labels)
        path = resolve_weights(weights_path, filename, component)
        sd = load_torch_state(path)
        # danbooru checkpoints prefix body keys with "0." (fastai Sequential)
        if any(k.startswith("0.") for k in sd):
            sd = {k[2:]: v for k, v in sd.items() if k.startswith("0.")}
        self.params = self._convert(sd)

    def _convert(self, sd: dict) -> dict:
        p: dict[str, Any] = {
            "conv1": conv_w(sd, "conv1.weight"),
            "bn1": fold_bn(sd, "bn1"),
        }
        for li, nblocks in enumerate(_R50_BLOCKS, start=1):
            for bi in range(nblocks):
                pre = f"layer{li}.{bi}"
                blk = {
                    f"conv{c}": conv_w(sd, f"{pre}.conv{c}.weight") for c in (1, 2, 3)
                }
                for c in (1, 2, 3):
                    blk[f"bn{c}"] = fold_bn(sd, f"{pre}.bn{c}")
                if f"{pre}.downsample.0.weight" in sd:
                    blk["down"] = conv_w(sd, f"{pre}.downsample.0.weight")
                    blk["down_bn"] = fold_bn(sd, f"{pre}.downsample.1")
                p[pre] = blk
        return jax.tree.map(jnp.asarray, p)

    def __call__(self, x: jnp.ndarray) -> dict[str, jnp.ndarray]:
        """x: NHWC imagenet-normalized. Returns {label: activation}."""
        p = self.params
        taps: dict[str, jnp.ndarray] = {}
        x = _conv(x, p["conv1"], stride=2, pad=3)
        if "0" in self.layer_labels:
            taps["0"] = x
        x = jax.nn.relu(_affine(x, *p["bn1"]))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        for li, nblocks in enumerate(_R50_BLOCKS, start=1):
            for bi in range(nblocks):
                blk = p[f"layer{li}.{bi}"]
                stride = 2 if (li > 1 and bi == 0) else 1
                h = jax.nn.relu(_affine(_conv(x, blk["conv1"]), *blk["bn1"]))
                h = jax.nn.relu(
                    _affine(_conv(h, blk["conv2"], stride=stride, pad=1), *blk["bn2"])
                )
                h = _conv(h, blk["conv3"])
                label = f"{li + 3}_{bi}_conv3"
                if label in self.layer_labels:
                    taps[label] = h
                h = _affine(h, *blk["bn3"])
                if "down" in blk:
                    x = _affine(_conv(x, blk["down"], stride=stride), *blk["down_bn"])
                x = jax.nn.relu(x + h)
        return taps


# ---------------------------------------------------------------------------
# LineDistiller (reference line_distiller_loss.py:239-333 layout)
# ---------------------------------------------------------------------------

# (kind, n_plain_blocks, mid, out): structure of conv1..conv8
_LD_STAGES = [
    ("stem", 3, 16, 64),
    ("down", 5, 32, 128),
    ("down", 8, 64, 256),
    ("down", 11, 128, 512),
    ("up", 8, 64, 256),
    ("up", 5, 32, 128),
    ("up", 3, 16, 64),
    ("up_out", 2, 8, 32),
]


class LineDistillerNet:
    """Line-extraction residual U-Net; input [-1,1] NHWC, output 1-channel map."""

    def __init__(self, weights_path: str | None = None):
        path = resolve_weights(
            weights_path, "line_distiller.pth", "LineDistillerLoss"
        )
        sd = load_torch_state(path)
        self.params = self._convert(sd)

    @staticmethod
    def _res_block(sd: dict, pre: str, transposed_mid: bool) -> dict:
        """left = BN,ReLU,Conv1x1, BN,ReLU,Conv(k), BN,ReLU,Conv1x1 (+shortcut)."""
        blk = {
            "bn0": fold_bn(sd, f"{pre}.left.0"),
            "c0": conv_w(sd, f"{pre}.left.2.weight"),
            "bn1": fold_bn(sd, f"{pre}.left.3"),
            "c1": (convT_w if transposed_mid else conv_w)(sd, f"{pre}.left.5.weight"),
            "bn2": fold_bn(sd, f"{pre}.left.6"),
            "c2": conv_w(sd, f"{pre}.left.8.weight"),
        }
        if f"{pre}.shortcut.weight" in sd:
            blk["short"] = (
                (convT_w if transposed_mid else conv_w)(sd, f"{pre}.shortcut.weight")
            )
        return blk

    def _convert(self, sd: dict) -> dict:
        p: dict[str, Any] = {"stem": conv_w(sd, "conv1.0.weight"),
                             "head": conv_w(sd, "conv8.3.weight")}
        for si, (kind, n_plain, _mid, _out) in enumerate(_LD_STAGES, start=1):
            blocks = []
            start = 1 if kind == "stem" else 0
            total = n_plain + (0 if kind == "stem" else 1)
            for j in range(total):
                pre = f"conv{si}.{start + j}"
                is_resample = kind != "stem" and j == 0
                blocks.append(
                    self._res_block(sd, pre, transposed_mid=is_resample and kind.startswith("up"))
                )
            p[f"stage{si}"] = blocks
        return jax.tree.map(jnp.asarray, p)

    @staticmethod
    def _run_block(x, blk, kind_resample: str | None):
        """kind_resample: None (3x3 mid), 'down' (4x4 s2), 'up' (T4x4 s2)."""
        h = jax.nn.relu(_affine(x, *blk["bn0"]))
        h = _conv(h, blk["c0"])
        h = jax.nn.relu(_affine(h, *blk["bn1"]))
        if kind_resample == "down":
            h = _conv(h, blk["c1"], stride=2, pad=1)
        elif kind_resample == "up":
            h = _conv_t(h, blk["c1"])
        else:
            h = _conv(h, blk["c1"], pad=1)
        h = jax.nn.relu(_affine(h, *blk["bn2"]))
        h = _conv(h, blk["c2"])
        if "short" in blk:
            if kind_resample == "down":
                s = _conv(x, blk["short"], stride=2, pad=1)
            elif kind_resample == "up":
                s = _conv_t(x, blk["short"])
            else:
                s = _conv(x, blk["short"])
            return h + s
        return h + x

    def _run_stage(self, x, si: int, kind: str):
        for j, blk in enumerate(self.params[f"stage{si}"]):
            resample = None
            if kind != "stem" and j == 0:
                resample = "down" if kind == "down" else "up"
            x = self._run_block(x, blk, resample)
        return x

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """Reference forward (line_distiller_loss.py:322-333):
        d1..d4 = conv1..4; u1 = d3+conv5(d4); u2 = d2+conv6(u1);
        u3 = d1+conv7(u2); out = conv8(u3)."""
        p = self.params
        x = _conv(x, p["stem"], stride=2, pad=3)
        d1 = self._run_stage(x, 1, "stem")
        d2 = self._run_stage(d1, 2, "down")
        d3 = self._run_stage(d2, 3, "down")
        d4 = self._run_stage(d3, 4, "down")
        u1 = d3 + self._run_stage(d4, 5, "up")
        u2 = d2 + self._run_stage(u1, 6, "up")
        u3 = d1 + self._run_stage(u2, 7, "up")
        u4 = self._run_stage(u3, 8, "up_out")
        return _conv(u4, p["head"], pad=1)


# ---------------------------------------------------------------------------
# CLIP ViT vision encoder (HF transformers key layout)
# ---------------------------------------------------------------------------


class CLIPVisionEncoder:
    """CLIP vision tower + projection (get_image_features equivalent).

    HF `openai/clip-vit-base-patch32` key layout
    (reference contrastive_loss.py:48-121). Input: NHWC in [0,1]; this class
    applies the CLIP preprocess (bicubic 224 + normalize) itself.
    """

    MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def __init__(self, weights_path: str | None = None):
        path = resolve_weights(
            weights_path, "clip_vit_b32.safetensors", "ContrastiveLoss(CLIP)"
        )
        sd = load_torch_state(path)
        sd = {k.removeprefix("vision_model."): v for k, v in sd.items()
              if k.startswith("vision_model.") or k == "visual_projection.weight"}
        self.patch = int(sd["embeddings.patch_embedding.weight"].shape[-1])
        self.dim = int(sd["embeddings.patch_embedding.weight"].shape[0])
        self.n_layers = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers.")
        )
        self.n_heads = self.dim // 64
        self.image_size = self.patch * int(
            round((sd["embeddings.position_embedding.weight"].shape[0] - 1) ** 0.5)
        )
        self.params = self._convert(sd)

    def _convert(self, sd: dict) -> dict:
        p: dict[str, Any] = {
            "patch": conv_w(sd, "embeddings.patch_embedding.weight"),
            "cls": sd["embeddings.class_embedding"],
            "pos": sd["embeddings.position_embedding.weight"],
            "pre_ln": (sd["pre_layrnorm.weight"], sd["pre_layrnorm.bias"]),
            "post_ln": (sd["post_layernorm.weight"], sd["post_layernorm.bias"]),
            "proj": sd["visual_projection.weight"].T,
        }
        for i in range(self.n_layers):
            pre = f"encoder.layers.{i}"
            p[f"l{i}"] = {
                "ln1": (sd[f"{pre}.layer_norm1.weight"], sd[f"{pre}.layer_norm1.bias"]),
                "q": (sd[f"{pre}.self_attn.q_proj.weight"].T, sd[f"{pre}.self_attn.q_proj.bias"]),
                "k": (sd[f"{pre}.self_attn.k_proj.weight"].T, sd[f"{pre}.self_attn.k_proj.bias"]),
                "v": (sd[f"{pre}.self_attn.v_proj.weight"].T, sd[f"{pre}.self_attn.v_proj.bias"]),
                "o": (sd[f"{pre}.self_attn.out_proj.weight"].T, sd[f"{pre}.self_attn.out_proj.bias"]),
                "ln2": (sd[f"{pre}.layer_norm2.weight"], sd[f"{pre}.layer_norm2.bias"]),
                "fc1": (sd[f"{pre}.mlp.fc1.weight"].T, sd[f"{pre}.mlp.fc1.bias"]),
                "fc2": (sd[f"{pre}.mlp.fc2.weight"].T, sd[f"{pre}.mlp.fc2.bias"]),
            }
        return jax.tree.map(jnp.asarray, p)

    def _attn(self, x, lp):
        b, n, d = x.shape
        hd = d // self.n_heads

        def proj(w, bias):
            return (jnp.dot(x, w.astype(x.dtype)) + bias.astype(x.dtype)).reshape(
                b, n, self.n_heads, hd
            )

        q, k, v = proj(*lp["q"]), proj(*lp["k"]), proj(*lp["v"])
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(jnp.asarray(hd, x.dtype)),
            axis=-1,
        )
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        return jnp.dot(o, lp["o"][0].astype(x.dtype)) + lp["o"][1].astype(x.dtype)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: NHWC in [0,1]. Returns (N, proj_dim) image features."""
        from trainner_redux_tpu.ops.resize import resize

        p = self.params
        x = jnp.clip(x, 0.0, 1.0)
        if x.shape[1:3] != (self.image_size, self.image_size):
            x = resize(x, (self.image_size, self.image_size), "bicubic", True)
        x = (x - jnp.asarray(self.MEAN, x.dtype)) / jnp.asarray(self.STD, x.dtype)
        x = _conv(x, p["patch"], stride=self.patch)
        b, h, w, d = x.shape
        tokens = jnp.concatenate(
            [jnp.broadcast_to(p["cls"].astype(x.dtype), (b, 1, d)),
             x.reshape(b, h * w, d)], axis=1
        )
        tokens = tokens + p["pos"].astype(x.dtype)
        tokens = _layernorm(tokens, *p["pre_ln"], eps=1e-5)
        for i in range(self.n_layers):
            lp = p[f"l{i}"]
            tokens = tokens + self._attn(_layernorm(tokens, *lp["ln1"], eps=1e-5), lp)
            m = _layernorm(tokens, *lp["ln2"], eps=1e-5)
            m = jnp.dot(m, lp["fc1"][0].astype(m.dtype)) + lp["fc1"][1].astype(m.dtype)
            m = m * jax.nn.sigmoid(1.702 * m)  # quick_gelu
            m = jnp.dot(m, lp["fc2"][0].astype(m.dtype)) + lp["fc2"][1].astype(m.dtype)
            tokens = tokens + m
        pooled = _layernorm(tokens[:, 0], *p["post_ln"], eps=1e-5)
        return jnp.dot(pooled, p["proj"].astype(pooled.dtype))
