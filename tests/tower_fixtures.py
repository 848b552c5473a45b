"""Synthetic torch state dicts in the exact upstream key layouts.

Used to exercise the tower weight loaders (archs/feature_towers.py,
archs/topiq_weights.py) without network access: keys/shapes mirror
timm convnext_tiny, timm ViT-S, torchvision/danbooru ResNet-50,
LineDistiller, HF CLIP ViT-B/32, and pyiqa CFANet checkpoints.
"""

from __future__ import annotations

import numpy as np

_RNG = np.random.default_rng(0)


def _t(*shape: int, std: float = 0.05) -> np.ndarray:
    return (_RNG.standard_normal(shape) * std).astype(np.float32)


def _bn(sd: dict, pre: str, ch: int) -> None:
    sd[f"{pre}.weight"] = np.abs(_t(ch)) + 1.0
    sd[f"{pre}.bias"] = _t(ch)
    sd[f"{pre}.running_mean"] = _t(ch)
    sd[f"{pre}.running_var"] = np.abs(_t(ch)) + 1.0
    sd[f"{pre}.num_batches_tracked"] = np.asarray(0, np.int64)


def _ln(sd: dict, pre: str, ch: int) -> None:
    sd[f"{pre}.weight"] = np.ones(ch, np.float32) + _t(ch)
    sd[f"{pre}.bias"] = _t(ch)


def convnext_tiny_sd() -> dict[str, np.ndarray]:
    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    sd: dict[str, np.ndarray] = {
        "stem.0.weight": _t(96, 3, 4, 4), "stem.0.bias": _t(96),
    }
    _ln(sd, "stem.1", 96)
    for i, depth in enumerate(depths):
        if i > 0:
            _ln(sd, f"stages.{i}.downsample.0", dims[i - 1])
            sd[f"stages.{i}.downsample.1.weight"] = _t(dims[i], dims[i - 1], 2, 2)
            sd[f"stages.{i}.downsample.1.bias"] = _t(dims[i])
        for j in range(depth):
            pre, d = f"stages.{i}.blocks.{j}", dims[i]
            sd[f"{pre}.conv_dw.weight"] = _t(d, 1, 7, 7)
            sd[f"{pre}.conv_dw.bias"] = _t(d)
            _ln(sd, f"{pre}.norm", d)
            sd[f"{pre}.mlp.fc1.weight"] = _t(4 * d, d)
            sd[f"{pre}.mlp.fc1.bias"] = _t(4 * d)
            sd[f"{pre}.mlp.fc2.weight"] = _t(d, 4 * d)
            sd[f"{pre}.mlp.fc2.bias"] = _t(d)
            sd[f"{pre}.gamma"] = np.full(d, 1e-2, np.float32)
    return sd


def vit_small_sd(n_blocks: int = 12, dim: int = 384, patch: int = 16,
                 grid: int = 14) -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {
        "patch_embed.proj.weight": _t(dim, 3, patch, patch),
        "patch_embed.proj.bias": _t(dim),
        "cls_token": _t(1, 1, dim),
        "pos_embed": _t(1, 1 + grid * grid, dim),
    }
    for i in range(n_blocks):
        pre = f"blocks.{i}"
        _ln(sd, f"{pre}.norm1", dim)
        sd[f"{pre}.attn.qkv.weight"] = _t(3 * dim, dim)
        sd[f"{pre}.attn.qkv.bias"] = _t(3 * dim)
        sd[f"{pre}.attn.proj.weight"] = _t(dim, dim)
        sd[f"{pre}.attn.proj.bias"] = _t(dim)
        _ln(sd, f"{pre}.norm2", dim)
        sd[f"{pre}.mlp.fc1.weight"] = _t(4 * dim, dim)
        sd[f"{pre}.mlp.fc1.bias"] = _t(4 * dim)
        sd[f"{pre}.mlp.fc2.weight"] = _t(dim, 4 * dim)
        sd[f"{pre}.mlp.fc2.bias"] = _t(dim)
    _ln(sd, "norm", dim)
    return sd


def _resnet50_body(sd: dict, prefix: str = "") -> None:
    blocks = (3, 4, 6, 3)
    planes = (64, 128, 256, 512)
    sd[f"{prefix}conv1.weight"] = _t(64, 3, 7, 7)
    _bn(sd, f"{prefix}bn1", 64)
    in_ch = 64
    for li, (nb, p) in enumerate(zip(blocks, planes), start=1):
        for bi in range(nb):
            pre = f"{prefix}layer{li}.{bi}"
            sd[f"{pre}.conv1.weight"] = _t(p, in_ch if bi == 0 else p * 4, 1, 1)
            _bn(sd, f"{pre}.bn1", p)
            sd[f"{pre}.conv2.weight"] = _t(p, p, 3, 3)
            _bn(sd, f"{pre}.bn2", p)
            sd[f"{pre}.conv3.weight"] = _t(p * 4, p, 1, 1)
            _bn(sd, f"{pre}.bn3", p * 4)
            if bi == 0:
                sd[f"{pre}.downsample.0.weight"] = _t(p * 4, in_ch, 1, 1)
                _bn(sd, f"{pre}.downsample.1", p * 4)
        in_ch = p * 4


def resnet50_danbooru_sd() -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}
    _resnet50_body(sd, "0.")
    return sd


def line_distiller_sd() -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {"conv1.0.weight": _t(64, 3, 7, 7),
                                 "conv8.3.weight": _t(1, 32, 3, 3)}

    def res_block(pre: str, cin: int, mid: int, cout: int, kind: str) -> None:
        _bn(sd, f"{pre}.left.0", cin)
        sd[f"{pre}.left.2.weight"] = _t(mid, cin, 1, 1)
        _bn(sd, f"{pre}.left.3", mid)
        if kind == "down":
            sd[f"{pre}.left.5.weight"] = _t(mid, mid, 4, 4)
            sd[f"{pre}.shortcut.weight"] = _t(cout, cin, 4, 4)
        elif kind == "up":
            sd[f"{pre}.left.5.weight"] = _t(mid, mid, 4, 4)  # ConvT: (in,out,kh,kw)
            sd[f"{pre}.shortcut.weight"] = _t(cin, cout, 4, 4)
        else:
            sd[f"{pre}.left.5.weight"] = _t(mid, mid, 3, 3)
        _bn(sd, f"{pre}.left.6", mid)
        sd[f"{pre}.left.8.weight"] = _t(cout, mid, 1, 1)

    stages = [
        (1, "stem", 3, 64, 16, 64), (2, "down", 5, 64, 32, 128),
        (3, "down", 8, 128, 64, 256), (4, "down", 11, 256, 128, 512),
        (5, "up", 8, 512, 64, 256), (6, "up", 5, 256, 32, 128),
        (7, "up", 3, 128, 16, 64), (8, "up", 2, 64, 16, 32),
    ]
    for si, kind, n_plain, cin, mid, cout in stages:
        start = 1 if kind == "stem" else 0
        if kind != "stem":
            res_block(f"conv{si}.0", cin, mid, cout, "down" if kind == "down" else "up")
        for j in range(n_plain):
            pmid = 8 if si == 8 else mid
            res_block(f"conv{si}.{start + j + (0 if kind == 'stem' else 1)}",
                      cout, pmid, cout, "plain")
    return sd


def clip_vit_b32_sd() -> dict[str, np.ndarray]:
    dim, layers, patch, grid, proj = 768, 12, 32, 7, 512
    sd: dict[str, np.ndarray] = {
        "vision_model.embeddings.class_embedding": _t(dim),
        "vision_model.embeddings.patch_embedding.weight": _t(dim, 3, patch, patch),
        "vision_model.embeddings.position_embedding.weight": _t(1 + grid * grid, dim),
        "visual_projection.weight": _t(proj, dim),
    }
    _ln(sd, "vision_model.pre_layrnorm", dim)
    _ln(sd, "vision_model.post_layernorm", dim)
    for i in range(layers):
        pre = f"vision_model.encoder.layers.{i}"
        _ln(sd, f"{pre}.layer_norm1", dim)
        for q in ("q", "k", "v", "out"):
            sd[f"{pre}.self_attn.{q}_proj.weight"] = _t(dim, dim)
            sd[f"{pre}.self_attn.{q}_proj.bias"] = _t(dim)
        _ln(sd, f"{pre}.layer_norm2", dim)
        sd[f"{pre}.mlp.fc1.weight"] = _t(4 * dim, dim)
        sd[f"{pre}.mlp.fc1.bias"] = _t(4 * dim)
        sd[f"{pre}.mlp.fc2.weight"] = _t(dim, 4 * dim)
        sd[f"{pre}.mlp.fc2.bias"] = _t(dim)
    return sd


def cfanet_sd(use_ref: bool = True, inter_dim: int = 256, heads: int = 4,
              n_levels: int = 5) -> dict[str, np.ndarray]:
    feature_dims = (64, 256, 512, 1024, 2048)
    ff = min(4 * inter_dim, 2048)
    sd: dict[str, np.ndarray] = {
        "h_emb": _t(1, inter_dim // 2, 32, 1),
        "w_emb": _t(1, inter_dim // 2, 1, 32),
    }
    _resnet50_body(sd, "semantic_model.")

    def mha(pre: str, d: int) -> None:
        sd[f"{pre}.in_proj_weight"] = _t(3 * d, d)
        sd[f"{pre}.in_proj_bias"] = _t(3 * d)
        sd[f"{pre}.out_proj.weight"] = _t(d, d)
        sd[f"{pre}.out_proj.bias"] = _t(d)

    def enc_layer(pre: str) -> None:
        mha(f"{pre}.self_attn", inter_dim)
        sd[f"{pre}.linear1.weight"] = _t(ff, inter_dim)
        sd[f"{pre}.linear1.bias"] = _t(ff)
        sd[f"{pre}.linear2.weight"] = _t(inter_dim, ff)
        sd[f"{pre}.linear2.bias"] = _t(inter_dim)
        _ln(sd, f"{pre}.norm1", inter_dim)
        _ln(sd, f"{pre}.norm2", inter_dim)

    def dec_layer(pre: str) -> None:
        mha(f"{pre}.self_attn", inter_dim)
        mha(f"{pre}.multihead_attn", inter_dim)
        for n in (1, 2, 3):
            _ln(sd, f"{pre}.norm{n}", inter_dim)
        sd[f"{pre}.linear1.weight"] = _t(ff, inter_dim)
        sd[f"{pre}.linear1.bias"] = _t(ff)
        sd[f"{pre}.linear2.weight"] = _t(inter_dim, ff)
        sd[f"{pre}.linear2.bias"] = _t(inter_dim)

    for i, fd in enumerate(feature_dims):
        if use_ref:
            sd[f"weight_pool.{i}.0.weight"] = _t(64, fd, 1, 1)
            sd[f"weight_pool.{i}.0.bias"] = _t(64)
            sd[f"weight_pool.{i}.2.weight"] = _t(64, 64, 3, 3)
            sd[f"weight_pool.{i}.2.bias"] = _t(64)
            sd[f"weight_pool.{i}.4.weight"] = _t(1, 64, 3, 3)
            sd[f"weight_pool.{i}.4.bias"] = _t(1)
            in_dim = fd * 3
        else:
            sd[f"weight_pool.{i}.splitconv.weight"] = _t(2 * fd, fd, 1, 1)
            sd[f"weight_pool.{i}.splitconv.bias"] = _t(2 * fd)
            sd[f"weight_pool.{i}.weight_blk.0.weight"] = _t(64, fd, 1, 1)
            sd[f"weight_pool.{i}.weight_blk.0.bias"] = _t(64)
            sd[f"weight_pool.{i}.weight_blk.2.weight"] = _t(64, 64, 3, 3)
            sd[f"weight_pool.{i}.weight_blk.2.bias"] = _t(64)
            sd[f"weight_pool.{i}.weight_blk.4.weight"] = _t(1, 64, 3, 3)
            sd[f"weight_pool.{i}.weight_blk.4.bias"] = _t(1)
            in_dim = fd
        sd[f"dim_reduce.{i}.0.weight"] = _t(inter_dim, in_dim, 1, 1)
        sd[f"dim_reduce.{i}.0.bias"] = _t(inter_dim)
        enc_layer(f"sa_attn_blks.{i}.layers.0")
    for i in range(n_levels - 1):
        dec_layer(f"attn_blks.{i}.layers.0")
    enc_layer("attn_pool")
    for t in (0, 3):
        _ln(sd, f"score_linear.{t}", inter_dim)
        sd[f"score_linear.{t + 1}.weight"] = _t(inter_dim, inter_dim)
        sd[f"score_linear.{t + 1}.bias"] = _t(inter_dim)
    sd["score_linear.6.weight"] = _t(1, inter_dim)
    sd["score_linear.6.bias"] = _t(1)
    return sd


def save_pth(sd: dict[str, np.ndarray], path: str) -> str:
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, path)
    return path
