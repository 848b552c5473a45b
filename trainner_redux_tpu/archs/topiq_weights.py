"""CFANet (TOPIQ) torch-checkpoint -> flax param converter.

Maps the pyiqa `cfanet_*` state-dict layout (the layout the reference's
traiNNer/archs/topiq_arch.py:229-497 module produces) onto our flax CFANet
(archs/topiq_arch.py). Covers the timm-ResNet50 semantic backbone, gated
weight pools, dim-reduce convs, pre-norm transformer encoder/decoder stacks
(packed in_proj qkv -> flax MultiHeadDotProductAttention q/k/v/out), the
attention pool, the score MLP, and the 2D positional embeddings.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from trainner_redux_tpu.archs.feature_towers import load_torch_state

_R50_BLOCKS = (3, 4, 6, 3)


def _convk(sd: dict, key: str) -> dict[str, Any]:
    # arch_util.Conv2d nests the flax conv as a 'conv' submodule
    p = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return {"conv": p}


def _bn(sd: dict, key: str) -> dict[str, np.ndarray]:
    return {
        "scale": sd[f"{key}.weight"],
        "bias": sd[f"{key}.bias"],
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }


def _ln(sd: dict, key: str) -> dict[str, np.ndarray]:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _dense(sd: dict, key: str) -> dict[str, np.ndarray]:
    return {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T),
            "bias": sd[f"{key}.bias"]}


def _mha(sd: dict, key: str, heads: int) -> dict[str, Any]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    w = sd[f"{key}.in_proj_weight"]  # (3D, D)
    b = sd[f"{key}.in_proj_bias"]
    d = w.shape[1]
    hd = d // heads

    def fmt_w(m: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(m.T.reshape(d, heads, hd))

    def fmt_b(m: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(m.reshape(heads, hd))

    return {
        "query": {"kernel": fmt_w(w[:d]), "bias": fmt_b(b[:d])},
        "key": {"kernel": fmt_w(w[d : 2 * d]), "bias": fmt_b(b[d : 2 * d])},
        "value": {"kernel": fmt_w(w[2 * d :]), "bias": fmt_b(b[2 * d :])},
        "out": {
            "kernel": np.ascontiguousarray(
                sd[f"{key}.out_proj.weight"].T.reshape(heads, hd, d)
            ),
            "bias": sd[f"{key}.out_proj.bias"],
        },
    }


def _resnet50(sd: dict, prefix: str = "semantic_model") -> dict[str, Any]:
    p: dict[str, Any] = {
        "conv1": _convk(sd, f"{prefix}.conv1"),
        "bn1": _bn(sd, f"{prefix}.bn1"),
    }
    for li, nblocks in enumerate(_R50_BLOCKS, start=1):
        for bi in range(nblocks):
            pre = f"{prefix}.layer{li}.{bi}"
            blk: dict[str, Any] = {}
            for c in (1, 2, 3):
                blk[f"conv{c}"] = _convk(sd, f"{pre}.conv{c}")
                blk[f"bn{c}"] = _bn(sd, f"{pre}.bn{c}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["ds_conv"] = _convk(sd, f"{pre}.downsample.0")
                blk["ds_bn"] = _bn(sd, f"{pre}.downsample.1")
            p[f"layer{li}_b{bi}"] = blk
    return p


def _encoder_layer(sd: dict, pre: str, heads: int) -> dict[str, Any]:
    return {
        "norm1": _ln(sd, f"{pre}.norm1"),
        "norm2": _ln(sd, f"{pre}.norm2"),
        "self_attn": _mha(sd, f"{pre}.self_attn", heads),
        "ff1": _dense(sd, f"{pre}.linear1"),
        "ff2": _dense(sd, f"{pre}.linear2"),
    }


def _decoder_layer(sd: dict, pre: str, heads: int) -> dict[str, Any]:
    return {
        "norm1": _ln(sd, f"{pre}.norm1"),
        "norm2": _ln(sd, f"{pre}.norm2"),
        "norm3": _ln(sd, f"{pre}.norm3"),
        "cross_attn": _mha(sd, f"{pre}.multihead_attn", heads),
        "ff1": _dense(sd, f"{pre}.linear1"),
        "ff2": _dense(sd, f"{pre}.linear2"),
    }


def convert_cfanet_state(
    sd: dict[str, np.ndarray],
    use_ref: bool = True,
    num_heads: int = 4,
    num_attn_layers: int = 1,
    n_levels: int = 5,
) -> dict[str, Any]:
    """Convert a torch CFANet state dict (numpy values) to flax params."""
    p: dict[str, Any] = {"semantic_model": _resnet50(sd)}
    # h_emb (1, half, 32, 1) -> (32, 1, half); w_emb (1, half, 1, 32) -> (1, 32, half)
    p["h_emb"] = np.ascontiguousarray(sd["h_emb"][0].transpose(1, 2, 0))
    p["w_emb"] = np.ascontiguousarray(sd["w_emb"][0].transpose(1, 2, 0))
    for i in range(n_levels):
        if use_ref:
            for j, t in enumerate((0, 2, 4)):
                p[f"wp_{i}_{j}"] = _convk(sd, f"weight_pool.{i}.{t}")
        else:
            p[f"wp_{i}_split"] = _convk(sd, f"weight_pool.{i}.splitconv")
            for j, t in enumerate((0, 2, 4)):
                p[f"wp_{i}_{j}"] = _convk(sd, f"weight_pool.{i}.weight_blk.{t}")
        p[f"dim_reduce_{i}"] = _convk(sd, f"dim_reduce.{i}.0")
        for li in range(num_attn_layers):
            p[f"sa_{i}_l{li}"] = _encoder_layer(
                sd, f"sa_attn_blks.{i}.layers.{li}", num_heads
            )
    for i in range(n_levels - 1):
        for li in range(num_attn_layers):
            p[f"ca_{i}_l{li}"] = _decoder_layer(
                sd, f"attn_blks.{i}.layers.{li}", num_heads
            )
    p["attn_pool"] = _encoder_layer(sd, "attn_pool", num_heads)
    for idx, t in enumerate((0, 3)):
        p[f"score_ln{idx}"] = _ln(sd, f"score_linear.{t}")
        p[f"score_fc{idx}"] = _dense(sd, f"score_linear.{t + 1}")
    p["score_out"] = _dense(sd, "score_linear.6")
    return p


def load_cfanet_params(
    path: str, use_ref: bool = True, num_heads: int = 4, num_attn_layers: int = 1
) -> dict[str, Any]:
    import jax
    import jax.numpy as jnp

    sd = load_torch_state(path)
    params = convert_cfanet_state(
        sd, use_ref=use_ref, num_heads=num_heads, num_attn_layers=num_attn_layers
    )
    return jax.tree.map(jnp.asarray, params)
