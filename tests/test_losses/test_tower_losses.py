"""Tower perceptual losses: loaders, math parity vs torch primitives, and
fail-fast behavior without weights."""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tower_fixtures import (  # noqa: E402
    cfanet_sd,
    clip_vit_b32_sd,
    convnext_tiny_sd,
    line_distiller_sd,
    resnet50_danbooru_sd,
    save_pth,
    vit_small_sd,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def wdir(tmp_path_factory):
    return tmp_path_factory.mktemp("tower_weights")


def _img(key: int, shape=(2, 64, 64, 3)):
    return jax.random.uniform(jax.random.key(key), shape, jnp.float32)


def _check_loss(loss, shape=(2, 64, 64, 3)) -> None:
    a, b = _img(1, shape), _img(2, shape)
    val = float(loss(a, b))
    assert np.isfinite(val)
    same = float(loss(a, a))
    assert abs(same) < 1e-4, f"identical inputs should give ~0 loss, got {same}"
    g = jax.grad(lambda x: loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


# --- cross-framework parity of the conversion primitives -------------------


def test_conv_transpose_parity():
    import torch

    from trainner_redux_tpu.archs.feature_towers import _conv_t, convT_w

    w = np.random.default_rng(0).standard_normal((8, 5, 4, 4)).astype(np.float32) * 0.1
    x = np.random.default_rng(1).standard_normal((2, 8, 6, 7)).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    ours = _conv_t(jnp.asarray(x.transpose(0, 2, 3, 1)), convT_w({"w": w}, "w"))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_mha_conversion_parity():
    """Packed torch nn.MultiheadAttention == flax MHDPA after _mha mapping."""
    import torch
    from flax import linen as nn

    from trainner_redux_tpu.archs.topiq_weights import _mha

    d, heads, n, b = 32, 4, 10, 2
    torch.manual_seed(0)
    mha_t = torch.nn.MultiheadAttention(d, heads)
    x = torch.randn(n, b, d)
    with torch.no_grad():
        ref, _ = mha_t(x, x, x)
    sd = {f"m.{k}": v.detach().numpy() for k, v in mha_t.state_dict().items()}
    params = _mha(sd, "m", heads)
    params = {k: jax.tree.map(jnp.asarray, v) for k, v in params.items()}
    flax_mha = nn.MultiHeadDotProductAttention(num_heads=heads)
    xj = jnp.asarray(x.numpy().transpose(1, 0, 2))  # (B, N, D)
    out = flax_mha.apply({"params": params}, xj, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(1, 0, 2), ref.numpy(), atol=2e-5
    )


def test_encoder_layer_parity():
    """Our PreNormEncoderLayer == the reference's pre-norm torch layer."""
    import torch

    from trainner_redux_tpu.archs.topiq_arch import PreNormEncoderLayer
    from trainner_redux_tpu.archs.topiq_weights import _encoder_layer

    d, heads, ff = 32, 4, 64
    torch.manual_seed(1)
    attn = torch.nn.MultiheadAttention(d, heads)
    lin1, lin2 = torch.nn.Linear(d, ff), torch.nn.Linear(ff, d)
    n1, n2 = torch.nn.LayerNorm(d), torch.nn.LayerNorm(d)
    x = torch.randn(9, 2, d)
    with torch.no_grad():
        s2 = n1(x)
        s2, _ = attn(s2, s2, s2)
        src = x + s2
        s2 = lin2(torch.nn.functional.gelu(lin1(n2(src))))
        ref = (src + s2).numpy()
    sd = {}
    for mod, name in ((attn, "self_attn"), (lin1, "linear1"), (lin2, "linear2"),
                      (n1, "norm1"), (n2, "norm2")):
        for k, v in mod.state_dict().items():
            sd[f"L.{name}.{k}"] = v.numpy()
    params = jax.tree.map(jnp.asarray, _encoder_layer(sd, "L", heads))
    layer = PreNormEncoderLayer(d, heads, ff)
    out = layer.apply({"params": params}, jnp.asarray(x.numpy().transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out).transpose(1, 0, 2), ref, atol=2e-5)


# --- loaders + loss behavior ------------------------------------------------


def test_convnext_loss(wdir):
    from trainner_redux_tpu.losses.tower_perceptual_loss import ConvNeXtPerceptualLoss

    path = save_pth(convnext_tiny_sd(), str(wdir / "convnext_tiny.pth"))
    loss = ConvNeXtPerceptualLoss(loss_weight=1.0, weights_path=path)
    _check_loss(loss)


def test_dino_loss(wdir):
    from trainner_redux_tpu.losses.tower_perceptual_loss import DINOPerceptualLoss

    path = save_pth(vit_small_sd(), str(wdir / "vit_small.pth"))
    loss = DINOPerceptualLoss(
        loss_weight=1.0, weights_path=path, layers=["last"], resize=True
    )
    # 50x50 exercises the flexible patch-multiple resize (-> 48x48)
    _check_loss(loss, shape=(1, 50, 50, 3))


def test_anime_loss(wdir):
    from trainner_redux_tpu.losses.tower_perceptual_loss import PerceptualAnimeLoss

    path = save_pth(resnet50_danbooru_sd(), str(wdir / "resnet50_danbooru.pth"))
    loss = PerceptualAnimeLoss(loss_weight=1.0, weights_path=path)
    _check_loss(loss)


def test_line_distiller_loss(wdir):
    from trainner_redux_tpu.losses.tower_perceptual_loss import LineDistillerLoss

    path = save_pth(line_distiller_sd(), str(wdir / "line_distiller.pth"))
    loss = LineDistillerLoss(loss_weight=1.0, weights_path=path)
    _check_loss(loss)


def test_contrastive_clip(wdir):
    from trainner_redux_tpu.losses.tower_perceptual_loss import ContrastiveLoss

    path = save_pth(clip_vit_b32_sd(), str(wdir / "clip_vit_b32.pth"))
    loss = ContrastiveLoss(loss_weight=1.0, temperature=0.1, weights_path=path)
    assert loss.clip is not None
    sr, gt = _img(1), _img(2)
    lq = _img(3, (2, 16, 16, 3))
    val = float(loss(sr, gt, lq))
    assert np.isfinite(val)
    g = jax.grad(lambda x: loss(x, gt, lq))(sr)
    assert np.isfinite(np.asarray(g)).all()


def test_contrastive_fallback_without_weights(monkeypatch):
    from trainner_redux_tpu.losses.tower_perceptual_loss import ContrastiveLoss

    monkeypatch.delenv("TRAINNER_WEIGHTS_DIR", raising=False)
    loss = ContrastiveLoss(loss_weight=1.0)
    assert loss.clip is None  # simplified pixel-space fallback
    sr, gt = _img(1), _img(2)
    lq = _img(3, (2, 16, 16, 3))
    assert np.isfinite(float(loss(sr, gt, lq)))


def test_aesop_loss(tmp_path):
    from safetensors.numpy import save_file

    from trainner_redux_tpu.archs.autoencoder_arch import AutoEncoder
    from trainner_redux_tpu.losses.tower_perceptual_loss import AESOPLoss
    from trainner_redux_tpu.models.base_model import BaseModel

    ae = AutoEncoder(scale=2)
    params = ae.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)[
        "params"
    ]
    path = str(tmp_path / "ae.safetensors")
    save_file(BaseModel.flatten_params(params), path)
    loss = AESOPLoss(loss_weight=1.0, scale=2, pretrain_network_ae=path)
    a, b = _img(1, (1, 32, 32, 3)), _img(2, (1, 32, 32, 3))
    assert np.isfinite(float(loss(a, b)))
    g = jax.grad(lambda x: loss(x, b))(a)
    assert np.isfinite(np.asarray(g)).all()


def test_losses_fail_fast_without_weights(monkeypatch):
    from trainner_redux_tpu.losses.tower_perceptual_loss import (
        ConvNeXtPerceptualLoss,
        DINOPerceptualLoss,
        LineDistillerLoss,
        PerceptualAnimeLoss,
    )

    monkeypatch.delenv("TRAINNER_WEIGHTS_DIR", raising=False)
    for cls in (
        ConvNeXtPerceptualLoss,
        DINOPerceptualLoss,
        PerceptualAnimeLoss,
        LineDistillerLoss,
    ):
        with pytest.raises(FileNotFoundError, match="TRAINNER_WEIGHTS_DIR"):
            cls(loss_weight=1.0)


def test_vgg_hard_fail_without_weights(monkeypatch):
    from trainner_redux_tpu.archs.vgg_arch import VGGFeatureExtractor

    monkeypatch.delenv("TRAINNER_WEIGHTS_DIR", raising=False)
    monkeypatch.delenv("TRAINNER_ALLOW_RANDOM_VGG", raising=False)
    with pytest.raises(FileNotFoundError, match="allow_random_init"):
        VGGFeatureExtractor(["conv1_2"])
    # explicit opt-out still works (tests/experiments)
    VGGFeatureExtractor(["conv1_2"], allow_random_init=True)


def test_topiq_metric(wdir, monkeypatch):
    from trainner_redux_tpu.metrics import perceptual_metrics as pm

    fr = save_pth(cfanet_sd(use_ref=True), str(wdir / "cfanet_fr_kadid_res50.pth"))
    nr = save_pth(cfanet_sd(use_ref=False), str(wdir / "cfanet_nr_koniq_res50.pth"))
    monkeypatch.setattr(pm, "_scorers", {})
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 3), np.float32)
    img2 = rng.random((64, 64, 3), np.float32)
    v = pm.calculate_topiq(img, img2, weights_path=fr)
    assert np.isfinite(v)
    v_nr = pm.calculate_topiq_nr(img, weights_path=nr)
    assert np.isfinite(v_nr)


def test_cfanet_conversion_covers_all_params(wdir):
    """Converted tree must be structurally identical to a fresh init tree."""
    from trainner_redux_tpu.archs.topiq_arch import CFANet
    from trainner_redux_tpu.archs.topiq_weights import load_cfanet_params

    path = save_pth(cfanet_sd(use_ref=True), str(wdir / "cfanet_struct.pth"))
    params = load_cfanet_params(path, use_ref=True)
    net = CFANet(use_ref=True)
    x = jnp.zeros((1, 64, 64, 3))
    init_params = net.init(jax.random.key(0), x, x, train=False)["params"]
    conv = jax.tree.structure(jax.tree.map(jnp.shape, params))
    ref = jax.tree.structure(jax.tree.map(jnp.shape, init_params))
    assert conv == ref, f"param tree mismatch:\n{conv}\nvs\n{ref}"
