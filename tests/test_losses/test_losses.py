"""Loss property tests (parity with reference tests/test_losses/test_losses.py):
identical images => ~0 loss; black vs white => positive; finite gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.losses import build_loss

LOSS_CONFIGS = [
    {"type": "l1loss", "loss_weight": 1.0},
    {"type": "mseloss", "loss_weight": 1.0},
    {"type": "charbonnierloss", "loss_weight": 1.0},
    {"type": "huberloss", "loss_weight": 1.0},
    {"type": "fftloss", "loss_weight": 1.0},
    {"type": "colorloss", "loss_weight": 1.0, "scale": 2},
    {"type": "lumaloss", "loss_weight": 1.0},
    {"type": "averageloss", "loss_weight": 1.0, "scale": 2},
    {"type": "bicubicloss", "loss_weight": 1.0, "scale": 2},
    {"type": "ssimloss", "loss_weight": 1.0},
    {"type": "mssimloss", "loss_weight": 1.0},
    {"type": "msssiml1loss", "loss_weight": 1.0},
    {"type": "nccloss", "loss_weight": 1.0},
    {"type": "cosimloss", "loss_weight": 1.0},
    {"type": "hfenloss", "loss_weight": 1.0},
    {"type": "gradientvarianceloss", "loss_weight": 1.0, "patch_size": 8},
    {"type": "ffloss", "loss_weight": 1.0},
    {"type": "laplacianpyramidloss", "loss_weight": 1.0, "max_levels": 2},
    {"type": "checkerboardloss", "loss_weight": 1.0, "scale": 2},
    {"type": "chcloss", "loss_weight": 1.0},
    {"type": "consistencyloss", "loss_weight": 1.0},
    {"type": "fliploss", "loss_weight": 1.0},
    pytest.param({"type": "distsloss", "loss_weight": 1.0}, marks=pytest.mark.slow),
    pytest.param({"type": "contextualloss", "loss_weight": 1.0}, marks=pytest.mark.slow),
]

# losses whose zero at identical inputs is not exact (clip floors, relative terms)
NONZERO_AT_IDENTITY = {"chcloss", "contextualloss", "consistencyloss"}
# losses that are not plain decreasing distances (correlation/statistics based)
NO_BW_CHECK = {"nccloss", "gradientvarianceloss", "checkerboardloss", "contextualloss", "cosimloss"}

SHAPE = (2, 32, 32, 3)


def shape_for(cfg):
    # ms-ssim needs 5 halvings with an 11-px window alive at the smallest level
    return (1, 176, 176, 3) if cfg["type"] == "mssimloss" else SHAPE


@pytest.mark.parametrize("cfg", LOSS_CONFIGS, ids=lambda c: c["type"])
def test_identical_images_near_zero(cfg):
    loss = build_loss(cfg)
    img = jax.random.uniform(jax.random.key(0), shape_for(cfg))
    val = float(loss(img, img))
    if cfg["type"] in NONZERO_AT_IDENTITY:
        assert np.isfinite(val)
    else:
        assert abs(val) < 1e-3, f"{cfg['type']}: {val}"


@pytest.mark.parametrize("cfg", LOSS_CONFIGS, ids=lambda c: c["type"])
def test_black_vs_white_positive(cfg):
    loss = build_loss(cfg)
    shape = shape_for(cfg)
    if cfg["type"] == "colorloss":
        # chroma loss is blind to black-vs-white; use opposing hues instead
        a = jnp.zeros(shape).at[..., 0].set(1.0)  # red
        b = jnp.zeros(shape).at[..., 1].set(1.0)  # green
    else:
        a = jnp.zeros(shape)
        b = jnp.ones(shape)
    if cfg["type"] in NO_BW_CHECK:
        pytest.skip("statistics-based loss; flat images are degenerate")
    val = float(loss(a, b))
    assert val > 1e-3, f"{cfg['type']}: {val}"


@pytest.mark.parametrize("cfg", LOSS_CONFIGS, ids=lambda c: c["type"])
def test_finite_gradients(cfg):
    loss = build_loss(cfg)
    pred = jax.random.uniform(jax.random.key(1), shape_for(cfg))
    target = jax.random.uniform(jax.random.key(2), shape_for(cfg))
    g = jax.grad(lambda p: jnp.asarray(loss(p, target)).sum())(pred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_psnr_loss_negative_for_identical():
    loss = build_loss({"type": "psnrloss", "loss_weight": 1.0})
    img = jax.random.uniform(jax.random.key(0), SHAPE)
    assert float(loss(img, img)) < -50  # -inf-ish PSNR => very negative log-mse


def test_gan_loss_types():
    from trainner_redux_tpu.losses.gan_loss import GANLoss

    pred = jax.random.normal(jax.random.key(0), (2, 8, 8, 1))
    for gan_type in ("vanilla", "lsgan", "wgan", "wgan_softplus", "hinge"):
        loss = GANLoss(loss_weight=0.1, gan_type=gan_type)
        g = float(loss(pred, True, is_disc=False))
        d_r = float(loss(pred, True, is_disc=True))
        d_f = float(loss(pred, False, is_disc=True))
        assert np.isfinite([g, d_r, d_f]).all(), gan_type


def test_iterative_wrapper_schedule():
    loss = build_loss(
        {
            "type": "l1loss",
            "loss_weight": 1.0,
            "start_iter": 10,
            "target_iter": 20,
            "target_weight": 2.0,
            "disable_after": 100,
        }
    )
    pred = jnp.zeros(SHAPE)
    target = jnp.ones(SHAPE)
    assert float(loss(pred, target, current_iter=jnp.asarray(0))) == 0.0
    mid = float(loss(pred, target, current_iter=jnp.asarray(15)))
    assert mid == pytest.approx(1.5, rel=1e-3)
    assert float(loss(pred, target, current_iter=jnp.asarray(50))) == pytest.approx(2.0)
    assert float(loss(pred, target, current_iter=jnp.asarray(150))) == 0.0


def test_ldl_loss():
    from trainner_redux_tpu.losses.ldl_loss import LDLLoss

    loss = LDLLoss(loss_weight=1.0)
    k = jax.random.key(0)
    out = jax.random.uniform(k, SHAPE)
    ema = jax.random.uniform(jax.random.key(1), SHAPE)
    gt = jax.random.uniform(jax.random.key(2), SHAPE)
    val = float(loss(out, ema, gt))
    assert np.isfinite(val) and val >= 0
    assert float(loss(gt, gt, gt)) == pytest.approx(0.0, abs=1e-6)


def test_hsluv_loss_components():
    loss = build_loss({"type": "hsluvloss", "loss_weight": 1.0})
    img = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    out = loss(img, img)
    assert set(out) == {"hue", "saturation", "lightness"}
    for v in out.values():
        assert abs(float(v)) < 1e-3
    out2 = loss(jnp.zeros((1, 16, 16, 3)).at[..., 0].set(1.0),
                jnp.zeros((1, 16, 16, 3)).at[..., 1].set(1.0))
    assert float(out2["hue"]) > 1e-3


def test_hsluv_reference_values():
    """Pure red -> H~12.18, S~100, L~53.24 (hsluv reference)."""
    from trainner_redux_tpu.utils.hsluv import rgb_to_hsluv

    red = jnp.asarray([[1.0, 0.0, 0.0]])
    h, s, l = np.asarray(rgb_to_hsluv(red))[0]
    assert abs(h - 12.18) < 0.5
    assert abs(s - 100.0) < 1.0
    assert abs(l - 53.24) < 0.5


def test_gated_tower_losses_fail_fast(monkeypatch):
    monkeypatch.delenv("TRAINNER_WEIGHTS_DIR", raising=False)
    with pytest.raises(FileNotFoundError, match="TRAINNER_WEIGHTS_DIR"):
        build_loss({"type": "dinoperceptualloss", "loss_weight": 1.0})


def test_r3gan_rewrite():
    from trainner_redux_tpu.losses.gan_loss import R3GANLoss

    loss = build_loss({"type": "ganloss", "gan_type": "r3gan", "loss_weight": 1.0})
    assert isinstance(loss, R3GANLoss)
