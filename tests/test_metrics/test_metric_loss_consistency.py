"""Cross-validation: SSIM loss vs SSIM metric (same cv2 window convention)."""

import numpy as np
import pytest


def test_ssim_loss_matches_metric():
    import jax.numpy as jnp

    from trainner_redux_tpu.losses.mssim_loss import ssim
    from trainner_redux_tpu.metrics.psnr_ssim import calculate_ssim

    rng = np.random.default_rng(0)
    a = rng.random((48, 48, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)

    metric = calculate_ssim(a, b)  # cv2 path, [0,255] convention
    # jax ssim on [0,1] with matching constants scaled by data_range
    val = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None], data_range=1.0)[0])
    assert metric == pytest.approx(val, abs=2e-3)


def test_psnr_jax_matches_numpy():
    import jax.numpy as jnp

    from trainner_redux_tpu.metrics.psnr_ssim import calculate_psnr, calculate_psnr_jax

    rng = np.random.default_rng(1)
    a = rng.random((32, 32, 3)).astype(np.float32)
    b = rng.random((32, 32, 3)).astype(np.float32)
    ref = calculate_psnr(a, b, crop_border=2, test_y_channel=True)
    dev = float(
        calculate_psnr_jax(
            jnp.asarray(a)[None], jnp.asarray(b)[None], crop_border=2, test_y_channel=True
        )[0]
    )
    assert ref == pytest.approx(dev, abs=1e-3)
