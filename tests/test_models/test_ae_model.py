"""AEModel: autoencoder training with freeze masks."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_ae_model_trains_with_frozen_decoder():
    import jax

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.models.ae_model import AEModel
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    opt = ReduxOptions(
        name="ae_test",
        scale=2,
        num_gpu=1,
        path=PathOptions(),
        network_ae={"type": "autoencoder", "nf": 16, "freeze_decoder": True},
        manual_seed=0,
        is_train=True,
        compute_dtype="float32",
        mesh={"data": 2},
        train=TrainOptions(
            total_iter=5,
            ema_decay=0.99,
            optim_ae={"type": "AdamW", "lr": 1e-3},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    assert isinstance(model, AEModel)

    rng = np.random.default_rng(0)
    batch = {"gt": rng.random((2, 32, 32, 3)).astype(np.float32)}
    dec_before = jax.device_get(jax.tree.leaves(model.state.params_g["decoder"])[0])
    enc_before = jax.device_get(jax.tree.leaves(model.state.params_g["encoder"])[0])
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_ae_total"])
    dec_after = jax.device_get(jax.tree.leaves(model.state.params_g["decoder"])[0])
    enc_after = jax.device_get(jax.tree.leaves(model.state.params_g["encoder"])[0])
    assert np.allclose(dec_before, dec_after), "frozen decoder must not change"
    assert not np.allclose(enc_before, enc_after), "encoder must update"
    assert model.test().shape == (2, 32, 32, 3)
