"""Post-training BN recalibration (utils/bn_recalibrate.py): from-scratch
BatchNormNoStats archs get real running statistics from a deterministic
calibration pass, closing the train/eval gap the torch reference covers with
nn.BatchNorm2d's side-effect updates."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.dat_arch import BatchNormNoStats
from trainner_redux_tpu.utils.bn_recalibrate import recalibrate_bn


class _TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Dense(8, name="fc")(x)
        return BatchNormNoStats(name="bn")(x, train)


def test_recalibrate_recovers_statistics():
    mod = _TinyBN()
    x0 = jnp.zeros((4, 16, 16, 3))
    variables = mod.init(jax.random.key(0), x0, train=False)

    rng = np.random.default_rng(0)
    batches = [
        jnp.asarray(rng.normal(2.0, 3.0, (8, 16, 16, 3)).astype(np.float32))
        for _ in range(8)
    ]
    new_vars = recalibrate_bn(mod, variables, batches)

    mean = np.asarray(new_vars["params"]["bn"]["mean"])
    var = np.asarray(new_vars["params"]["bn"]["var"])
    assert not np.allclose(mean, 0.0)  # identity stats replaced
    assert not np.allclose(var, 1.0)

    # eval with calibrated stats must match train-mode normalization on data
    # from the same distribution (the whole point of the pass)
    xt = jnp.asarray(rng.normal(2.0, 3.0, (64, 16, 16, 3)).astype(np.float32))
    y_train = mod.apply(variables, xt, train=True)
    y_eval_old = mod.apply(variables, xt, train=False)
    y_eval_new = mod.apply(new_vars, xt, train=False)
    err_new = float(jnp.abs(y_eval_new - y_train).mean())
    err_old = float(jnp.abs(y_eval_old - y_train).mean())
    assert err_new < err_old * 0.2
    assert err_new < 0.05


class _NoBN(nn.Module):
    @nn.compact
    def __call__(self, x, train=True):
        return nn.Dense(4, name="fc")(x)


def test_recalibrate_requires_bn():
    mod = _NoBN()
    variables = mod.init(jax.random.key(0), jnp.zeros((1, 4)))
    try:
        recalibrate_bn(mod, variables, [jnp.zeros((2, 4))])
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for BN-free module")


def test_sow_is_noop_in_normal_apply():
    """The calibration hooks must not leak a bn_calib collection into normal
    train-mode applies (the jitted train step threads params only)."""
    mod = _TinyBN()
    variables = mod.init(jax.random.key(0), jnp.zeros((2, 8, 8, 3)), train=True)
    y = mod.apply({"params": variables["params"]}, jnp.ones((2, 8, 8, 3)), train=True)
    assert y.shape == (2, 8, 8, 8)


@pytest.mark.slow
def test_model_level_recalibrate(tmp_path):
    """SRModel.recalibrate_bn end-to-end on a BN arch (sebica_mini)."""
    import yaml

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import ReduxOptions
    from trainner_redux_tpu.utils.schema import decode

    cfg = """
name: bn_recal_test
scale: 2
num_gpu: 1
compute_dtype: float32
network_g: {type: sebica_mini}
train:
  total_iter: 4
  ema_decay: 0.9
  optim_g: {type: AdamW, lr: 1.0e-4}
  losses:
    - {type: l1loss, loss_weight: 1.0}
logger: {print_freq: 100, save_checkpoint_freq: 1000, use_tb_logger: false}
path: {}
"""
    opt = decode(yaml.safe_load(cfg), ReduxOptions)
    opt.is_train = True
    opt.manual_seed = 0
    model = build_model(opt)

    rng = np.random.default_rng(0)
    # batch 8: divisible by the virtual 8-device test mesh
    loader = [{"lq": rng.random((8, 16, 16, 3)).astype(np.float32)} for _ in range(3)]
    before = np.asarray(model.test(loader[0]["lq"]))
    model.recalibrate_bn(loader, num_batches=3)
    after = np.asarray(model.test(loader[0]["lq"]))
    assert after.shape == before.shape
    assert np.isfinite(after).all()
    # statistics changed, so eval output changes
    assert not np.allclose(after, before)
