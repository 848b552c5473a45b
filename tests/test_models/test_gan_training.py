"""GAN training integration: generator + discriminator dual update, adaptive-D,
spectral-norm state threading, R3GAN, feature matching."""

import numpy as np
import pytest
import yaml

from trainner_redux_tpu.utils.schema import decode

pytestmark = pytest.mark.slow


def make_gan_opt(tmp_path, gan_type="vanilla", network_d="unetdiscriminatorsn",
                 adaptive_d=False, extra_losses=""):
    from trainner_redux_tpu.utils.redux_options import ReduxOptions

    cfg = f"""
name: test_gan
scale: 2
num_gpu: 1
compute_dtype: float32
mesh:
  data: 2
datasets:
  train:
    name: synthetic
    type: pairedimagedataset
    lq_size: 16
    batch_size_per_gpu: 2
network_g:
  type: superultracompact
network_d:
  type: {network_d}
train:
  total_iter: 4
  ema_decay: 0.999
  adaptive_d: {str(adaptive_d).lower()}
  optim_g:
    type: AdamW
    lr: 1.0e-4
  optim_d:
    type: AdamW
    lr: 1.0e-4
  losses:
    - type: l1loss
      loss_weight: 1.0
    - type: ganloss
      gan_type: {gan_type}
      loss_weight: 0.1
{extra_losses}
logger:
  print_freq: 1
  save_checkpoint_freq: 1000
  use_tb_logger: false
path: {{}}
"""
    opt = decode(yaml.safe_load(cfg), ReduxOptions)
    opt.is_train = True
    opt.manual_seed = 0
    opt.datasets["train"].phase = "train"
    opt.datasets["train"].scale = 2
    return opt


def run_steps(opt, n=2):
    import jax

    from trainner_redux_tpu.models import build_model

    model = build_model(opt)
    rng = np.random.default_rng(0)
    for i in range(1, n + 1):
        batch = {
            "lq": rng.random((4, 16, 16, 3)).astype(np.float32),
            "gt": rng.random((4, 32, 32, 3)).astype(np.float32),
        }
        model.feed_data(batch)
        model.optimize_parameters(i)
    jax.block_until_ready(model.state.params_g)
    return model


def test_vanilla_gan_step(tmp_path):
    model = run_steps(make_gan_opt(tmp_path))
    log = model.get_current_log()
    for key in ("l_g_l1", "l_g_gan", "l_g_total", "l_d_real", "l_d_fake",
                "out_d_real", "out_d_fake"):
        assert key in log, f"missing {key}: {sorted(log)}"
        assert np.isfinite(log[key]), f"{key} not finite"
    # spectral norm state must exist and evolve
    assert model.state.extra_d is not None and "spectral" in model.state.extra_d


def test_adaptive_d(tmp_path):
    model = run_steps(make_gan_opt(tmp_path, adaptive_d=True), n=3)
    log = model.get_current_log()
    assert "adaptive_d_skip" in log
    assert log["adaptive_d_skip"] in (0.0, 1.0)
    assert float(model.state.gan_ema) != 0.0


def test_r3gan_step(tmp_path):
    model = run_steps(make_gan_opt(tmp_path, gan_type="r3gan"))
    log = model.get_current_log()
    assert "l_g_gan" in log and "l_d_r3gan" in log
    assert "l_d_r1" in log and log["l_d_r1"] >= 0
    assert np.isfinite(log["l_g_total"])


def test_feature_matching_with_dunet(tmp_path):
    extra = """    - type: featurematchingloss
      loss_weight: 0.5
"""
    model = run_steps(make_gan_opt(tmp_path, network_d="dunet", extra_losses=extra))
    log = model.get_current_log()
    assert "l_g_featurematching" in log
    assert np.isfinite(log["l_g_featurematching"])


def test_ldl_with_ema(tmp_path):
    extra = """    - type: ldlloss
      loss_weight: 1.0
"""
    model = run_steps(make_gan_opt(tmp_path, extra_losses=extra))
    log = model.get_current_log()
    assert "l_g_ldl" in log and np.isfinite(log["l_g_ldl"])
