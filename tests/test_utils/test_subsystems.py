"""Auxiliary subsystems: hardware detection, memory manager, dataset analyzer,
zero-config generation, dynamic wrappers, automations."""

import numpy as np
import pytest


def test_hardware_detector():
    from trainner_redux_tpu.utils.hardware_detection import HardwareDetector

    info = HardwareDetector().detect()
    assert info.num_devices >= 1
    assert info.host_cpus >= 1
    assert HardwareDetector().performance_tier() in ("high", "medium", "low")


def test_parameter_optimizer_search():
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.utils.memory_manager import ParameterOptimizer

    def lower_fn(batch, lq):
        def step(x):
            return (x * 2).sum()

        return jax.jit(step).lower(jnp.zeros((batch, lq, lq, 3)))

    opt = ParameterOptimizer(hbm_budget_bytes=1 << 30)
    est = opt.search(lower_fn, 8, 32)
    assert est.fits
    assert (est.batch, est.lq_size) == (8, 32)

    # absurdly tiny budget forces a downshift through the ladder
    tiny = ParameterOptimizer(hbm_budget_bytes=1024, min_batch=1, min_patch=16)
    est2 = tiny.search(lower_fn, 8, 32)
    assert (est2.batch, est2.lq_size) <= (8, 32)


def test_dataset_analyzer(tmp_path):
    import cv2

    from trainner_redux_tpu.utils.dataset_analyzer import DatasetAnalyzer

    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"i{i}.png"), (rng.random((40, 40, 3)) * 255).astype(np.uint8))
    a = DatasetAnalyzer().analyze_folder(str(tmp_path))
    assert a.num_images == 4
    assert 0.0 <= a.complexity_score <= 1.0
    assert a.recommended_lq_size in (32, 48, 64)


def test_zero_config(tmp_path):
    import cv2

    from trainner_redux_tpu.utils.zero_config_training import ZeroConfigTrainingManager

    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(tmp_path / f"i{i}.png"), (rng.random((48, 48, 3)) * 255).astype(np.uint8))
    opt = ZeroConfigTrainingManager().generate("span_s", 2, str(tmp_path))
    assert opt.scale == 2
    assert opt.high_order_degradation  # no LQ root -> OTF
    assert opt.network_g["type"] == "span_s"
    assert opt.train.total_iter > 0


def test_dynamic_wrappers():
    from trainner_redux_tpu.data.dynamic_dataloader_wrapper import (
        DynamicDataLoaderWrapper,
        DynamicDatasetWrapper,
    )

    assert DynamicDatasetWrapper.snap(50) == 48
    assert DynamicDatasetWrapper.snap(10) == 16
    assert DynamicDataLoaderWrapper.snap_batch(13) == 8

    class FakeLoader:
        batch_size = 16

    w = DynamicDataLoaderWrapper(FakeLoader())
    assert w.set_batch_size(13) == 8
    assert w.loader.batch_size == 8


def test_automation_manager_lifecycle():
    from trainner_redux_tpu.utils.training_automations import create_automation_manager

    mgr = create_automation_manager(
        {
            "enabled": True,
            "intelligent_lr_scheduler": {"enabled": True, "patience": 2, "factor": 0.5},
            "intelligent_early_stopping": {"enabled": True, "patience": 3},
            "adaptive_gradient_clipping": {"enabled": True, "window": 50},
        }
    )
    assert mgr is not None
    # no improvement for > patience validations shrinks lr and then stops
    for i, v in enumerate([30.0, 30.0, 30.0, 30.0, 30.0, 30.0, 30.0]):
        mgr.on_validation(i, {"psnr": v})
    assert mgr.lr_multiplier < 1.0
    assert mgr.should_stop

    for i in range(30):
        mgr.on_iteration(i, {"grad_norm_g": 1.0 + 0.01 * i})
    assert mgr.clip_threshold is not None

    state = mgr.state_dict()
    mgr2 = create_automation_manager(
        {
            "enabled": True,
            "intelligent_lr_scheduler": {"enabled": True},
            "intelligent_early_stopping": {"enabled": True},
            "adaptive_gradient_clipping": {"enabled": True},
        }
    )
    mgr2.load_state_dict(state)
    assert mgr2.lr_multiplier == mgr.lr_multiplier
    assert mgr2.should_stop == mgr.should_stop


def test_automations_disabled_returns_none():
    from trainner_redux_tpu.utils.training_automations import create_automation_manager

    assert create_automation_manager(None) is None
    assert create_automation_manager({"enabled": False}) is None


def test_flatten_params_forces_c_order(tmp_path):
    """Regression: jax.device_get can hand back a numpy view whose strides
    reflect XLA's on-device layout (seen for (1,1,Cin,Cout) conv kernels on
    TPU); safetensors.save_file serializes the raw buffer WITHOUT honoring
    strides, silently scrambling exactly those tensors on disk. The
    quality-run checkpoint reloaded as noise (8.5 dB) because of this.
    flatten_params must emit C-contiguous arrays."""
    from safetensors.numpy import load_file, save_file

    from trainner_redux_tpu.models.base_model import BaseModel

    base = np.arange(24, dtype=np.float32).reshape(4, 6)
    view = base.T  # non-contiguous, strides swapped — the XLA-layout shape
    assert not view.flags["C_CONTIGUOUS"]
    params = {"conv": {"kernel": view, "bias": np.ones(3, np.float32)}}
    flat = BaseModel.flatten_params(params)
    for k, v in flat.items():
        assert v.flags["C_CONTIGUOUS"], k
    path = str(tmp_path / "p.safetensors")
    save_file(flat, path)
    back = BaseModel.unflatten_params(load_file(path))
    np.testing.assert_array_equal(back["conv"]["kernel"], base.T)
    np.testing.assert_array_equal(back["conv"]["bias"], params["conv"]["bias"])


def test_preflight_memory_flow():
    """model.preflight_memory lowers the REAL train step AOT and returns a
    fitting (batch, lq_size) estimate; train.py uses it to downshift and
    rebuild the loader before the run starts (reference vram_manager's
    pre-run suggestion flow, redesigned as exact compile-time analysis)."""
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    opt = ReduxOptions(
        name="preflight", scale=2, num_gpu=1, path=PathOptions(),
        network_g={"type": "superultracompact"}, manual_seed=0, is_train=True,
        train=TrainOptions(
            total_iter=10,
            optim_g={"type": "AdamW", "lr": 1e-4},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    est = model.preflight_memory(2, 16)
    assert est.fits
    assert (est.batch, est.lq_size) == (2, 16)
    # the ladder bottoms out at the minimums instead of erroring
    est2 = model.preflight_memory(2, 16, min_batch=1, min_patch=16)
    assert est2.batch >= 1 and est2.lq_size >= 16


def test_diff_user_vs_template(tmp_path):
    """Startup template-diff report (reference options.py:411-427 +
    train.py:330): the user YAML's deviations from the generated default
    template are extracted as a nested tree."""
    import yaml

    from trainner_redux_tpu.utils.options import diff_user_vs_template, yaml_load

    import glob, os
    tmpl = glob.glob("configs/_templates/train/*/span_s_fidelity.yml")[0]
    cfg = yaml.safe_load(open(tmpl))
    cfg["name"] = "my_run"
    cfg["train"]["optim_g"]["lr"] = 12.5
    p = tmp_path / "user.yml"
    p.write_text(yaml.dump(cfg, sort_keys=False))
    opt, _ = yaml_load(str(p))
    diff, template_name = diff_user_vs_template(opt, str(p))
    assert template_name == "span_s_fidelity.yml"
    tree = yaml.safe_load(diff)
    assert tree["name"] == "my_run"
    assert tree["train"]["optim_g"]["lr"] == 12.5
    assert "scale" not in tree  # unchanged keys are not reported
