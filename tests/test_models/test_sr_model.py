"""Integration: build SRModel from a realistic config, train, validate, save.

Parity with the reference's model integration test
(/root/reference/tests/test_models/test_sr_model.py): constructs the full
pipeline from YAML, runs optimize_parameters, checks logged losses,
exercises save/validation with a real PairedImageDataset.
"""

import os

import numpy as np
import pytest
import yaml

from trainner_redux_tpu.utils.schema import decode


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """8 random 64x64 HR images + 32x32 bicubic LR counterparts."""
    import cv2

    root = tmp_path_factory.mktemp("ds")
    hr_dir, lr_dir = root / "hr", root / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(8):
        hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        lr = cv2.resize(hr, (32, 32), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(hr_dir / f"img{i}.png"), hr)
        cv2.imwrite(str(lr_dir / f"img{i}.png"), lr)
    return root


def make_opt(tiny_dataset, tmp_path, accum=1, ema_decay=0.999):
    from trainner_redux_tpu.utils.redux_options import ReduxOptions

    cfg = f"""
name: test_span_2x
scale: 2
num_gpu: 1
compute_dtype: float32
mesh:
  data: 2
datasets:
  train:
    name: tiny
    type: pairedimagedataset
    dataroot_gt: {tiny_dataset}/hr
    dataroot_lq: {tiny_dataset}/lr
    lq_size: 16
    batch_size_per_gpu: 4
    accum_iter: {accum}
    num_worker_per_gpu: 2
  val:
    name: tinyval
    type: pairedimagedataset
    dataroot_gt: {tiny_dataset}/hr
    dataroot_lq: {tiny_dataset}/lr
network_g:
  type: superultracompact
train:
  total_iter: 4
  ema_decay: {ema_decay}
  optim_g:
    type: AdamW
    lr: 2.0e-3
    betas: [0.9, 0.99]
  scheduler:
    type: MultiStepLR
    milestones: [2]
    gamma: 0.5
  losses:
    - type: l1loss
      loss_weight: 1.0
    - type: lumaloss
      loss_weight: 0.5
val:
  val_enabled: true
  save_img: true
  metrics_enabled: true
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: 2
      test_y_channel: true
    ssim:
      type: calculate_ssim
      crop_border: 2
      test_y_channel: true
logger:
  print_freq: 1
  save_checkpoint_freq: 1000
  use_tb_logger: false
path: {{}}
"""
    opt = decode(yaml.safe_load(cfg), ReduxOptions)
    opt.is_train = True
    opt.manual_seed = 0
    exp = tmp_path / "exp"
    opt.path.experiments_root = str(exp)
    opt.path.models = str(exp / "models")
    opt.path.resume_models = str(exp / "models" / "resume_models")
    opt.path.training_states = str(exp / "training_states")
    opt.path.visualization = str(exp / "visualization")
    opt.path.log = str(exp)
    for phase, d in opt.datasets.items():
        d.phase = phase.split("_")[0]
        d.scale = opt.scale
        d.dataroot_gt = [d.dataroot_gt]
        d.dataroot_lq = [d.dataroot_lq]
    os.makedirs(opt.path.models, exist_ok=True)
    os.makedirs(opt.path.resume_models, exist_ok=True)
    os.makedirs(opt.path.training_states, exist_ok=True)
    return opt


def test_sr_model_trains(tiny_dataset, tmp_path):
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path)
    model = build_model(opt)
    assert model.state.ema_params_g is not None

    train_loader = build_dataloader(
        build_dataset(opt.datasets["train"]), opt.datasets["train"], num_gpu=1
    )
    losses = []
    def batches():
        while True:
            yield from train_loader
    it = batches()
    for i in range(1, 4):
        batch = next(it)
        assert batch["gt"].shape == (4, 32, 32, 3)
        assert batch["lq"].shape == (4, 16, 16, 3)
        model.feed_data(batch)
        model.optimize_parameters(i)
        log = model.get_current_log()
        assert "l_g_l1" in log and "l_g_luma" in log and "l_g_total" in log
        losses.append(log["l_g_total"])
    assert all(np.isfinite(v) for v in losses)

    lrs = model.get_current_learning_rate()
    assert lrs[0] == pytest.approx(1e-3, rel=1e-3)  # after milestone 2: 2e-3*0.5

    # save & files exist
    model.save(epoch=0, current_iter=3)
    assert (tmp_path / "exp" / "models" / "net_g_ema_3.safetensors").exists()
    assert (tmp_path / "exp" / "models" / "resume_models" / "net_g_3.safetensors").exists()
    assert (tmp_path / "exp" / "training_states" / "3.state").exists()

    # validation computes metrics and saves images
    val_loader = build_dataloader(
        build_dataset(opt.datasets["val"]), opt.datasets["val"], num_gpu=1
    )
    model.validation(val_loader, current_iter=3, tb_logger=None, save_img=True)
    assert model.metric_results["psnr"] > 5.0
    assert 0.0 <= model.metric_results["ssim"] <= 1.0

    # resume restores step counter
    model2 = build_model(opt)
    meta = model2.resume_training(str(tmp_path / "exp" / "training_states" / "3.state"))
    assert meta["iter"] == 3
    assert int(model2.state.step) == 3


def test_grad_accumulation(tiny_dataset, tmp_path):
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path, accum=2, ema_decay=0)
    model = build_model(opt)
    assert model.state.ema_params_g is None
    loader = build_dataloader(
        build_dataset(opt.datasets["train"]), opt.datasets["train"], num_gpu=1
    )
    loader.batch_size *= 2  # loader provides accum*batch samples per step
    batch = next(iter(loader))
    assert batch["lq"].shape[0] == 8
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_g_total"])


def test_tiled_inference_matches_direct(tiny_dataset, tmp_path):
    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path)
    model = build_model(opt)
    lq = np.random.default_rng(0).random((1, 40, 56, 3)).astype(np.float32)
    direct = model.test(lq)
    assert direct.shape == (1, 80, 112, 3)
    tiled = model.infer_tiled(lq, tile_size=24, tile_overlap=8)
    assert tiled.shape == (1, 80, 112, 3)
    # interior agreement (borders of tiles may differ slightly due to padding)
    diff = np.abs(direct - tiled)
    assert np.median(diff) < 2e-2


def test_bucketed_eval_matches_per_image(base_model_fixture=None):
    """Sharded bucketed validation must reproduce per-image inference and
    actually spread same-bucket images across the mesh's data axis."""
    import jax
    import numpy as np

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    opt = ReduxOptions(
        name="bucketed_eval", scale=2, num_gpu=len(jax.devices()),
        path=PathOptions(), network_g={"type": "superultracompact"}, manual_seed=0,
        is_train=True, compute_dtype="float32",
        mesh={"data": len(jax.devices())},
        train=TrainOptions(
            total_iter=2,
            optim_g={"type": "AdamW", "lr": 1e-4},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    rng = np.random.default_rng(0)
    # 5 images in two shape buckets (16x16 and 24x16)
    samples = [
        {"lq": rng.random((1, 16, 16, 3)).astype(np.float32), "lq_path": f"a{i}.png"}
        for i in range(3)
    ] + [
        {"lq": rng.random((1, 24, 16, 3)).astype(np.float32), "lq_path": f"b{i}.png"}
        for i in range(2)
    ]
    outs = dict()
    for s, sr in model._eval_bucketed(samples):
        outs[s["lq_path"]] = sr
    assert len(outs) == 5
    for s in samples:
        ref = model.test(s["lq"])[0]
        np.testing.assert_allclose(outs[s["lq_path"]], ref, atol=2e-5)


def test_ema_switch_iter(tiny_dataset, tmp_path):
    """ema_switch_iter=2: after every 2nd optimizer step the online params
    must EQUAL the EMA params (reference sr_model.py:223 /
    ema_pytorch update_model_with_ema_every)."""
    import jax

    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path)
    opt.train.ema_switch_iter = 3
    model = build_model(opt)

    rng = np.random.default_rng(3)
    batch = {
        "lq": rng.random((4, 16, 16, 3), np.float32),
        "gt": rng.random((4, 32, 32, 3), np.float32),
    }
    model.feed_data(batch)

    def maxdiff():
        leaves_p = jax.tree.leaves(model.state.params_g)
        leaves_e = jax.tree.leaves(model.state.ema_params_g)
        return max(float(np.max(np.abs(np.asarray(p) - np.asarray(e))))
                   for p, e in zip(leaves_p, leaves_e))

    model.optimize_parameters(1)  # step 0: EMA warmup copies params (d=0)
    assert maxdiff() == 0.0
    model.optimize_parameters(2)  # step 1: EMA lags behind the update
    assert maxdiff() > 0.0
    model.optimize_parameters(3)  # step 2: (2+1) % 3 == 0 -> switch
    assert maxdiff() == 0.0


def test_remat_trains(tiny_dataset, tmp_path):
    """remat=True wraps the generator forward in jax.checkpoint; training
    still steps and produces finite losses."""
    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path)
    opt.remat = True
    model = build_model(opt)
    rng = np.random.default_rng(4)
    batch = {
        "lq": rng.random((4, 16, 16, 3), np.float32),
        "gt": rng.random((4, 32, 32, 3), np.float32),
    }
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_g_total"])


def test_compute_dtype_reaches_network(tiny_dataset, tmp_path):
    """compute_dtype must actually govern the training net's compute
    precision (the reference's AMP analogue, use_amp/amp_bf16 at
    redux_options.py:464): the train net runs bf16, the validation twin
    stays fp32 sharing the same params, and a step produces finite losses."""
    import jax.numpy as jnp

    from trainner_redux_tpu.models import build_model

    opt = make_opt(tiny_dataset, tmp_path)
    opt.compute_dtype = "bfloat16"
    model = build_model(opt)
    assert model.net_g.dtype == jnp.bfloat16
    assert model.net_g_eval.dtype == jnp.float32
    rng = np.random.default_rng(5)
    batch = {
        "lq": rng.random((4, 16, 16, 3), np.float32),
        "gt": rng.random((4, 32, 32, 3), np.float32),
    }
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_g_total"])
    # fp32 eval twin consumes the (fp32) trained params directly
    out = model.test(batch["lq"])
    assert out.dtype == np.float32 and np.isfinite(out).all()

    # the reference's use_amp flag maps onto the same policy
    opt2 = make_opt(tiny_dataset, tmp_path)
    opt2.compute_dtype = "float32"
    opt2.use_amp = True
    model2 = build_model(opt2)
    assert model2.net_g.dtype == jnp.bfloat16


def test_steps_per_dispatch_equivalence(tiny_dataset, tmp_path):
    """K scanned steps inside one dispatch must train IDENTICALLY to K
    sequential single-step dispatches: same batches in the same order,
    same per-step RNG (keys derive from state.step inside the scan), same
    EMA/optimizer updates."""
    import jax
    import numpy as np

    from trainner_redux_tpu.models import build_model

    rng = np.random.default_rng(7)
    K, B, steps = 4, 2, 8
    batches = [
        {
            "lq": (rng.random((B, 16, 16, 3)) * 255).astype(np.uint8),
            "gt": (rng.random((B, 32, 32, 3)) * 255).astype(np.uint8),
        }
        for _ in range(steps)
    ]

    # sequential baseline
    opt1 = make_opt(tiny_dataset, tmp_path / "seq")
    model1 = build_model(opt1)
    for i, b in enumerate(batches, 1):
        model1.feed_data(b)
        model1.optimize_parameters(i)
    p1 = jax.device_get(model1.state.params_g)
    e1 = jax.device_get(model1.state.ema_params_g)

    # scanned blocks
    opt2 = make_opt(tiny_dataset, tmp_path / "blk")
    opt2.steps_per_dispatch = K
    model2 = build_model(opt2)
    assert model2.steps_per_dispatch == K
    for blk in range(steps // K):
        group = batches[blk * K : (blk + 1) * K]
        stacked = {
            k: np.concatenate([g[k] for g in group], axis=0) for k in ("lq", "gt")
        }
        model2.feed_data(stacked)
        model2.optimize_parameters((blk + 1) * K)
    assert int(jax.device_get(model2.state.step)) == steps
    p2 = jax.device_get(model2.state.params_g)
    e2 = jax.device_get(model2.state.ema_params_g)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(b, a, atol=1e-6), p1, p2)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(b, a, atol=1e-6), e1, e2)
    # logs from the block reflect its last step
    log2 = model2.get_current_log()
    log1 = model1.get_current_log()
    assert abs(log2["l_g_total"] - log1["l_g_total"]) < 1e-5
