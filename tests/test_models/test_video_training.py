"""Video SR: PairedVideoDataset clip windows + TemporalSPAN training."""

import numpy as np
import pytest
import yaml

from trainner_redux_tpu.utils.schema import decode

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vid")
    hr, lr = root / "hr", root / "lr"
    hr.mkdir()
    lr.mkdir()
    rng = np.random.default_rng(0)
    for scene in ("sceneA", "sceneB"):
        for f in range(6):
            img = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
            small = cv2.resize(img, (24, 24))
            cv2.imwrite(str(hr / f"{scene}_{f:03d}.png"), img)
            cv2.imwrite(str(lr / f"{scene}_{f:03d}.png"), small)
    return root


def test_paired_video_dataset(video_dataset):
    from trainner_redux_tpu.data import build_dataset
    from trainner_redux_tpu.utils.redux_options import DatasetOptions

    opt = DatasetOptions(
        name="vid", type="pairedvideodataset", clip_size=3,
        dataroot_gt=[str(video_dataset / "hr")], dataroot_lq=[str(video_dataset / "lr")],
        lq_size=16,
    )
    opt.phase = "train"
    opt.scale = 2
    ds = build_dataset(opt)
    # 2 scenes x (6 - 3 + 1) windows
    assert len(ds) == 8
    s = ds[0]
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (32, 32, 3)


def test_temporalspan_training(video_dataset):
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import ReduxOptions

    cfg = f"""
name: test_tspan
scale: 2
num_gpu: 1
compute_dtype: float32
mesh:
  data: 2
datasets:
  train:
    name: vid
    type: pairedvideodataset
    clip_size: 3
    dataroot_gt: {video_dataset}/hr
    dataroot_lq: {video_dataset}/lr
    lq_size: 16
    batch_size_per_gpu: 2
  val:
    name: vidval
    type: pairedvideodataset
    clip_size: 3
    dataroot_gt: {video_dataset}/hr
    dataroot_lq: {video_dataset}/lr
network_g:
  type: temporalspan
  num_frames: 3
  feature_channels: 16
  history_channels: 4
train:
  total_iter: 2
  ema_decay: 0
  optim_g:
    type: AdamW
    lr: 1.0e-4
  losses:
    - type: l1loss
      loss_weight: 1.0
val:
  val_enabled: true
  save_img: false
  metrics_enabled: true
  metrics:
    psnr:
      type: calculate_psnr
logger:
  print_freq: 1
  save_checkpoint_freq: 100
  use_tb_logger: false
path: {{}}
"""
    opt = decode(yaml.safe_load(cfg), ReduxOptions)
    opt.is_train = True
    opt.manual_seed = 0
    for phase, d in opt.datasets.items():
        d.phase = phase.split("_")[0]
        d.scale = 2
        d.dataroot_gt = [d.dataroot_gt]
        d.dataroot_lq = [d.dataroot_lq]

    model = build_model(opt)
    loader = build_dataloader(
        build_dataset(opt.datasets["train"]), opt.datasets["train"], num_gpu=1
    )
    batch = next(iter(loader))
    assert batch["lq"].shape == (2, 3, 16, 16, 3)
    model.feed_data(batch)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_g_total"])

    # video validation path (single clip, batch dim 1)
    val_loader = build_dataloader(
        build_dataset(opt.datasets["val"]), opt.datasets["val"], num_gpu=1
    )
    model.validation(val_loader, 1, None, False)
    assert model.metric_results["psnr"] > 0
