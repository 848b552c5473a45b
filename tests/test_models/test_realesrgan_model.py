"""OTF degradation pipeline: dataset kernel synthesis, jitted on-device
degradation, training-pair pool, full train step."""

import numpy as np
import pytest
import yaml

from trainner_redux_tpu.utils.schema import decode

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def gt_dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("gt")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f"g{i}.png"), img)
    return root


def make_otf_opt(gt_dataset, queue_size=8):
    from trainner_redux_tpu.utils.redux_options import ReduxOptions

    cfg = f"""
name: test_otf
scale: 2
num_gpu: 1
compute_dtype: float32
mesh:
  data: 2
high_order_degradation: true
queue_size: {queue_size}
blur_prob: 1.0
gaussian_noise_prob: 0.5
noise_range: [1, 15]
jpeg_prob: 1.0
exposure_prob: 0.3
color_temp_prob: 0.3
oversharpen_prob: 0.3
aliasing_prob: 0.3
sensor_noise_prob: 0.3
demosaic_prob: 0.3
motion_blur_prob: 0.3
lens_distort_prob: 0.3
chromatic_aberration_prob: 0.3
rolling_shutter_prob: 0.3
recompression_prob: 0.5
editing_prob: 0.3
editing_exposure_prob: 0.5
p_clean: 0.1
datasets:
  train:
    name: otf
    type: realesrgandataset
    dataroot_gt: {gt_dataset}
    gt_size: 32
    batch_size_per_gpu: 2
    sinc_prob: 0.3
    final_sinc_prob: 0.5
network_g:
  type: superultracompact
train:
  total_iter: 4
  ema_decay: 0
  optim_g:
    type: AdamW
    lr: 1.0e-4
  losses:
    - type: l1loss
      loss_weight: 1.0
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
    opt.datasets["train"].dataroot_gt = [str(gt_dataset)]
    return opt


def test_realesrgan_dataset_kernels(gt_dataset):
    from trainner_redux_tpu.data import build_dataset

    opt = make_otf_opt(gt_dataset)
    ds = build_dataset(opt.datasets["train"])
    sample = ds[0]
    assert sample["gt"].shape == (64, 64, 3)  # gt_size + 32
    for k in ("kernel1", "kernel2", "sinc_kernel"):
        assert sample[k].shape == (21, 21)
        np.testing.assert_allclose(sample[k].sum(), 1.0, atol=1e-4)


def test_otf_model_selection_and_degrade(gt_dataset):
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.models.realesrgan_model import RealESRGANModel

    opt = make_otf_opt(gt_dataset)
    model = build_model(opt)
    assert isinstance(model, RealESRGANModel)

    loader = build_dataloader(build_dataset(opt.datasets["train"]), opt.datasets["train"])
    batch = next(iter(loader))
    assert batch["gt"].shape == (2, 64, 64, 3)
    model.feed_data(batch)
    lq = np.asarray(model.lq)
    gt = np.asarray(model.gt)
    assert gt.shape == (2, 32, 32, 3)
    assert lq.shape == (2, 16, 16, 3)
    assert lq.min() >= 0.0 and lq.max() <= 1.0
    assert np.isfinite(lq).all()
    # degraded LQ should differ from a plain downscale (degradations active)
    model.optimize_parameters(1)
    log = model.get_current_log()
    assert np.isfinite(log["l_g_total"])


def test_training_pair_pool(gt_dataset):
    from trainner_redux_tpu.data import build_dataloader, build_dataset
    from trainner_redux_tpu.models import build_model

    opt = make_otf_opt(gt_dataset, queue_size=4)
    model = build_model(opt)
    loader = build_dataloader(build_dataset(opt.datasets["train"]), opt.datasets["train"])
    for _ in range(3):
        for batch in loader:
            model.feed_data(batch)
    assert model._pool is not None
    assert int(model._pool["count"]) >= 4  # filled


def test_diffjpeg_quality_monotonic():
    import jax

    from trainner_redux_tpu.utils.diffjpeg import diff_jpeg

    img = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3))
    img = np.asarray(img)
    # smooth image compresses better: use a gradient
    xs = np.linspace(0, 1, 32, dtype=np.float32)
    img = np.broadcast_to(xs[None, :, None, None], (1, 32, 32, 3)).copy()
    img += 0.05 * np.asarray(jax.random.uniform(jax.random.key(1), (1, 32, 32, 3)))
    img = np.clip(img, 0, 1)

    def psnr(a, b):
        mse = np.mean((a - b) ** 2)
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    out_hi = np.asarray(diff_jpeg(img, 95.0))
    out_lo = np.asarray(diff_jpeg(img, 10.0))
    assert psnr(img, out_hi) > psnr(img, out_lo) + 3
    assert psnr(img, out_hi) > 30


def test_diffjpeg_vs_real_jpeg():
    """DiffJPEG output should be closer to the real JPEG than to the source
    at low quality (it models the artifacts, not just blurs)."""
    import cv2

    from trainner_redux_tpu.utils.diffjpeg import diff_jpeg

    rng = np.random.default_rng(0)
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    q = 20
    u8 = (img[0] * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
    real = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32) / 255.0
    ours = np.asarray(diff_jpeg(img, float(q)))[0]
    err_ours_real = np.abs(ours - real).mean()
    err_src_real = np.abs(img[0] - real).mean()
    assert err_ours_real < err_src_real * 1.2  # models most of the distortion
