"""Render ready-made per-arch config templates.

Parity: /root/reference/scripts/options/generate_default_options.py ->
configs/_templates/train/<Family>/<name>_{fidelity,gan,otf}.yml generated
from ALL_ARCHS + OFFICIAL_SETTINGS (arch_info.py). Using a template directly
is refused by the option parser; users copy into configs/train and edit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

HEADER = "# yaml-language-server: $schema=../../../../schemas/redux-config.schema.json\n"

FIDELITY_LOSSES = """  losses:
    - type: l1loss
      loss_weight: 1.0
    - type: mssimloss
      loss_weight: 1.0
"""

GAN_EXTRA = """    - type: perceptualloss
      loss_weight: 1.0
    - type: ganloss
      gan_type: vanilla
      loss_weight: 0.1
"""


def render(name: str, scale: int, kind: str, settings: dict, video: bool) -> str:
    total_iter = settings["total_iter"]
    sched = settings.get(
        "scheduler",
        {"type": "MultiStepLR", "milestones": [total_iter // 2], "gamma": 0.5},
    )
    milestones = sched.get("milestones", [total_iter // 2])
    ds_extra = "    clip_size: 5\n" if video else ""
    otf_block = ""
    ds_type = "pairedimagedataset" if not video else "pairedvideodataset"
    if kind == "otf":
        ds_type = "realesrgandataset"
        otf_block = (
            "high_order_degradation: true\n"
            "blur_prob: 0.8\ngaussian_noise_prob: 0.5\nnoise_range: [1, 20]\n"
            "jpeg_prob: 1.0\ncompression_jpeg_range: [45, 95]\nrecompression_prob: 0.3\n"
        )
    losses = FIDELITY_LOSSES + (GAN_EXTRA if kind in ("gan", "otf") else "")
    net_d = (
        "network_d:\n  type: dunet\n\n" if kind in ("gan", "otf") else ""
    )
    optim_d = (
        "  optim_d:\n    type: AdamW\n    lr: !!float "
        f"{settings['lr']}\n" if kind in ("gan", "otf") else ""
    )
    gt_or_lq = (
        f"    dataroot_gt: datasets/train/hr\n"
        + ("" if kind == "otf" else "    dataroot_lq: datasets/train/lr\n")
    )
    gt_size_line = "    gt_size: 128\n" if kind == "otf" else "    lq_size: 48\n"
    return f"""{HEADER}# Template for {name} {scale}x ({kind}). Copy into configs/train/ and edit paths.
name: {scale}x_{name}_{kind}
scale: {scale}
num_gpu: auto
compute_dtype: bfloat16

datasets:
  train:
    name: train dataset
    type: {ds_type}
{gt_or_lq}{gt_size_line}{ds_extra}    batch_size_per_gpu: {settings["batch"]}
    num_worker_per_gpu: 8
    accum_iter: 1
  val:
    name: val dataset
    type: {"pairedvideodataset" if video else "pairedimagedataset"}
    dataroot_gt: datasets/val/hr
    dataroot_lq: datasets/val/lr
{ds_extra}
{otf_block}network_g:
  type: {name}

{net_d}train:
  total_iter: {total_iter}
  ema_decay: {settings.get("ema_decay", 0.999)}
  warmup_iter: -1
  grad_clip: false
  optim_g:
    type: AdamW
    lr: !!float {settings["lr"]}
    betas: [0.9, 0.99]
{optim_d}  scheduler:
    type: MultiStepLR
    milestones: {list(milestones)}
    gamma: 0.5
{losses}
val:
  val_enabled: true
  save_img: false
  val_freq: 5000
  metrics_enabled: true
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: {scale}
      test_y_channel: true
    ssim:
      type: calculate_ssim
      crop_border: {scale}
      test_y_channel: true

logger:
  print_freq: 100
  save_checkpoint_freq: 5000
  use_tb_logger: true

path: {{}}
"""


def render_test(name: str, scale: int, video: bool) -> str:
    """Test/inference config (reference options/_templates/test/)."""
    ds_type = "singlevideodataset" if video else "singleimagedataset"
    paired_type = "pairedvideodataset" if video else "pairedimagedataset"
    clip = "    clip_size: 5\n" if video else ""
    return f"""{HEADER}# Test template for {name} {scale}x. Copy into configs/test/ and edit paths.
name: {scale}x_{name}_test
scale: {scale}
num_gpu: auto
is_train: false

datasets:
  test_1:
    name: paired test set
    type: {paired_type}
    dataroot_gt: datasets/test/hr
    dataroot_lq: datasets/test/lr
{clip}  test_2:
    name: inference only (no GT)
    type: {ds_type}
    dataroot_lq: datasets/test/inputs
{clip}
network_g:
  type: {name}

val:
  val_enabled: true
  save_img: true
  metrics_enabled: true
  metrics:
    psnr:
      type: calculate_psnr
      crop_border: {scale}
      test_y_channel: true
    ssim:
      type: calculate_ssim
      crop_border: {scale}
      test_y_channel: true

path:
  pretrain_network_g: experiments/pretrained_models/{name}.safetensors
"""


def render_onnx(name: str, scale: int) -> str:
    """ONNX export config (reference options/_templates/onnx/)."""
    return f"""{HEADER}# ONNX export template for {name} {scale}x. Copy into configs/onnx/ and edit paths.
name: {scale}x_{name}
scale: {scale}
num_gpu: auto
is_train: false

network_g:
  type: {name}

path:
  pretrain_network_g: experiments/pretrained_models/{name}.safetensors

onnx:
  shape: 1x3x256x256
  verify: true
  dtype: fp32
"""


def main() -> None:
    from trainner_redux_tpu.archs.arch_info import ALL_ARCHS, official_settings

    base = os.path.join(os.path.dirname(__file__), "..", "..", "configs", "_templates")
    count = 0
    for arch in ALL_ARCHS:
        for name in arch["names"]:
            settings = official_settings(name)
            scale = max(s for s in arch["scales"])
            family_train = os.path.join(base, "train", arch["family"])
            os.makedirs(family_train, exist_ok=True)
            for kind in ("fidelity", "gan") + (("otf",) if not arch["video"] else ()):
                text = render(name, scale, kind, settings, arch["video"])
                with open(os.path.join(family_train, f"{name}_{kind}.yml"), "w") as f:
                    f.write(text)
                count += 1
            family_test = os.path.join(base, "test", arch["family"])
            os.makedirs(family_test, exist_ok=True)
            with open(os.path.join(family_test, f"{name}_test.yml"), "w") as f:
                f.write(render_test(name, scale, arch["video"]))
            count += 1
            if not arch["video"]:
                family_onnx = os.path.join(base, "onnx", arch["family"])
                os.makedirs(family_onnx, exist_ok=True)
                with open(os.path.join(family_onnx, f"{name}_onnx.yml"), "w") as f:
                    f.write(render_onnx(name, scale))
                count += 1
    print(f"rendered {count} templates under {os.path.abspath(base)}")


if __name__ == "__main__":
    main()
