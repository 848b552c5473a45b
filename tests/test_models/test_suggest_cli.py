"""`train.py --suggest` prints the AOT HBM recommendation table and exits
without training. Reference surface: the pre-run VRAM estimator of
/root/reference/traiNNer/utils/vram_manager.py:93-700."""

import numpy as np
import pytest


@pytest.fixture()
def suggest_env(tmp_path):
    import cv2

    hr_dir, lr_dir = tmp_path / "hr", tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        hr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        lr = cv2.resize(hr, (32, 32), interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(str(hr_dir / f"img{i}.png"), hr)
        cv2.imwrite(str(lr_dir / f"img{i}.png"), lr)

    cfg = f"""
name: suggest_smoke
scale: 2
num_gpu: 1
compute_dtype: float32
datasets:
  train:
    name: tiny
    type: pairedimagedataset
    dataroot_gt: {hr_dir}
    dataroot_lq: {lr_dir}
    lq_size: 16
    batch_size_per_gpu: 2
    num_worker_per_gpu: 1
network_g:
  type: superultracompact
train:
  total_iter: 4
  optim_g:
    type: AdamW
    lr: 2.0e-3
  losses:
    - type: l1loss
      loss_weight: 1.0
logger:
  print_freq: 1
  save_checkpoint_freq: 1000
  use_tb_logger: false
path: {{}}
"""
    opt_path = tmp_path / "suggest.yml"
    opt_path.write_text(cfg)
    return tmp_path, opt_path


def test_suggest_cli_prints_table_and_exits(suggest_env, capsys):
    tmp_path, opt_path = suggest_env
    from train import train_pipeline

    train_pipeline(
        str(tmp_path),
        ["-opt", str(opt_path), "--suggest", "--manual_seed", "1"],
    )
    out = capsys.readouterr().out
    assert "AOT HBM suggestion" in out
    assert "recommended:" in out or "no probed configuration fits" in out
    # probed the configured batch and at least one upshift or downshift row
    assert out.count("\n  ") >= 3
    # --suggest must not have trained or saved anything
    assert not list((tmp_path / "experiments").rglob("*.safetensors"))
