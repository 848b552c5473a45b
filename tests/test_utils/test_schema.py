"""Strict config decoding tests (parity with msgspec forbid_unknown_fields)."""

import pytest

from trainner_redux_tpu.utils.redux_options import DatasetOptions, ReduxOptions
from trainner_redux_tpu.utils.schema import StrictDecodeError, decode, encode_dict, json_schema

MINIMAL = {
    "name": "test",
    "scale": 4,
    "num_gpu": 1,
    "path": {},
}


def test_minimal_decode():
    opt = decode(MINIMAL, ReduxOptions)
    assert opt.name == "test"
    assert opt.scale == 4
    assert opt.path.strict_load_g is True
    assert opt.input_pixel_format == "rgb"


def test_unknown_field_rejected():
    bad = dict(MINIMAL, bogus_key=1)
    with pytest.raises(StrictDecodeError, match="bogus_key"):
        decode(bad, ReduxOptions)


def test_nested_unknown_field_rejected():
    bad = dict(MINIMAL, path={"bogus": 2})
    with pytest.raises(StrictDecodeError, match="bogus"):
        decode(bad, ReduxOptions)


def test_missing_required_field():
    with pytest.raises(StrictDecodeError, match="scale"):
        decode({"name": "x", "num_gpu": 1, "path": {}}, ReduxOptions)


def test_literal_validation():
    bad = dict(MINIMAL, input_pixel_format="cmyk")
    with pytest.raises(StrictDecodeError):
        decode(bad, ReduxOptions)


def test_num_gpu_auto_literal():
    opt = decode(dict(MINIMAL, num_gpu="auto"), ReduxOptions)
    assert opt.num_gpu == "auto"


def test_dataset_options_defaults():
    d = decode({"name": "d", "type": "pairedimagedataset"}, DatasetOptions)
    assert d.filename_tmpl == "{}"
    assert d.kernel_range == (5, 17)
    assert d.io_backend == {"type": "disk"}


def test_tuple_coercion():
    d = decode(
        {"name": "d", "type": "t", "blur_sigma": [0.1, 3.0]},
        DatasetOptions,
    )
    assert d.blur_sigma == (0.1, 3.0)


def test_float_from_int_and_str():
    d = decode({"name": "d", "type": "t", "sinc_prob": 1}, DatasetOptions)
    assert d.sinc_prob == 1.0


def test_datasets_mapping():
    opt = decode(
        dict(
            MINIMAL,
            datasets={
                "train": {"name": "div2k", "type": "pairedimagedataset", "gt_size": 128}
            },
        ),
        ReduxOptions,
    )
    assert opt.datasets["train"].gt_size == 128


def test_roundtrip_encode():
    opt = decode(MINIMAL, ReduxOptions)
    d = encode_dict(opt)
    assert d["name"] == "test"
    opt2 = decode({k: v for k, v in d.items() if v is not None or k in MINIMAL}, ReduxOptions)
    assert opt2.scale == opt.scale


def test_json_schema_generation():
    schema = json_schema(ReduxOptions)
    assert schema["type"] == "object"
    assert "scale" in schema["properties"]
    assert schema["additionalProperties"] is False
    assert "PathOptions" in schema["$defs"]


def test_real_template_config_parses():
    """A realistic traiNNer-redux style YAML must parse unchanged."""
    import yaml

    contents = """
name: 4x_ESRGAN_gan
scale: 4
num_gpu: auto
use_amp: true
amp_bf16: false

datasets:
  train:
    name: train dataset
    type: pairedimagedataset
    dataroot_gt: datasets/train/hr
    dataroot_lq: datasets/train/lr
    lq_size: 32
    use_hflip: true
    use_rot: true
    num_worker_per_gpu: 8
    batch_size_per_gpu: 8
    accum_iter: 1
  val:
    name: val dataset
    type: pairedimagedataset
    dataroot_gt: datasets/val/hr
    dataroot_lq: datasets/val/lr

network_g:
  type: esrgan

network_d:
  type: dunet

train:
  ema_decay: 0.999
  grad_clip: false
  warmup_iter: -1
  optim_g:
    type: AdamW
    lr: !!float 1e-4
    weight_decay: 0
    betas: [0.9, 0.99]
  scheduler:
    type: MultiStepLR
    milestones: [60000]
    gamma: 0.5
  total_iter: 120000
  losses:
    - type: l1loss
      loss_weight: 1.0
    - type: ganloss
      gan_type: vanilla
      loss_weight: 0.1

val:
  val_enabled: false
  save_img: false

logger:
  print_freq: 100
  save_checkpoint_freq: 1000
  use_tb_logger: true

path:
  pretrain_network_g: ~
"""
    raw = yaml.safe_load(contents)
    opt = decode(raw, ReduxOptions)
    assert opt.train.optim_g["lr"] == 1e-4
    assert opt.train.losses[0]["type"] == "l1loss"
    assert opt.datasets["train"].lq_size == 32
