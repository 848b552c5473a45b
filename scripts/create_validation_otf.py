"""Generate an OTF-degraded validation set from a training config.

Parity: reference scripts/create_validation_otf.py — replicates the exact
on-the-fly degradation pipeline a config trains with (here: the jitted
RealESRGANModel program, so the validation LQ images match training inputs
bit-for-bit) and writes paired lq/gt crops to disk.

    python scripts/create_validation_otf.py \
        --input datasets/val/hr --output datasets/val/otf \
        --config options/train/my_otf_config.yml --count 100 [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="HR image folder")
    ap.add_argument("--output", required=True, help="output folder (lq/ + gt/)")
    ap.add_argument("--config", required=True, help="training YAML with OTF opts")
    ap.add_argument("--count", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import yaml

    from trainner_redux_tpu.data import build_dataset
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.config import Config
    from trainner_redux_tpu.utils.redux_options import ReduxOptions
    from trainner_redux_tpu.utils.schema import decode

    with open(args.config, encoding="utf-8") as f:
        opt = decode(yaml.safe_load(f), ReduxOptions)
    if not opt.high_order_degradation:
        raise SystemExit("config has no OTF pipeline (high_order_degradation)")
    opt.is_train = True
    opt.manual_seed = args.seed
    opt.queue_size = 0  # no training-pair pool when generating a val set
    try:
        Config.set_config(opt)
    except Exception:
        pass

    ds_opt = opt.datasets["train"]
    ds_opt.phase = "train"
    ds_opt.scale = opt.scale
    ds_opt.dataroot_gt = [args.input]
    ds_opt.use_hflip = False
    ds_opt.use_rot = False
    dataset = build_dataset(ds_opt)

    model = build_model(opt)
    model.batch_augment = None  # degradations only; no MoA on a val set

    os.makedirs(osp.join(args.output, "lq"), exist_ok=True)
    os.makedirs(osp.join(args.output, "gt"), exist_ok=True)
    n = min(args.count, len(dataset))
    for i in range(n):
        s = dataset[i]
        batch = {
            k: np.asarray(v)[None]
            for k, v in s.items()
            if k in ("gt", "kernel1", "kernel2", "sinc_kernel")
        }
        model.feed_data(batch)
        lq = np.asarray(model.lq)[0]
        gt = np.asarray(model.gt)[0]
        name = osp.splitext(osp.basename(s["gt_path"]))[0]
        cv2.imwrite(
            osp.join(args.output, "lq", f"{name}.png"),
            (np.clip(lq, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8),
        )
        cv2.imwrite(
            osp.join(args.output, "gt", f"{name}.png"),
            (np.clip(gt, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8),
        )
        if (i + 1) % 10 == 0 or i + 1 == n:
            print(f"{i + 1}/{n}")
    print(f"wrote {n} lq/gt pairs under {args.output}")


if __name__ == "__main__":
    main()
