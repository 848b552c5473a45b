"""Score an official torch checkpoint against OFFICIAL_METRICS.

Usage:
  python scripts/parity/score_checkpoint.py --arch swinir_m --scale 4 \
      --checkpoint /path/to/official.pth \
      --gt datasets/Urban100/HR --lq datasets/Urban100/LR_bicubic_x4

Imports the checkpoint through utils/torch_compat.py (the golden-validated
conversion path), runs tiled-free full-image inference, and reports
PSNR / SSIM on the Y channel with crop_border=scale — the exact protocol of
the reference's OFFICIAL_METRICS table (arch_info.py:124-512, Urban100-Y).
Compare the output against trainner_redux_tpu.archs.arch_info.OFFICIAL_METRICS.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True, help="registry name, e.g. swinir_m")
    ap.add_argument("--scale", type=int, required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--gt", required=True, help="HR image folder")
    ap.add_argument("--lq", required=True, help="LR image folder")
    ap.add_argument("--arch-args", default="{}", help="extra JSON kwargs")
    args = ap.parse_args()

    import json

    import cv2
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.archs import build_network
    from trainner_redux_tpu.metrics.psnr_ssim import calculate_psnr, calculate_ssim
    from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint

    opt = {"type": args.arch, "scale": args.scale, **json.loads(args.arch_args)}
    net = build_network(opt)
    lq_names = sorted(os.listdir(args.lq))
    first = cv2.imread(os.path.join(args.lq, lq_names[0]))
    h, w = first.shape[:2]
    template = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, h, w, 3)), train=False)
    )["params"]
    # flax-native safetensors (written by this framework) load directly;
    # anything else goes through the torch converter path
    meta = {}
    if args.checkpoint.endswith(".safetensors"):
        from safetensors import safe_open

        with safe_open(args.checkpoint, framework="numpy") as f:
            meta = f.metadata() or {}
    if meta.get("framework") == "trainner_redux_tpu":
        from safetensors.numpy import load_file

        from trainner_redux_tpu.models.base_model import BaseModel

        params = BaseModel.unflatten_params(dict(load_file(args.checkpoint)))
    else:
        params = load_torch_checkpoint(args.checkpoint, net, template)

    apply = jax.jit(lambda x: net.apply({"params": params}, x, train=False))
    psnrs, ssims = [], []
    gt_names = sorted(os.listdir(args.gt))
    for lq_name, gt_name in zip(lq_names, gt_names):
        lq = cv2.imread(os.path.join(args.lq, lq_name))[..., ::-1] / 255.0
        gt = cv2.imread(os.path.join(args.gt, gt_name))[..., ::-1] / 255.0
        out = np.asarray(apply(jnp.asarray(lq, jnp.float32)[None]))[0]
        out = np.clip(out, 0, 1)
        gt = gt[: out.shape[0], : out.shape[1]]
        out = out[: gt.shape[0], : gt.shape[1]]
        p = calculate_psnr(out, gt, crop_border=args.scale, test_y_channel=True)
        s = calculate_ssim(out, gt, crop_border=args.scale, test_y_channel=True)
        psnrs.append(p)
        ssims.append(s)
        print(f"{lq_name}: PSNR-Y {p:.4f}  SSIM-Y {s:.4f}")
    print(f"\nAVG over {len(psnrs)}: PSNR-Y {np.mean(psnrs):.4f}  "
          f"SSIM-Y {np.mean(ssims):.4f}")
    from trainner_redux_tpu.archs.arch_info import OFFICIAL_METRICS

    key = args.arch.lower()
    if key in OFFICIAL_METRICS:
        print("OFFICIAL_METRICS entry:", OFFICIAL_METRICS[key])


if __name__ == "__main__":
    main()
