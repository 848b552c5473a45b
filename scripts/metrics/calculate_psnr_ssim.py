"""Folder PSNR/SSIM CLI (parity: reference scripts/metrics/calculate_psnr_ssim.py).

    python scripts/metrics/calculate_psnr_ssim.py \
        --gt datasets/val/HR --restored results/span_x4 \
        [--suffix _span_x4] [--crop_border 4] [--test_y_channel] \
        [--correct_mean_var]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from trainner_redux_tpu.metrics.psnr_ssim import (  # noqa: E402
    calculate_psnr,
    calculate_ssim,
)

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _scan(folder: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(folder):
        out.extend(
            osp.join(root, f) for f in files if f.lower().endswith(IMG_EXTS)
        )
    return sorted(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gt", required=True, help="ground-truth folder")
    ap.add_argument("--restored", required=True, help="restored-image folder")
    ap.add_argument("--suffix", default="", help="restored filename suffix")
    ap.add_argument("--crop_border", type=int, default=4)
    ap.add_argument("--test_y_channel", action="store_true")
    ap.add_argument(
        "--correct_mean_var", action="store_true",
        help="match restored per-channel mean/std to GT before scoring",
    )
    args = ap.parse_args()

    gt_list = _scan(args.gt)
    restored_list = _scan(args.restored)
    print("Testing Y channel." if args.test_y_channel else "Testing RGB channels.")

    psnr_all, ssim_all = [], []
    for i, gt_path in enumerate(gt_list):
        basename, ext = osp.splitext(osp.basename(gt_path))
        img_gt = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED)
        assert img_gt is not None, gt_path
        if args.suffix:
            restored_path = osp.join(args.restored, basename + args.suffix + ext)
        else:
            restored_path = restored_list[i]
        img_r = cv2.imread(restored_path, cv2.IMREAD_UNCHANGED)
        assert img_r is not None, restored_path

        # metrics take HWC RGB in [0,1] (metrics/psnr_ssim.py:_prepare)
        gt = img_gt.astype(np.float32) / 255.0
        r = img_r.astype(np.float32) / 255.0
        if gt.ndim == 3 and gt.shape[2] >= 3:
            gt = gt[:, :, 2::-1]
            r = r[:, :, 2::-1]
        if args.correct_mean_var:
            for _ in range(2):  # reference corrects twice
                for c in range(min(3, r.shape[-1]) if r.ndim == 3 else 1):
                    sel = (slice(None), slice(None), c) if r.ndim == 3 else ...
                    r[sel] = r[sel] - r[sel].mean() + gt[sel].mean()
                    r[sel] = r[sel] / max(r[sel].std(), 1e-8) * gt[sel].std()

        psnr = calculate_psnr(
            gt, r, crop_border=args.crop_border,
            test_y_channel=args.test_y_channel,
        )
        ssim = calculate_ssim(
            gt, r, crop_border=args.crop_border,
            test_y_channel=args.test_y_channel,
        )
        psnr_all.append(psnr)
        ssim_all.append(ssim)
        print(f"{i + 1:3d}: {basename:25}. \tPSNR: {psnr:.6f} dB, \tSSIM: {ssim:.6f}")

    if psnr_all:
        print(f"Average: PSNR: {np.mean(psnr_all):.6f} dB, "
              f"SSIM: {np.mean(ssim_all):.6f}")


if __name__ == "__main__":
    main()
