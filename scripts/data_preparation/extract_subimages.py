"""Crop large training images into overlapping sub-images for faster host
loading (parity: reference scripts/data_preparation/extract_subimages.py).
Usage: extract_subimages.py <in_dir> <out_dir> [crop=480] [step=240]"""

import os
import sys

import cv2

if __name__ == "__main__":
    in_dir, out_dir = sys.argv[1], sys.argv[2]
    crop = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    step = int(sys.argv[4]) if len(sys.argv) > 4 else 240
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for name in sorted(os.listdir(in_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = cv2.imread(os.path.join(in_dir, name), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        base = os.path.splitext(name)[0]
        ys = list(range(0, max(h - crop, 0) + 1, step)) or [0]
        xs = list(range(0, max(w - crop, 0) + 1, step)) or [0]
        idx = 0
        for y in ys:
            for x in xs:
                sub = img[y : y + crop, x : x + crop]
                cv2.imwrite(os.path.join(out_dir, f"{base}_s{idx:03d}.png"), sub)
                idx += 1
                count += 1
    print(f"wrote {count} sub-images to {out_dir}")
