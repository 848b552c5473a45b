"""Generate bicubic (antialiased) LR counterparts for an HR folder
(parity: reference generate_bicubic named scripts). Usage:
    generate_bicubic_lr.py <hr_dir> <lr_dir> <scale>"""

import os
import sys

import cv2

if __name__ == "__main__":
    hr_dir, lr_dir, scale = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(lr_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(hr_dir)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = cv2.imread(os.path.join(hr_dir, name), cv2.IMREAD_UNCHANGED)
        h, w = img.shape[:2]
        img = img[: h - h % scale, : w - w % scale]
        lr = cv2.resize(
            img, (img.shape[1] // scale, img.shape[0] // scale),
            interpolation=cv2.INTER_AREA,
        )
        cv2.imwrite(os.path.join(lr_dir, name), lr)
        n += 1
    print(f"wrote {n} LR images to {lr_dir}")
