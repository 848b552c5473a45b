"""Synthesize a DIV2K-like structured image dataset for quality runs.

No real DIV2K/Urban100 is available in this environment (zero egress), so
quality-parity training runs use procedurally generated photographs-like
images: multi-scale blurred noise (texture), oriented gradients, ellipses
and rectangles (edges/shapes), and thin lines (aliasing-prone detail).
These have enough learnable LR->HR structure that SR training must beat
bicubic by a clear margin if (and only if) the optimization works.

Usage:
  python scripts/parity/synth_dataset.py --root /tmp/synthdiv2k \
      --n-train 200 --n-val 12 --size 256 --scale 2
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def synth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """One structured uint8 RGB image (size x size)."""
    img = np.zeros((size, size, 3), np.float32)

    # base: smooth color field (sum of low-frequency gradients)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for _ in range(3):
        a, b, c = rng.uniform(-1, 1, 3)
        color = rng.uniform(0, 1, 3)
        field = a * xx + b * yy + c * xx * yy
        img += field[..., None] * color[None, None]

    # multi-scale texture: blurred noise octaves
    for octave in (4, 16, 64):
        noise = rng.standard_normal((size // octave + 1, size // octave + 1, 3))
        tex = cv2.resize(noise, (size, size), interpolation=cv2.INTER_CUBIC)
        img += tex.astype(np.float32) * rng.uniform(0.02, 0.12)

    # shapes: ellipses and rectangles with random colors
    canvas = np.ascontiguousarray((img - img.min()) / (np.ptp(img) + 1e-6))
    for _ in range(int(rng.integers(4, 12))):
        color = tuple(float(v) for v in rng.uniform(0, 1, 3))
        if rng.random() < 0.5:
            center = tuple(int(v) for v in rng.integers(0, size, 2))
            axes = tuple(int(v) for v in rng.integers(4, size // 3, 2))
            angle = float(rng.uniform(0, 180))
            cv2.ellipse(canvas, center, axes, angle, 0, 360, color, -1)
        else:
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            p2 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.rectangle(canvas, p1, p2, color, -1 if rng.random() < 0.7 else 2)

    # thin lines (high-frequency detail the SR net must reconstruct)
    for _ in range(int(rng.integers(3, 10))):
        p1 = tuple(int(v) for v in rng.integers(0, size, 2))
        p2 = tuple(int(v) for v in rng.integers(0, size, 2))
        color = tuple(float(v) for v in rng.uniform(0, 1, 3))
        cv2.line(canvas, p1, p2, color, int(rng.integers(1, 3)), cv2.LINE_AA)

    # gentle blur so the image statistics resemble photographs
    canvas = cv2.GaussianBlur(canvas, (0, 0), float(rng.uniform(0.4, 0.9)))
    return (np.clip(canvas, 0, 1) * 255).astype(np.uint8)


def make_dataset(
    root: str, n_train: int, n_val: int, size: int, scale: int, seed: int = 0
) -> None:
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        hr_dir = os.path.join(root, split, "hr")
        lr_dir = os.path.join(root, split, "lr")
        os.makedirs(hr_dir, exist_ok=True)
        os.makedirs(lr_dir, exist_ok=True)
        for i in range(n):
            hr = synth_image(rng, size)
            lr = cv2.resize(
                hr, (size // scale, size // scale), interpolation=cv2.INTER_CUBIC
            )
            cv2.imwrite(os.path.join(hr_dir, f"{i:04d}.png"), hr)
            cv2.imwrite(os.path.join(lr_dir, f"{i:04d}.png"), lr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=200)
    ap.add_argument("--n-val", type=int, default=12)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    make_dataset(args.root, args.n_train, args.n_val, args.size, args.scale, args.seed)
    print(f"wrote {args.n_train} train / {args.n_val} val images under {args.root}")


if __name__ == "__main__":
    main()
