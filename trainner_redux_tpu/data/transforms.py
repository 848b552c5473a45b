"""Host-side crop/flip/rotate transforms (numpy, HWC).

Parity: /root/reference/traiNNer/data/transforms.py:12-438 (mod_crop,
paired_random_crop, augment). These run in the host data pipeline on numpy
arrays with an explicit Generator — the device side never sees dynamic
shapes, so training steps compile once.
"""

from __future__ import annotations

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    h, w = img.shape[0], img.shape[1]
    return img[: h - h % scale, : w - w % scale, ...]


def paired_random_crop(
    img_gts: np.ndarray | list[np.ndarray],
    img_lqs: np.ndarray | list[np.ndarray],
    lq_patch_size: int,
    scale: int,
    rng: np.random.Generator,
) -> tuple[np.ndarray | list[np.ndarray], np.ndarray | list[np.ndarray]]:
    """Crop matching (lq_patch, scale*lq_patch) windows from LQ/GT pairs.

    Accepts single images or aligned lists (video clips share one crop).
    """
    gt_is_list = isinstance(img_gts, list)
    lq_is_list = isinstance(img_lqs, list)
    gts = img_gts if gt_is_list else [img_gts]
    lqs = img_lqs if lq_is_list else [img_lqs]

    h_lq, w_lq = lqs[0].shape[0], lqs[0].shape[1]
    h_gt, w_gt = gts[0].shape[0], gts[0].shape[1]
    gt_patch_size = lq_patch_size * scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(
            f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x of LQ ({h_lq}, {w_lq})."
        )
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(
            f"LQ ({h_lq}, {w_lq}) is smaller than patch size ({lq_patch_size}, {lq_patch_size})."
        )

    top = int(rng.integers(0, h_lq - lq_patch_size + 1))
    left = int(rng.integers(0, w_lq - lq_patch_size + 1))

    lqs = [img[top : top + lq_patch_size, left : left + lq_patch_size, ...] for img in lqs]
    top_gt, left_gt = top * scale, left * scale
    gts = [
        img[top_gt : top_gt + gt_patch_size, left_gt : left_gt + gt_patch_size, ...]
        for img in gts
    ]
    return (gts if gt_is_list else gts[0]), (lqs if lq_is_list else lqs[0])


def augment(
    imgs: np.ndarray | list[np.ndarray],
    hflip: bool = True,
    rotation: bool = True,
    rng: np.random.Generator | None = None,
    return_status: bool = False,
    copy: bool = True,
):
    """Random horizontal flip / vertical flip / transpose (90-degree rotation).

    The same transform applies to every image in the list (paired augment).
    With ``copy=False`` the flipped/rotated VIEWS are returned uncopied —
    the single-core host's hot path (profiled: the ascontiguousarray here
    was 80% of per-sample cost, and the collate np.stack copies again
    anyway; one copy per sample is enough).
    """
    rng = rng or np.random.default_rng()
    do_hflip = hflip and rng.random() < 0.5
    do_vflip = rotation and rng.random() < 0.5
    do_rot90 = rotation and rng.random() < 0.5

    def _augment(img: np.ndarray) -> np.ndarray:
        # SIMD path: cv2.flip/transpose write a contiguous result ~20x
        # faster than numpy's negative-stride copy (profiled on the
        # single-core host: 4.5 ms -> 0.3 ms per batch-8 collate).
        if copy and img.ndim == 3 and img.shape[2] in (1, 2, 3, 4):
            import cv2

            out = img
            code = None
            if do_hflip and do_vflip:
                code = -1
            elif do_hflip:
                code = 1
            elif do_vflip:
                code = 0
            if code is not None:
                out = cv2.flip(out, code)
            if do_rot90:
                out = cv2.transpose(out)
            if out is img:
                return np.ascontiguousarray(img)
            if out.ndim == 2:  # cv2 collapses trailing C=1
                out = out[:, :, None]
            return out
        if do_hflip:
            img = img[:, ::-1, ...]
        if do_vflip:
            img = img[::-1, :, ...]
        if do_rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img) if copy else img

    is_list = isinstance(imgs, list)
    out = [_augment(i) for i in imgs] if is_list else _augment(imgs)
    if return_status:
        return out, (do_hflip, do_vflip, do_rot90)
    return out
