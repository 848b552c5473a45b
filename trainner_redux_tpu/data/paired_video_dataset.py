"""Paired video dataset: scene-grouped frames, sliding clip windows.

Parity: /root/reference/traiNNer/data/paired_video_dataset.py:17-180 —
scenes are grouped by filename prefix (before the first '_'), each sample is
a `clip_size`-frame window with one shared crop/flip/rot across the clip;
output clips are (T, H, W, C) float32.
"""

from __future__ import annotations

import os
from os import path as osp

import numpy as np

from trainner_redux_tpu.utils.img_util import imfrombytes, mod_crop
from trainner_redux_tpu.utils.file_client import FileClient
from trainner_redux_tpu.utils.redux_options import DatasetOptions
from trainner_redux_tpu.utils.registry import DATASET_REGISTRY
from trainner_redux_tpu.utils.rng import worker_rng


@DATASET_REGISTRY.register()
class PairedVideoDataset:
    def __init__(self, opt: DatasetOptions) -> None:
        assert opt.dataroot_lq and opt.dataroot_gt and opt.clip_size
        self.opt = opt
        self.clip_size = int(opt.clip_size)
        self.file_client = FileClient("disk")
        self.frames: dict[str, list[tuple[str, str]]] = {}
        for i, lq_root in enumerate(opt.dataroot_lq):
            gt_root = opt.dataroot_gt[i]
            for f in sorted(os.listdir(lq_root)):
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
                    scene = f"{lq_root}_{f.split('_')[0]}"
                    lq_path = osp.join(lq_root, f)
                    gt_path = osp.join(gt_root, f)
                    if osp.exists(gt_path):
                        self.frames.setdefault(scene, []).append((lq_path, gt_path))
        self.index_mapping: list[tuple[str, int]] = []
        for scene, clips in self.frames.items():
            for start in range(max(len(clips) - self.clip_size + 1, 0)):
                self.index_mapping.append((scene, start))
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        return len(self.index_mapping)

    def __getitem__(self, idx: int) -> dict:
        opt = self.opt
        scale = opt.scale or 1
        # idx may be virtual (EnlargedSampler); rng below keeps the virtual
        # value so repeated visits draw different crops
        scene, start = self.index_mapping[idx % len(self.index_mapping)]
        clip = self.frames[scene][start : start + self.clip_size]

        try:
            from trainner_redux_tpu.utils.config import Config

            seed = Config.get_manual_seed() or 0
        except RuntimeError:
            seed = 0
        rng = worker_rng(seed, 2, idx, self._epoch)

        lqs, gts = [], []
        crop = None
        flips = None
        # train clips stay uint8 end-to-end (4x less H2D; normalized
        # on-chip by _dev_to_float); eval keeps float32 for the bucketed
        # validation contract
        as_float = opt.phase != "train"
        for lq_path, gt_path in clip:
            lq = imfrombytes(self.file_client.get(lq_path), float32=as_float)
            gt = imfrombytes(self.file_client.get(gt_path), float32=as_float)
            if opt.phase == "train":
                lq_size = (opt.lq_size or (opt.gt_size or 0) // scale) or 64
                if flips is None:
                    flips = (rng.random() < 0.5, rng.random() < 0.5, rng.random() < 0.5)
                hflip, vflip, rot90 = flips
                if opt.use_hflip and hflip:
                    lq, gt = lq[:, ::-1], gt[:, ::-1]
                if opt.use_rot and vflip:
                    lq, gt = lq[::-1], gt[::-1]
                if opt.use_rot and rot90:
                    lq, gt = lq.transpose(1, 0, 2), gt.transpose(1, 0, 2)
                if crop is None:
                    top = int(rng.integers(0, lq.shape[0] - lq_size + 1))
                    left = int(rng.integers(0, lq.shape[1] - lq_size + 1))
                    crop = (top, left, lq_size)
                top, left, lq_size = crop
                lq = lq[top : top + lq_size, left : left + lq_size]
                gt = gt[
                    top * scale : (top + lq_size) * scale,
                    left * scale : (left + lq_size) * scale,
                ]
            else:
                gt = mod_crop(gt, scale)
                gt = gt[: lq.shape[0] * scale, : lq.shape[1] * scale]
            lqs.append(np.ascontiguousarray(lq))
            gts.append(np.ascontiguousarray(gt))

        center = self.clip_size // 2
        out_dtype = np.float32 if as_float else lqs[0].dtype
        return {
            "lq": np.stack(lqs, axis=0).astype(out_dtype),  # (T, H, W, C)
            "gt": gts[center].astype(out_dtype),  # center frame target
            "lq_path": clip[center][0],
            "gt_path": clip[center][1],
        }


@DATASET_REGISTRY.register()
class SingleVideoDataset:
    """LQ-only sliding-window clips for video inference
    (parity: reference single_video_dataset.py)."""

    def __init__(self, opt: DatasetOptions) -> None:
        assert opt.dataroot_lq and opt.clip_size
        self.opt = opt
        self.clip_size = int(opt.clip_size)
        self.file_client = FileClient("disk")
        self.frames: dict[str, list[str]] = {}
        for lq_root in opt.dataroot_lq:
            for f in sorted(os.listdir(lq_root)):
                if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
                    scene = f"{lq_root}_{f.split('_')[0]}"
                    self.frames.setdefault(scene, []).append(osp.join(lq_root, f))
        self.index_mapping = [
            (scene, start)
            for scene, fs in self.frames.items()
            for start in range(max(len(fs) - self.clip_size + 1, 0))
        ]

    def __len__(self) -> int:
        return len(self.index_mapping)

    def __getitem__(self, idx: int) -> dict:
        scene, start = self.index_mapping[idx]
        paths = self.frames[scene][start : start + self.clip_size]
        lqs = [imfrombytes(self.file_client.get(p), float32=True) for p in paths]
        center = self.clip_size // 2
        return {
            "lq": np.stack(lqs, axis=0).astype(np.float32),
            "lq_path": paths[center],
        }
