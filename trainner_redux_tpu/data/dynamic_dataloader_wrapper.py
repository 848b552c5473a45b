"""Runtime batch/patch-size adjustment wrappers.

Parity: /root/reference/traiNNer/data/dynamic_dataloader_wrapper.py (470
LoC): the torch version mutates batch/crop sizes at arbitrary values during
training (OOM recovery). XLA is static-shape, so the TPU-native wrappers
constrain adjustments to a **bucket ladder** (powers of two): each distinct
(batch, lq_size) bucket compiles once and stays cached, so a downshift costs
one compile instead of an unbounded recompile stream.
"""

from __future__ import annotations

from typing import Any


class DynamicDatasetWrapper:
    """Wraps a dataset whose opt carries lq_size/gt_size; set_lq_size snaps
    to the bucket ladder."""

    BUCKETS = (16, 24, 32, 48, 64, 96, 128, 192, 256)

    def __init__(self, dataset) -> None:
        self.dataset = dataset
        self._scale = dataset.opt.scale or 1

    @classmethod
    def snap(cls, size: int) -> int:
        return max(b for b in cls.BUCKETS if b <= max(size, cls.BUCKETS[0]))

    def set_lq_size(self, lq_size: int) -> int:
        snapped = self.snap(lq_size)
        self.dataset.opt.lq_size = snapped
        if self.dataset.opt.gt_size:
            self.dataset.opt.gt_size = snapped * self._scale
        return snapped

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> Any:
        return self.dataset[idx]

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __getattr__(self, name: str) -> Any:
        return getattr(self.dataset, name)


class DynamicDataLoaderWrapper:
    """Wraps a DataLoader; batch-size changes snap to powers of two and take
    effect at the next epoch boundary (iterators in flight are unaffected)."""

    def __init__(self, loader) -> None:
        self.loader = loader

    @staticmethod
    def snap_batch(b: int) -> int:
        p = 1
        while p * 2 <= b:
            p *= 2
        return p

    def set_batch_size(self, batch_size: int) -> int:
        snapped = self.snap_batch(max(1, batch_size))
        self.loader.batch_size = snapped
        return snapped

    def __iter__(self):
        return iter(self.loader)

    def __len__(self) -> int:
        return len(self.loader)

    def __getattr__(self, name: str) -> Any:
        return getattr(self.loader, name)
