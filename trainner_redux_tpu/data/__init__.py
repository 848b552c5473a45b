"""Data layer: dataset auto-registration, build_dataset / build_dataloader.

Parity: /root/reference/traiNNer/data/__init__.py:25-165. Every
`*_dataset.py` module is scanned and imported at package load; dataloaders
are the threaded prefetching loaders from `loader.py` with per-host sampling
via EnlargedSampler.
"""

from __future__ import annotations

import importlib
from os import path as osp

from trainner_redux_tpu.data.data_sampler import EnlargedSampler, resolve_enlarge_ratio
from trainner_redux_tpu.data.device_cache import DeviceCacheFeeder
from trainner_redux_tpu.data.loader import DataLoader, DevicePrefetcher
from trainner_redux_tpu.utils.misc import scandir
from trainner_redux_tpu.utils.redux_options import DatasetOptions
from trainner_redux_tpu.utils.registry import DATASET_REGISTRY

__all__ = [
    "build_dataset",
    "build_dataloader",
    "DataLoader",
    "DeviceCacheFeeder",
    "DevicePrefetcher",
    "EnlargedSampler",
]

data_folder = osp.dirname(osp.abspath(__file__))
dataset_filenames = [
    osp.splitext(osp.basename(v))[0] for v in scandir(data_folder, suffix="_dataset.py")
]
_dataset_modules = [
    importlib.import_module(f"trainner_redux_tpu.data.{f}") for f in dataset_filenames
]


def build_dataset(dataset_opt: DatasetOptions):
    dataset = DATASET_REGISTRY.get(dataset_opt.type)(dataset_opt)
    return dataset


def build_dataloader(
    dataset,
    dataset_opt: DatasetOptions,
    num_gpu: int = 1,
    dist: bool = False,
    sampler: EnlargedSampler | None = None,
    seed: int | None = None,
) -> DataLoader:
    """Phase-aware loader assembly (train: batched/shuffled/drop_last;
    val/test: batch 1, sequential) mirroring reference data/__init__.py:60-165.

    On TPU, `num_gpu` multiplies the per-device batch into the host-local
    batch (a single process feeds all local chips through the sharded step).
    """
    phase = dataset_opt.phase
    if phase == "train":
        batch_size = (dataset_opt.batch_size_per_gpu or 4) * max(1, num_gpu)
        num_workers = dataset_opt.num_worker_per_gpu or 4
        # torch DataLoader compat knobs (reference data/__init__.py:122-147):
        # prefetch_factor maps onto the ready-batch queue depth when
        # num_prefetch_queue is unset; pin_memory and persistent_workers are
        # satisfied by construction here (XLA stages H2D from pinned buffers,
        # the decode pool persists across epochs); prefetch_mode's cpu/cuda
        # split is subsumed by the always-on DevicePrefetcher in train.py.
        prefetch_batches = (
            dataset_opt.num_prefetch_queue
            or dataset_opt.prefetch_factor
            or 2
        )
        if dataset_opt.prefetch_mode not in (None, "cpu", "cuda"):
            from trainner_redux_tpu.utils.logger import get_root_logger

            logger = get_root_logger()
            logger.warning(
                "prefetch_mode=%s is unknown; using the device prefetcher",
                dataset_opt.prefetch_mode,
            )
        return DataLoader(
            dataset,
            batch_size=batch_size,
            sampler=sampler,
            shuffle=sampler is None,
            num_workers=num_workers,
            drop_last=True,
            prefetch_batches=prefetch_batches,
            seed=seed or 0,
        )
    return DataLoader(
        dataset,
        batch_size=1,
        shuffle=False,
        num_workers=dataset_opt.num_worker_per_gpu or 1,
        drop_last=False,
    )
