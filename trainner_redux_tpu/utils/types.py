"""Shared type definitions (parity: reference traiNNer/utils/types.py)."""

from __future__ import annotations

from typing import Any, Literal, TypedDict

PixelFormat = Literal["rgb", "ycbcr", "yuv444", "gray"]


class DataFeed(TypedDict, total=False):
    """Batch dictionary flowing loader -> model (arrays are NHWC / clips NTHWC)."""

    lq: Any
    gt: Any
    kernel1: Any
    kernel2: Any
    sinc_kernel: Any
    paired_lq: Any
    paired_gt: Any
    lq_path: str | list[str]
    gt_path: str | list[str]


class TrainingStateMeta(TypedDict):
    """Sidecar metadata stored with orbax training states."""

    epoch: int
    iter: int
