"""Loss registry: auto-registration + build_loss.

Mirrors /root/reference/traiNNer/losses/__init__.py:55-110: `*_loss.py`
modules are scanned and imported, `build_loss` resolves {'type': ...},
rewrites ganloss+gan_type=r3gan to r3ganloss, and wraps losses carrying
schedule params (start_iter/target_iter/...) in IterativeLossWrapper.
"""

from __future__ import annotations

import importlib
from os import path as osp
from typing import Any

from trainner_redux_tpu.losses.iterative_loss_wrapper import IterativeLossWrapper
from trainner_redux_tpu.utils.misc import scandir
from trainner_redux_tpu.utils.registry import LOSS_REGISTRY

__all__ = ["build_loss", "LOSS_REGISTRY", "IterativeLossWrapper"]

loss_folder = osp.dirname(osp.abspath(__file__))
loss_filenames = [
    osp.splitext(osp.basename(v))[0] for v in scandir(loss_folder, suffix="_loss.py")
]
_loss_modules = [
    importlib.import_module(f"trainner_redux_tpu.losses.{f}") for f in loss_filenames
]
import trainner_redux_tpu.losses.loss_wrapper  # noqa: E402,F401 (ModelAsLoss + gated towers)

SCHEDULE_PARAMS = (
    "start_iter",
    "target_iter",
    "target_weight",
    "disable_after",
    "schedule_type",
    "warn_on_unused",
    "loss_decay",
    "loss_decay_inflection",
)


def build_loss(loss_opt: dict[str, Any]):
    opt = dict(loss_opt)
    loss_type = opt.pop("type")

    if loss_type.lower() == "ganloss" and str(opt.get("gan_type", "")).lower() == "r3gan":
        loss_type = "r3ganloss"
        opt.pop("gan_type", None)

    schedule_config = {p: opt.pop(p) for p in SCHEDULE_PARAMS if p in opt}

    loss = LOSS_REGISTRY.get(loss_type)(**opt)

    if schedule_config:
        loss = IterativeLossWrapper(
            loss, loss_weight=getattr(loss, "loss_weight", 1.0), **schedule_config
        )
    return loss


def loss_log_key(loss, loss_type: str | None = None) -> str:
    """Tensorboard/console key for a loss instance, e.g. 'l_g_l1loss'."""
    inner = loss.loss_module if isinstance(loss, IterativeLossWrapper) else loss
    name = (loss_type or type(inner).__name__).lower()
    name = name.removesuffix("loss")
    return f"l_g_{name}"
