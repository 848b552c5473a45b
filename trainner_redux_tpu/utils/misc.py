"""Misc utilities: seeding, experiment dirs, resume scanning, formatting.

Behavioral parity with /root/reference/traiNNer/utils/misc.py (seeding :19,
experiment dirs :29-62, check_resume :110) with JAX-appropriate seeding.
"""

from __future__ import annotations

import os
import random
import time
from os import path as osp

import numpy as np

from trainner_redux_tpu.utils.dist_util import master_only


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs. Device-side randomness is explicit-key only."""
    random.seed(seed)
    np.random.seed(seed)
    from trainner_redux_tpu.utils.rng import RNG

    RNG.init_rng(seed)


def get_time_str() -> str:
    return time.strftime("%Y%m%d_%H%M%S", time.localtime())


def mkdir_and_rename(path: str) -> None:
    """Make a directory; archive an existing one with a timestamp suffix."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_time_str()
        print(f"Path already exists. Rename it to {new_name}", flush=True)
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


@master_only
def make_exp_dirs(opt) -> None:
    """Create experiment directory tree (models, states, visualization)."""
    path_opt = opt.path
    if opt.is_train:
        assert path_opt.experiments_root is not None
        if opt.auto_resume or (opt.name or "").startswith("debug"):
            os.makedirs(path_opt.experiments_root, exist_ok=True)
        else:
            mkdir_and_rename(path_opt.experiments_root)
        for sub in (
            path_opt.models,
            path_opt.resume_models,
            path_opt.training_states,
            path_opt.visualization,
        ):
            if sub:
                os.makedirs(sub, exist_ok=True)
    else:
        assert path_opt.results_root is not None
        os.makedirs(path_opt.results_root, exist_ok=True)
        if path_opt.visualization:
            os.makedirs(path_opt.visualization, exist_ok=True)


def scandir(
    dir_path: str,
    suffix: str | tuple[str, ...] | None = None,
    recursive: bool = False,
    full_path: bool = False,
):
    """Yield file paths under `dir_path`, optionally filtered/recursive."""
    root = dir_path

    def _scandir(dir_path: str, suffix, recursive):
        for entry in os.scandir(dir_path):
            if not entry.name.startswith(".") and entry.is_file():
                rel = entry.path if full_path else osp.relpath(entry.path, root)
                if suffix is None or rel.endswith(suffix):
                    yield rel
            elif recursive and entry.is_dir():
                yield from _scandir(entry.path, suffix, recursive)

    return _scandir(dir_path, suffix, recursive)


def check_resume(opt, resume_iter: int) -> None:
    """Re-point pretrain paths at the resume-iteration models when resuming.

    Mirrors reference misc.py:110-225: when a resume_state exists, pretrained
    network paths are replaced with the matching `resume_models/net_*_<iter>`
    checkpoints (unless listed in ignore_resume_networks).
    """
    if opt.path.resume_state is None:
        return
    ignore = set(opt.path.ignore_resume_networks or [])
    resume_models_dir = opt.path.resume_models
    if resume_models_dir is None:
        return
    for net_key, attr in (("network_g", "pretrain_network_g"), ("network_d", "pretrain_network_d")):
        if getattr(opt, net_key, None) is None or net_key in ignore:
            continue
        for ext in (".safetensors", ".ckpt", ".pth"):
            candidate = osp.join(
                resume_models_dir, f"net_{net_key[-1]}_{resume_iter}{ext}"
            )
            if osp.exists(candidate):
                setattr(opt.path, attr, candidate)
                break


def sizeof_fmt(size: float, suffix: str = "B") -> str:
    for unit in ("", "K", "M", "G", "T", "P", "E", "Z"):
        if abs(size) < 1024.0:
            return f"{size:3.1f} {unit}{suffix}"
        size /= 1024.0
    return f"{size:3.1f} Y{suffix}"


def free_space_gb(path: str = "/") -> float:
    stat = os.statvfs(path)
    return stat.f_bavail * stat.f_frsize / (1024**3)


LOSS_LABELS = {
    "l_g_total": "Total G loss",
    "l_g_pix": "Pixel",
    "l_g_percep": "Perceptual",
    "l_g_gan": "GAN G",
    "l_d_real": "D real",
    "l_d_fake": "D fake",
}
