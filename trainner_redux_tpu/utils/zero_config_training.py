"""Zero-config training preset generation.

Parity: /root/reference/traiNNer/utils/zero_config_training.py:28-460 —
combines hardware detection, dataset analysis and the official per-arch
settings into a ready-to-run ReduxOptions tree from just (arch, scale,
dataset paths).
"""

from __future__ import annotations

from typing import Any

from trainner_redux_tpu.archs.arch_info import official_settings
from trainner_redux_tpu.utils.dataset_analyzer import DatasetAnalyzer
from trainner_redux_tpu.utils.hardware_detection import HardwareDetector
from trainner_redux_tpu.utils.redux_options import ReduxOptions
from trainner_redux_tpu.utils.schema import decode


class ZeroConfigTrainingManager:
    def __init__(self) -> None:
        self.hardware = HardwareDetector()
        self.analyzer = DatasetAnalyzer()

    def generate(
        self,
        arch: str,
        scale: int,
        dataroot_gt: str,
        dataroot_lq: str | None = None,
        name: str | None = None,
    ) -> ReduxOptions:
        hw = self.hardware.detect()
        tier = self.hardware.performance_tier()
        analysis = self.analyzer.analyze_folder(dataroot_gt)
        settings = official_settings(arch)

        batch = settings["batch"]
        if tier == "low":
            batch = max(4, batch // 4)
        elif tier == "medium":
            batch = max(8, batch // 2)
        lq_size = analysis.recommended_lq_size

        otf = dataroot_lq is None
        cfg: dict[str, Any] = {
            "name": name or f"{scale}x_{arch}_zeroconfig",
            "scale": scale,
            "num_gpu": hw.num_devices,
            "compute_dtype": "bfloat16" if hw.platform == "tpu" else "float32",
            "high_order_degradation": otf,
            "datasets": {
                "train": {
                    "name": "train",
                    "type": "realesrgandataset" if otf else "pairedimagedataset",
                    "dataroot_gt": dataroot_gt,
                    **({} if otf else {"dataroot_lq": dataroot_lq}),
                    **({"gt_size": lq_size * scale} if otf else {"lq_size": lq_size}),
                    "batch_size_per_gpu": batch,
                    "num_worker_per_gpu": self.hardware.recommended_workers(),
                }
            },
            "network_g": {"type": arch},
            "train": {
                "total_iter": settings["total_iter"],
                "ema_decay": settings.get("ema_decay", 0.999),
                "optim_g": {"type": "AdamW", "lr": settings["lr"], "betas": [0.9, 0.99]},
                "scheduler": settings.get(
                    "scheduler",
                    {
                        "type": "MultiStepLR",
                        "milestones": [settings["total_iter"] // 2],
                        "gamma": 0.5,
                    },
                ),
                "losses": [
                    {"type": "l1loss", "loss_weight": 1.0},
                    {"type": "mssimloss", "loss_weight": 1.0},
                ],
                # derive loss-scheduler hyperparameters from the arch size
                # class / run length (dynamic_loss_scheduling auto-calibration)
                "dynamic_loss_scheduling": {"enabled": True, "auto_calibrate": True},
                # train.py's AOT HBM preflight compiles the real step and
                # downshifts (batch, lq_size) BEFORE the run if it won't fit
                "training_automations": {
                    "dynamic_batch_patch_optimizer": {"enabled": True}
                },
            },
            "val": {"val_enabled": False, "save_img": False},
            "logger": {
                "print_freq": 100,
                "save_checkpoint_freq": 5000,
                "use_tb_logger": True,
            },
            "path": {},
        }
        return decode(cfg, ReduxOptions)
