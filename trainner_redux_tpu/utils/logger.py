"""Logging: root logger, per-iteration message logger, timers, tensorboard.

Re-creates the observability UX of the reference
(/root/reference/traiNNer/utils/logger.py: AvgTimer :25, MessageLogger :64,
tensorboard init :772-806, root logger :808-1054) on top of stdlib logging +
optional tensorboard, with JAX device/environment banners instead of CUDA.
"""

from __future__ import annotations

import datetime
import logging
import sys
import time
from typing import Any

initialized_loggers: set[str] = set()


class AvgTimer:
    """Sliding-window average timer (window=200 like the reference)."""

    def __init__(self, window: int = 200) -> None:
        self.window = window
        self.times: list[float] = []
        self.start_time = time.time()
        self.tic()

    def tic(self) -> None:
        self.start_time = time.time()

    def record(self, count: int = 1) -> None:
        """Record elapsed time since tic(); `count` > 1 splits it evenly
        (a steps_per_dispatch block reports per-step time)."""
        elapsed = (time.time() - self.start_time) / max(1, count)
        for _ in range(max(1, count)):
            self.times.append(elapsed)
        if len(self.times) > self.window:
            del self.times[: len(self.times) - self.window]
        self.tic()

    def get_current_time(self) -> float:
        return self.times[-1] if self.times else 0.0

    def get_avg_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0


def get_root_logger(
    logger_name: str = "trainner_redux_tpu",
    log_level: int = logging.INFO,
    log_file: str | None = None,
) -> logging.Logger:
    logger = logging.getLogger(logger_name)
    if logger_name in initialized_loggers:
        return logger

    fmt = logging.Formatter("%(asctime)s %(levelname)s: %(message)s", "%Y-%m-%d %H:%M:%S")
    stream = logging.StreamHandler(sys.stdout)
    stream.setFormatter(fmt)
    logger.addHandler(stream)
    logger.propagate = False

    from trainner_redux_tpu.utils.dist_util import is_master

    if not is_master():
        logger.setLevel(logging.ERROR)
    else:
        logger.setLevel(log_level)
        if log_file is not None:
            fh = logging.FileHandler(log_file, "a")
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    initialized_loggers.add(logger_name)
    return logger


def get_env_info() -> str:
    """Environment banner: versions + JAX device inventory."""
    import jax

    lines = [
        "\nEnvironment:",
        f"\tPython: {sys.version.split()[0]}",
        f"\tJAX: {jax.__version__}",
        f"\tBackend: {jax.default_backend()}",
        f"\tDevices: {[str(d) for d in jax.devices()]}",
        f"\tProcess: {jax.process_index()}/{jax.process_count()}",
    ]
    try:
        import flax
        import optax

        lines.insert(3, f"\tFlax: {flax.__version__}  Optax: {optax.__version__}")
    except Exception:
        pass
    return "\n".join(lines)


class MessageLogger:
    """Formats per-iteration training log lines and mirrors scalars to TB.

    Output format follows the reference logger.py:222-286:
    ``[name..][epoch, iter, lr] [perf: it/s] [eta: h:m] l_g_pix: ...``
    """

    def __init__(self, opt, start_iter: int = 1, tb_logger: Any = None) -> None:
        self.exp_name = opt.name
        log_opt = opt.logger
        assert log_opt is not None
        self.interval = log_opt.print_freq
        self.start_iter = start_iter
        self.max_iters = opt.train.total_iter if opt.train else 0
        self.use_tb_logger = log_opt.use_tb_logger
        self.tb_logger = tb_logger
        self.start_time = time.time()
        self.logger = get_root_logger()

    def reset_start_time(self) -> None:
        self.start_time = time.time()

    def __call__(self, log_vars: dict[str, Any]) -> None:
        epoch = log_vars.pop("epoch")
        current_iter = log_vars.pop("iter")
        lrs = log_vars.pop("lrs")
        time_sec_avg = log_vars.pop("time_sec_avg", 0.0)

        message = (
            f"[{self.exp_name[:31]}..][epoch:{epoch:3d}, iter:{current_iter:8,d}, "
            f"lr:({', '.join(f'{v:.3e}' for v in lrs)})] "
        )

        if time_sec_avg > 0:
            its = 1.0 / time_sec_avg
            eta_sec = time_sec_avg * (self.max_iters - current_iter)
            eta_str = str(datetime.timedelta(seconds=int(eta_sec)))
            message += f"[perf: {its:.3f} it/s] [eta: {eta_str}] "
            if self.tb_logger:
                self.tb_logger.add_scalar(
                    "performance/throughput_samples_per_sec",
                    log_vars.get("samples_per_sec", its),
                    current_iter,
                )
                self.tb_logger.add_scalar(
                    "performance/avg_iter_time_sec", time_sec_avg, current_iter
                )
        log_vars.pop("samples_per_sec", None)

        # HBM usage (reference logs CUDA VRAM, logger.py:448-470 / sr_model.py:1277)
        hbm = _hbm_usage_gb()
        if hbm is not None:
            message += f"[hbm: {hbm[0]:.2f}/{hbm[1]:.2f}G] "
            if self.tb_logger:
                self.tb_logger.add_scalar("performance/hbm_in_use_gb", hbm[0], current_iter)
                self.tb_logger.add_scalar("performance/hbm_peak_gb", hbm[1], current_iter)

        for k, v in log_vars.items():
            message += f"{k}: {v:.4e} "
            if self.tb_logger:
                if k.startswith(("grad_norm", "grad_")):
                    self.tb_logger.add_scalar(f"gradients/{k}", v, current_iter)
                elif k.startswith("l_"):
                    self.tb_logger.add_scalar(f"losses/{k}", v, current_iter)
                elif k.startswith("m_"):
                    self.tb_logger.add_scalar(f"metrics/{k}", v, current_iter)
                elif k.startswith(("lw_", "dls_")):
                    self.tb_logger.add_scalar(f"dynamic_loss_weights/{k}", v, current_iter)
                else:
                    self.tb_logger.add_scalar(k, v, current_iter)

        # loss-balance ratios (reference logger.py:357-447): the share each
        # weighted loss term contributes to the generator total
        total = log_vars.get("l_g_total")
        if total and abs(total) > 1e-12:
            parts = {
                k: v for k, v in log_vars.items()
                if k.startswith("l_g_") and k != "l_g_total" and isinstance(v, float)
            }
            if parts:
                ratios = {k: v / total for k, v in parts.items()}
                if self.tb_logger:
                    for k, r in ratios.items():
                        self.tb_logger.add_scalar(
                            f"loss_balance/{k}_ratio", r, current_iter
                        )
                dominant = max(ratios, key=lambda k: abs(ratios[k]))
                if abs(ratios[dominant]) > 0.95 and len(ratios) > 1:
                    message += f"[balance: {dominant} {ratios[dominant]:.0%}] "

        self.logger.info(message)


def _hbm_usage_gb() -> tuple[float, float] | None:
    """(bytes_in_use, peak_bytes_in_use) of device 0, in GiB; None on CPU."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if not stats or "bytes_in_use" not in stats:
            return None
        in_use = stats["bytes_in_use"] / 2**30
        peak = stats.get("peak_bytes_in_use", stats["bytes_in_use"]) / 2**30
        return in_use, peak
    except Exception:
        return None


def init_tb_logger(log_dir: str) -> Any:
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        try:
            from tensorboardX import SummaryWriter  # type: ignore
        except Exception:
            return None
    return SummaryWriter(log_dir=log_dir)


def init_wandb_logger(opt) -> None:
    """wandb is optional; warn-and-skip when unavailable (zero-egress envs)."""
    logger = get_root_logger()
    try:
        import wandb  # type: ignore
    except ImportError:
        logger.warning("wandb is not installed; skipping wandb logging")
        return
    log_opt = opt.logger
    assert log_opt is not None and log_opt.wandb is not None
    project = log_opt.wandb.project or "trainner_redux_tpu"
    resume_id = log_opt.wandb.resume_id
    kwargs = {"id": resume_id, "resume": "allow"} if resume_id else {}
    wandb.init(project=project, name=opt.name, config=None, **kwargs)
