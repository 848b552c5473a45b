"""Hardware probing (parity: /root/reference/traiNNer/utils/hardware_detection.py:25-600).

The reference probes CUDA GPUs (name, VRAM, compute capability); here we
probe the JAX device inventory (TPU generation, chip count, HBM per chip
from memory stats), host CPU/RAM, and derive the performance tier used by
zero-config training.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass
class DeviceInfo:
    platform: str
    device_kind: str
    num_devices: int
    num_hosts: int
    hbm_bytes_per_device: int | None
    host_cpus: int
    host_ram_bytes: int


# rough HBM capacities per chip for known TPU generations
_KNOWN_HBM = {
    "v2": 8 << 30,
    "v3": 16 << 30,
    "v4": 32 << 30,
    "v5 lite": 16 << 30,
    "v5e": 16 << 30,
    "v5p": 95 << 30,
    "v6e": 32 << 30,
}


class HardwareDetector:
    def __init__(self) -> None:
        self._info: DeviceInfo | None = None

    def detect(self) -> DeviceInfo:
        if self._info is not None:
            return self._info
        import jax

        devs = jax.devices()
        kind = devs[0].device_kind if devs else "cpu"
        hbm = None
        try:
            stats = devs[0].memory_stats()
            if stats and stats.get("bytes_limit"):
                hbm = int(stats["bytes_limit"])
        except Exception:
            pass
        if hbm is None:
            for key, cap in _KNOWN_HBM.items():
                if key in kind.lower():
                    hbm = cap
                    break

        ram = None
        try:
            with open("/proc/meminfo") as f:
                for line in f:
                    if line.startswith("MemTotal"):
                        ram = int(line.split()[1]) * 1024
                        break
        except OSError:
            pass

        self._info = DeviceInfo(
            platform=jax.default_backend(),
            device_kind=kind,
            num_devices=len(devs),
            num_hosts=jax.process_count(),
            hbm_bytes_per_device=hbm,
            host_cpus=os.cpu_count() or 1,
            host_ram_bytes=ram or 0,
        )
        return self._info

    def performance_tier(self) -> str:
        """'high' | 'medium' | 'low' — drives zero-config preset choice."""
        info = self.detect()
        if info.platform == "tpu":
            hbm = info.hbm_bytes_per_device or 0
            total = hbm * info.num_devices
            if total >= 64 << 30:
                return "high"
            if total >= 16 << 30:
                return "medium"
            return "low"
        return "low"

    def recommended_workers(self) -> int:
        return max(1, min(8, (self.detect().host_cpus or 1) - 1))
