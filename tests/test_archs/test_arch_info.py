"""Metadata consistency (parity: reference tests/test_archs/test_arch_info.py):
every name in the metadata tables must exist in a registry."""

from trainner_redux_tpu.archs import ARCH_REGISTRY, SPANDREL_REGISTRY
from trainner_redux_tpu.archs.arch_info import (
    ALL_ARCHS,
    ARCHS_FP32_SOFTMAX,
    OFFICIAL_METRICS,
    OFFICIAL_SETTINGS_FROMSCRATCH,
    VSR_ARCHS,
    official_settings,
)


def _known(name: str) -> bool:
    return name in ARCH_REGISTRY or name in SPANDREL_REGISTRY


def test_all_archs_registered():
    missing = [
        n for arch in ALL_ARCHS for n in arch["names"] if not _known(n)
    ]
    assert not missing, f"ALL_ARCHS entries not in any registry: {missing}"


def test_official_metrics_names():
    # keys may carry variant qualifiers ("esrgan use_pixel_unshuffle=True");
    # "cfsr" is a metrics-only record in the reference (no shipped arch)
    missing = [
        n for n in OFFICIAL_METRICS
        if not _known(n.split()[0]) and n != "cfsr"
    ]
    assert not missing, f"OFFICIAL_METRICS names not registered: {missing}"


def test_policy_tables_resolve():
    for n in VSR_ARCHS:
        assert _known(n), n
    # fp32-softmax table may reference not-yet-ported archs; at least half must exist
    known = [n for n in ARCHS_FP32_SOFTMAX if _known(n)]
    assert len(known) >= len(ARCHS_FP32_SOFTMAX) // 2


def test_official_settings_lookup():
    s = official_settings("swinir_m")
    assert s["lr"] == 2e-4
    d = official_settings("some_unknown_arch")
    assert d == official_settings("default") or d["lr"] == OFFICIAL_SETTINGS_FROMSCRATCH["default"]["lr"]
