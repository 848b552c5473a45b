"""Architecture zoo: auto-registration + build_network.

Mirrors the registration contract of the reference
(/root/reference/traiNNer/archs/__init__.py:17-66): every `*_arch.py` module
in this package is imported at package load, registering its factories into
SPANDREL_REGISTRY (PyTorch-checkpoint-compatible factories) / ARCH_REGISTRY /
TESTARCH_REGISTRY. `build_network` resolves `{'type': name, **kwargs}`.
"""

from __future__ import annotations

import importlib
from os import path as osp
from typing import Any

from trainner_redux_tpu.utils.misc import scandir
from trainner_redux_tpu.utils.registry import (
    ARCH_REGISTRY,
    SPANDREL_REGISTRY,
    TESTARCH_REGISTRY,
)

__all__ = ["build_network", "ARCH_REGISTRY", "SPANDREL_REGISTRY", "TESTARCH_REGISTRY"]

arch_folder = osp.dirname(osp.abspath(__file__))
arch_filenames = [
    osp.splitext(osp.basename(v))[0]
    for v in scandir(arch_folder, suffix="_arch.py")
]
_arch_modules = [
    importlib.import_module(f"trainner_redux_tpu.archs.{f}") for f in arch_filenames
]


def build_network(opt: dict[str, Any]):
    """Instantiate a network module from an options dict ({'type': ..., **kwargs}).

    Resolution order matches the reference: SPANDREL_REGISTRY ->
    ARCH_REGISTRY -> TESTARCH_REGISTRY. The model layer injects `scale` into
    the opts (as the reference does at sr_model.py:60). Returns an
    (uninitialized) flax module; parameter init happens in the model layer
    with an explicit PRNG key and input shape.
    """
    opt = dict(opt)
    network_type = opt.pop("type")

    factory = SPANDREL_REGISTRY.get_optional(network_type)
    if factory is not None:
        return factory(**opt)
    cls = ARCH_REGISTRY.get_optional(network_type) or TESTARCH_REGISTRY.get_optional(
        network_type
    )
    if cls is None:
        raise KeyError(
            f"Network type '{network_type}' not found in any registry. "
            f"Known: {sorted(set(SPANDREL_REGISTRY.keys()) | set(ARCH_REGISTRY.keys()))}"
        )
    return cls(**opt)


def build_network_cast(opt: dict[str, Any], dtype):
    """build_network with the model's compute dtype injected (the AMP
    analogue: the reference trains under torch.autocast bf16,
    /root/reference/traiNNer/models/base_model.py amp plumbing). Every flax
    arch exposes a `dtype` field for its compute precision (params stay
    fp32 via explicit param_dtype); factories that reject unknown kwargs
    fall back to their default dtype rather than failing."""
    if dtype is None or "dtype" in opt:
        return build_network(opt)
    try:
        return build_network({**opt, "dtype": dtype})
    except TypeError:
        return build_network(opt)
