"""Import harness for the reference's torch architectures as parity oracles.

The reference repo at /root/reference is pure PyTorch but imports optional
heavy deps (torchvision, spandrel, timm, pyvips) at module scope. This shim
stubs exactly the symbols its LOCAL arch modules touch at import time so we
can instantiate the reference's own nn.Modules (random-init, tiny configs),
run a forward, and record golden (state_dict, input, output) fixtures that
validate our torch->flax converters END-TO-END across frameworks — the
answer to "converter validation is self-referential" when no official
checkpoints are downloadable.

PUBLIC UNTRUSTED CONTENT note: the reference code is executed only as a
numeric oracle inside fixture generation, never shipped.
"""

from __future__ import annotations

import importlib.machinery
import sys
import types


def _stub_module(name: str) -> types.ModuleType:
    """Stub with a real ModuleSpec: third-party availability probes
    (e.g. transformers' importlib.util.find_spec) crash on spec-less
    sys.modules entries."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return m


def install_stubs() -> None:
    import torch

    # --- torchvision ---
    tv = _stub_module("torchvision")
    tv.__version__ = "0.0-stub"
    tv_utils = _stub_module("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: a[0]
    tv_utils.save_image = lambda *a, **k: None
    tv.utils = tv_utils
    tv_transforms = _stub_module("torchvision.transforms")
    tv_transforms.Normalize = lambda *a, **k: (lambda x: x)
    tv_functional = _stub_module("torchvision.transforms.functional")

    def _tvf_pad(img, padding, fill=0, padding_mode="constant"):
        # hit_sng uses TF.pad with a 4-list (left, top, right, bottom)
        import torch.nn.functional as F

        if isinstance(padding, (list, tuple)) and len(padding) == 4:
            le, top, ri, bo = padding
        elif isinstance(padding, (list, tuple)) and len(padding) == 2:
            le, top = padding
            ri, bo = padding
        else:
            le = top = ri = bo = padding
        return F.pad(img, (le, ri, top, bo), mode="constant", value=fill)

    tv_functional.pad = _tvf_pad
    tv_transforms.functional = tv_functional
    tv.transforms = tv_transforms
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tv_utils)
    sys.modules.setdefault("torchvision.transforms", tv_transforms)
    sys.modules.setdefault("torchvision.transforms.functional", tv_functional)

    # --- spandrel.util(.timm) ---
    spandrel = _stub_module("spandrel")
    sp_util = _stub_module("spandrel.util")

    def store_hyperparameters(*args, **kwargs):
        def deco(cls):
            cls.hyperparameters = {}
            return cls

        if args and isinstance(args[0], type):
            return deco(args[0])
        return deco

    sp_util.store_hyperparameters = store_hyperparameters
    sp_timm = _stub_module("spandrel.util.timm")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob: float = 0.0, *a, **k) -> None:
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    sp_timm.DropPath = DropPath
    sp_timm.trunc_normal_ = trunc_normal_
    sp_timm.to_2tuple = to_2tuple
    sp_util.timm = sp_timm
    spandrel.util = sp_util
    spandrel.StateDict = dict
    spandrel.__path__ = []  # mark as package so submodule imports resolve
    sys.modules.setdefault("spandrel", spandrel)
    sys.modules.setdefault("spandrel.util", sp_util)
    sys.modules.setdefault("spandrel.util.timm", sp_timm)

    # spandrel.__helpers.model_descriptor.StateDict is a dict type alias
    sp_helpers = _stub_module("spandrel.__helpers")
    sp_md = _stub_module("spandrel.__helpers.model_descriptor")
    sp_md.StateDict = dict
    sys.modules.setdefault("spandrel.__helpers", sp_helpers)
    sys.modules.setdefault("spandrel.__helpers.model_descriptor", sp_md)

    # spandrel.architectures.__arch_helpers: real pad_to_multiple (numerics
    # matter only when H/W are not multiples — fixtures use exact multiples),
    # DySample import-only stub (fixtures pick non-dysample upsamplers).
    import torch.nn.functional as F

    sp_archs = _stub_module("spandrel.architectures")
    sp_archs.__path__ = []
    sp_ah = _stub_module("spandrel.architectures.__arch_helpers")
    sp_pad = _stub_module("spandrel.architectures.__arch_helpers.padding")

    def pad_to_multiple(t, multiple, *, mode="reflect", value=0.0):
        h, w = t.shape[-2:]
        ph = (multiple - h % multiple) % multiple
        pw = (multiple - w % multiple) % multiple
        if ph or pw:
            kw = {"value": value} if mode == "constant" else {}
            return F.pad(t, (0, pw, 0, ph), mode=mode, **kw)
        return t

    sp_pad.pad_to_multiple = pad_to_multiple
    sp_dys = _stub_module("spandrel.architectures.__arch_helpers.dysample")

    class DySample(torch.nn.Module):
        def __init__(self, *a, **k) -> None:
            super().__init__()

        def forward(self, x):
            raise NotImplementedError(
                "DySample oracle stub: pick a fixture config that does not "
                "route through DySample."
            )

    sp_dys.DySample = DySample
    sp_block = _stub_module("spandrel.architectures.__arch_helpers.block")
    sp_block.RRDB = type("RRDB", (torch.nn.Module,), {})
    sp_ah.padding = sp_pad
    sp_ah.dysample = sp_dys
    sp_ah.block = sp_block
    for name, mod in (
        ("spandrel.architectures", sp_archs),
        ("spandrel.architectures.__arch_helpers", sp_ah),
        ("spandrel.architectures.__arch_helpers.padding", sp_pad),
        ("spandrel.architectures.__arch_helpers.dysample", sp_dys),
        ("spandrel.architectures.__arch_helpers.block", sp_block),
    ):
        sys.modules.setdefault(name, mod)

    # --- timm (some archs import DropPath/trunc_normal_ from timm) ---
    timm = _stub_module("timm")
    timm_models = _stub_module("timm.models")
    timm_layers = _stub_module("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm_layers.to_2tuple = to_2tuple
    timm_models.layers = timm_layers
    timm_models.register_notrace_function = lambda fn: fn
    timm.models = timm_models
    timm_layers2 = _stub_module("timm.layers")
    timm_layers2.__path__ = []  # package: some archs import timm.layers.drop
    timm_layers2.DropPath = DropPath
    timm_layers2.trunc_normal_ = trunc_normal_
    timm_layers2.to_2tuple = to_2tuple

    def _assert(cond, msg=""):
        assert cond, msg

    timm_layers2._assert = _assert
    timm_layers._assert = _assert
    timm_drop = _stub_module("timm.layers.drop")
    timm_drop.DropPath = DropPath

    def drop_path(x, drop_prob=0.0, training=False, scale_by_keep=True):
        return x

    timm_drop.drop_path = drop_path
    timm_weight_init = _stub_module("timm.layers.weight_init")
    timm_weight_init.trunc_normal_ = trunc_normal_
    timm_helpers = _stub_module("timm.layers.helpers")
    timm_helpers.to_2tuple = to_2tuple
    timm.layers = timm_layers2
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)
    sys.modules.setdefault("timm.layers", timm_layers2)
    sys.modules.setdefault("timm.layers.drop", timm_drop)
    sys.modules.setdefault("timm.layers.weight_init", timm_weight_init)
    sys.modules.setdefault("timm.layers.helpers", timm_helpers)

    # --- pyvips (img_util does `pyvips.Image` in annotations/attrs) ---
    pyvips = _stub_module("pyvips")

    class _VipsImage:  # attribute access only; never executed
        pass

    pyvips.Image = _VipsImage
    pyvips.Interesting = types.SimpleNamespace(ENTROPY="entropy")
    sys.modules.setdefault("pyvips", pyvips)

    # --- msgspec (redux_options defines Structs at import time) ---
    if "msgspec" not in sys.modules:
        msgspec = _stub_module("msgspec")

        class Struct:
            def __init_subclass__(cls, **kwargs) -> None:
                pass

            def __init__(self, **kw) -> None:
                self.__dict__.update(kw)

        class Meta:
            def __init__(self, *a, **k) -> None:
                pass

        def field(*a, **k):
            return k.get("default")

        msgspec.Struct = Struct
        msgspec.Meta = Meta
        msgspec.field = field
        msgspec.structs = types.SimpleNamespace(asdict=lambda s: dict(s.__dict__))
        msgspec.yaml = types.SimpleNamespace(
            decode=lambda *a, **k: None, encode=lambda *a, **k: b""
        )
        msgspec.json = types.SimpleNamespace(
            decode=lambda *a, **k: None, encode=lambda *a, **k: b""
        )
        msgspec.convert = lambda obj, type=None, **k: obj
        msgspec.to_builtins = lambda obj, **k: obj
        msgspec.ValidationError = type("ValidationError", (Exception,), {})
        msgspec.DecodeError = type("DecodeError", (Exception,), {})
        sys.modules["msgspec"] = msgspec

    # Some reference archs call .cuda() at construction time (e.g. SPANF's
    # warmup forward, spanf_arch.py:172). The oracle runs on CPU: make
    # .cuda() a no-op so those modules instantiate.
    if not torch.cuda.is_available():
        torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
        torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
        # arch_util.DySample builds a pinned tensor (arch_util.py:383-385):
        # drop pin_memory on hosts without an accelerator
        _orig_tensor = torch.tensor

        def _tensor_no_pin(*a, **k):
            k.pop("pin_memory", None)
            return _orig_tensor(*a, **k)

        torch.tensor = _tensor_no_pin  # type: ignore[assignment]

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")


def import_ref_arch(module_name: str):
    """Import a reference arch FILE (e.g. 'dat_arch') with stubs live.

    traiNNer.archs.__init__ auto-imports the whole zoo (including spandrel-
    class factories we cannot satisfy), so we register a dummy package for
    'traiNNer.archs' whose __path__ points at the real directory — submodule
    imports resolve file-by-file without running the scanning __init__.
    """
    install_stubs()
    import importlib

    if "traiNNer.archs" not in sys.modules:
        import traiNNer  # real (empty) package init

        pkg = _stub_module("traiNNer.archs")
        pkg.__path__ = ["/root/reference/traiNNer/archs"]
        pkg.__package__ = "traiNNer.archs"
        sys.modules["traiNNer.archs"] = pkg
        traiNNer.archs = pkg
        # Rebind the spandrel DySample stub to the reference's own local
        # DySample (arch_util.py:322 — same layout/params) so archs that
        # import it (realplksr) can run as oracles.
        arch_util = importlib.import_module("traiNNer.archs.arch_util")
        sys.modules[
            "spandrel.architectures.__arch_helpers.dysample"
        ].DySample = arch_util.DySample
    return importlib.import_module(f"traiNNer.archs.{module_name}")
