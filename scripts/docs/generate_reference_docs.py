"""Generate the reference pages of the docs site from live code.

Parity with the reference's docs/source/{architectures,arch_reference,
loss_reference,config_reference}.md — but generated, so they cannot rot:
architecture/loss/dataset/model/optimizer tables come from the registries,
and the config reference from the ReduxOptions dataclass tree.

    python scripts/docs/generate_reference_docs.py   # writes docs/source/
"""

from __future__ import annotations

import dataclasses
import os.path as osp
import sys
import typing

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

OUT = osp.join(osp.dirname(__file__), "..", "..", "docs", "source")


def _fmt_type(tp) -> str:
    s = str(tp)
    return (
        s.replace("typing.", "").replace("<class '", "").replace("'>", "")
        .replace("trainner_redux_tpu.utils.redux_options.", "")
        .replace("|", "\\|")  # keep markdown table cells intact
    )


def gen_config_reference() -> str:
    import trainner_redux_tpu.utils.redux_options as RO

    lines = [
        "# Config reference",
        "",
        "Generated from `trainner_redux_tpu/utils/redux_options.py` "
        "(`python scripts/docs/generate_reference_docs.py`). The YAML "
        "surface is compatible with traiNNer-redux configs; unknown keys "
        "are rejected by the strict decoder (`utils/schema.py`). A JSON "
        "schema for editors lives at `schemas/redux-config.schema.json`.",
        "",
    ]
    seen = set()

    def emit(cls, title) -> None:
        if cls in seen:
            return
        seen.add(cls)
        lines.append(f"## {title}")
        lines.append("")
        lines.append("| field | type | default |")
        lines.append("|---|---|---|")
        sub = []
        for f in dataclasses.fields(cls):
            if f.default is not dataclasses.MISSING:
                default = repr(f.default)
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore[misc]
                default = repr(f.default_factory())
            else:
                default = "**required**"
            tp = _fmt_type(f.type)
            lines.append(f"| `{f.name}` | `{tp}` | {default} |")
            # collect nested option dataclasses for their own sections
            hints = typing.get_type_hints(cls)
            hint = hints.get(f.name)
            for cand in (hint, *typing.get_args(hint)):
                if dataclasses.is_dataclass(cand):
                    sub.append(cand)
        lines.append("")
        for s in sub:
            emit(s, s.__name__)

    emit(RO.ReduxOptions, "ReduxOptions (top level)")
    return "\n".join(lines) + "\n"


def gen_registry_page(title, registry, intro, extra=None) -> str:
    lines = [f"# {title}", "", intro, ""]
    names = sorted(registry.keys())
    lines.append(f"{len(names)} registered entries:")
    lines.append("")
    for n in names:
        obj = registry.get(n)
        doc = (obj.__doc__ or "").strip().splitlines()
        desc = doc[0].strip() if doc else ""
        lines.append(f"- `{n}`" + (f" — {desc}" if desc else ""))
    lines.append("")
    if extra:
        lines.append(extra)
    return "\n".join(lines) + "\n"


def gen_architectures() -> str:
    import re

    import trainner_redux_tpu.archs  # noqa: F401
    from trainner_redux_tpu.utils.registry import (
        ARCH_REGISTRY,
        SPANDREL_REGISTRY,
    )

    conv = set()
    src = open(
        osp.join(osp.dirname(OUT), "..",
                 "trainner_redux_tpu", "utils", "torch_compat.py")
    ).read()
    conv = sorted(set(re.findall(r'register_converter\("([^"]+)"\)', src)))

    lines = [
        "# Architectures",
        "",
        "All generators/discriminators are flax/NHWC modules registered by "
        "name; configure with `network_g: {type: <name>, ...}`. Names match "
        "the reference registries, so reference YAML configs work unchanged.",
        "",
        "## Ecosystem-preset factories (`SPANDREL_REGISTRY`)",
        "",
    ]
    for n in sorted(SPANDREL_REGISTRY.keys()):
        lines.append(f"- `{n}`")
    lines += ["", "## Local architectures (`ARCH_REGISTRY`)", ""]
    for n in sorted(ARCH_REGISTRY.keys()):
        lines.append(f"- `{n}`")
    lines += [
        "",
        "## PyTorch checkpoint converters",
        "",
        "`utils/torch_compat.py` loads reference/ecosystem `.pth` and "
        "`.safetensors` checkpoints; each converter is validated by "
        "cross-framework golden tests against the reference's own torch "
        "forward (see PARITY.md). Registered converters:",
        "",
        ", ".join(f"`{c}`" for c in conv),
        "",
    ]
    return "\n".join(lines) + "\n"


def main() -> None:
    import os

    os.makedirs(OUT, exist_ok=True)
    import trainner_redux_tpu.archs  # noqa: F401
    import trainner_redux_tpu.data  # noqa: F401
    import trainner_redux_tpu.losses  # noqa: F401
    import trainner_redux_tpu.metrics  # noqa: F401
    import trainner_redux_tpu.models.ae_model  # noqa: F401
    import trainner_redux_tpu.models.realesrgan_model  # noqa: F401
    import trainner_redux_tpu.models.sr_model  # noqa: F401
    import trainner_redux_tpu.optimizers  # noqa: F401
    from trainner_redux_tpu.utils.registry import (
        DATASET_REGISTRY,
        LOSS_REGISTRY,
        METRIC_REGISTRY,
        MODEL_REGISTRY,
        OPTIMIZER_REGISTRY,
    )

    pages = {
        "config_reference.md": gen_config_reference(),
        "architectures.md": gen_architectures(),
        "loss_reference.md": gen_registry_page(
            "Losses", LOSS_REGISTRY,
            "Configure under `train.losses` as a list of "
            "`{type: <name>, loss_weight: <w>, ...}` entries.",
        ),
        "datasets.md": gen_registry_page(
            "Datasets", DATASET_REGISTRY,
            "Configure under `datasets.<phase>.type`.",
        ),
        "models.md": gen_registry_page(
            "Trainers (models)", MODEL_REGISTRY,
            "Selected automatically from the config "
            "(`high_order_degradation: true` -> RealESRGANModel, etc.) or "
            "explicitly via `model_type`.",
        ),
        "optimizers.md": gen_registry_page(
            "Optimizers", OPTIMIZER_REGISTRY,
            "Configure under `train.optim_g` / `train.optim_d` as "
            "`{type: <name>, lr: ...}`.",
        ),
        "metrics.md": gen_registry_page(
            "Validation metrics", METRIC_REGISTRY,
            "Configure under `val.metrics`.",
        ),
    }
    for name, text in pages.items():
        path = osp.join(OUT, name)
        with open(path, "w", encoding="utf-8") as f:
            f.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
