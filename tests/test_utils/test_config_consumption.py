"""Every accepted config field must be consumed somewhere.

VERDICT r1 weak #4: strict schema parsing with silently-ignored knobs
(`ema_switch_iter`, `remat`, `moa_debug`, legacy loss keys) gives users
false confidence. This guard walks the dataclass field surface of
TrainOptions / ReduxOptions / DatasetOptions / ValOptions and asserts each
field name is referenced at least once in package source OUTSIDE the schema
module itself — i.e. something reads it. New fields must arrive with a
consumer (or an explicit entry in the allowlist below, with a reason).
"""

from __future__ import annotations

import dataclasses
import os
import re

from trainner_redux_tpu.utils import redux_options as ro

PKG_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PKG = os.path.join(PKG_ROOT, "trainner_redux_tpu")
ENTRYPOINTS = [
    os.path.join(PKG_ROOT, n)
    for n in ("train.py", "test.py", "convert_to_onnx.py", "bench.py")
]

# Fields accepted for YAML-compat but deliberately without a runtime consumer.
# Every entry needs a reason. (Fields inert in the REFERENCE as well are
# handled by options.warn_inert_fields — they count as consumed because the
# warning machinery names them.)
ALLOWED_UNCONSUMED = {
    # reference stores this attribute at realesrgan_dataset.py:92 and never
    # reads it again (kernel sizes come from kernel_range2); same here
    "blur_kernel_size2",
}


def _field_names(cls) -> set[str]:
    return {f.name for f in dataclasses.fields(cls)}


def _source_corpus() -> str:
    chunks = []
    for base in [PKG]:
        for dirpath, _dirs, files in os.walk(base):
            for fn in files:
                if fn.endswith(".py") and fn != "redux_options.py":
                    with open(os.path.join(dirpath, fn), encoding="utf-8") as f:
                        chunks.append(f.read())
    for ep in ENTRYPOINTS:
        if os.path.exists(ep):
            with open(ep, encoding="utf-8") as f:
                chunks.append(f.read())
    return "\n".join(chunks)


CORPUS = _source_corpus()


def _unconsumed(cls) -> list[str]:
    missing = []
    for name in sorted(_field_names(cls)):
        if name in ALLOWED_UNCONSUMED:
            continue
        # consumed = attribute access, dict key, or kwarg reference anywhere
        pat = re.compile(rf"(?<![A-Za-z0-9_]){re.escape(name)}(?![A-Za-z0-9_])")
        if not pat.search(CORPUS):
            missing.append(name)
    return missing


def test_train_options_consumed():
    assert _unconsumed(ro.TrainOptions) == []


def test_redux_options_consumed():
    assert _unconsumed(ro.ReduxOptions) == []


def test_dataset_options_consumed():
    assert _unconsumed(ro.DatasetOptions) == []


def test_val_options_consumed():
    assert _unconsumed(ro.ValOptions) == []
