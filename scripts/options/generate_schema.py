"""Emit the JSON schema for editor autocomplete (yaml-language-server).

Parity: /root/reference/scripts/options/generate_schema.py -> writes
schemas/redux-config.schema.json generated from the ReduxOptions dataclass
tree plus the live registries (valid arch/loss type names as enums).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main() -> None:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from trainner_redux_tpu.archs import ARCH_REGISTRY, SPANDREL_REGISTRY
    from trainner_redux_tpu.losses import LOSS_REGISTRY
    from trainner_redux_tpu.utils.redux_options import ReduxOptions
    from trainner_redux_tpu.utils.registry import DATASET_REGISTRY
    from trainner_redux_tpu.utils.schema import json_schema

    schema = json_schema(ReduxOptions)

    arch_names = sorted(set(SPANDREL_REGISTRY.keys()) | set(ARCH_REGISTRY.keys()))
    schema["properties"]["network_g"] = {
        "type": "object",
        "properties": {"type": {"enum": arch_names}},
        "additionalProperties": True,
    }
    schema["properties"]["network_d"] = {
        "type": "object",
        "properties": {"type": {"enum": arch_names}},
        "additionalProperties": True,
    }
    # loss entries
    loss_names = sorted(LOSS_REGISTRY.keys())
    if "TrainOptions" in schema.get("$defs", {}):
        schema["$defs"]["TrainOptions"]["properties"]["losses"] = {
            "type": "array",
            "items": {
                "type": "object",
                "properties": {"type": {"enum": loss_names}},
                "additionalProperties": True,
            },
        }
    if "DatasetOptions" in schema.get("$defs", {}):
        schema["$defs"]["DatasetOptions"]["properties"]["type"] = {
            "enum": sorted(DATASET_REGISTRY.keys())
        }

    out_dir = os.path.join(os.path.dirname(__file__), "..", "..", "schemas")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "redux-config.schema.json")
    with open(out, "w") as f:
        json.dump(schema, f, indent=2)
    print(f"wrote {os.path.abspath(out)} ({len(arch_names)} archs, {len(loss_names)} losses)")


if __name__ == "__main__":
    main()
