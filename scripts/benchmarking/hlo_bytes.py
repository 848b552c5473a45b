"""HBM-traffic attribution of a compiled step from its optimized HLO.

The round-3 component profile proved the SwinIR-M train step is
HBM-traffic-bound (XLA cost: 82.76 GB/step at b8 vs the 819 GB/s v5e peak
-> 101 ms floor vs 152 ms measured), so the throughput attack is byte
elimination, not FLOP scheduling. This tool answers WHERE the bytes go:
it parses the optimized HLO of the jitted train step / forward, assigns
every top-level instruction (and while-loop bodies, scaled by trip count
when annotated) its output + operand buffer sizes, and aggregates by
opcode and by jax op_name component (LayerNorm, attention, mlp, conv,
optimizer, ...).

"bytes" here = sum of operand+result buffer sizes of non-trivial
instructions at fusion granularity — exactly the quantity XLA's own
cost_analysis "bytes accessed" reports (producer write + consumer read
both count), so numbers are comparable with bench.py's hbm_bw_frac.

Usage: python scripts/benchmarking/hlo_bytes.py [--fwd] [--top N]
Writes docs/perf/hlo_bytes_swinir_m.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.getcwd())

import jax
import numpy as np

_cache = os.environ.get(
    "TRAINNER_JIT_CACHE", os.path.expanduser("~/.cache/trainner_jax_bench")
)
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "s4": 1, "u4": 1,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples by summing)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\][^ ]*))\s+"
    r"([\w\-]+)\("
)
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_CALLS_RE = re.compile(r"(?:calls|body|to_apply)=%?([\w.\-]+)")
_TRIP_RE = re.compile(r'"known_trip_count":\{"n":"(\d+)"\}')


def parse_hlo(text: str) -> dict:
    """Parse optimized HLO text into {computation: [instr dicts]}."""
    comps: dict[str, list[dict]] = {}
    cur: list[dict] | None = None
    cur_name = None
    entry = None
    for line in text.splitlines():
        m = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
        if m and ("{" in line):
            cur_name = m.group(2)
            cur = comps.setdefault(cur_name, [])
            if m.group(1):
                entry = cur_name
            continue
        if cur is None:
            continue
        mi = _INSTR_RE.match(line)
        if not mi:
            continue
        name, shape, opcode = mi.groups()
        # operand list: the (...) right after the opcode
        rest = line[mi.end():]
        depth = 1
        i = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        operands_str = rest[:i]
        tail = rest[i:]
        opn = _OPNAME_RE.search(tail)
        calls = _CALLS_RE.search(tail)
        trip = _TRIP_RE.search(tail)
        cur.append({
            "name": name,
            "opcode": opcode,
            "out_bytes": shape_bytes(shape),
            "operands": [
                o for o in _OPERAND_RE.findall(operands_str)
                if not o.replace(".", "").isdigit()
            ],
            "op_name": opn.group(1) if opn else "",
            "calls": calls.group(1) if calls else None,
            "trip": int(trip.group(1)) if trip else None,
        })
    return {"computations": comps, "entry": entry}


# opcodes whose operands/results live in HBM at top level (fusion boundaries)
_SKIP = {
    "parameter", "constant", "get-tuple-element", "tuple", "bitcast",
    "after-all", "partition-id", "replica-id", "iota",
}


def component_of(op_name: str) -> str:
    """Map a jax op_name path to a coarse model component."""
    s = op_name.lower()
    for pat, label in [
        (r"adamw|adam|optimizer|opt_state|scale_by", "optimizer"),
        (r"ema", "ema"),
        (r"transpose\(.*\)|vjp|backward", None),  # handled by direction below
    ]:
        if pat and re.search(pat, s) and label:
            return label
    grad = bool(re.search(r"transpose\[|grad|vjp|backward", s))
    for pat, label in [
        (r"layernorm|layer_norm|/ln", "layernorm"),
        (r"window|attn|attention|softmax|qkv|relative_position", "attention"),
        (r"mlp|gelu|dense|feed_forward", "mlp"),
        (r"conv", "conv"),
        (r"upsample|pixel_shuffle|resize", "upsample"),
        (r"roll", "roll"),
        (r"l1|loss|abs", "loss"),
        (r"custom", "custom-call"),
    ]:
        if re.search(pat, s):
            return ("bwd-" if grad else "") + label
    return ("bwd-" if grad else "") + "other"


def attribute(parsed: dict) -> tuple[list[dict], dict, dict]:
    comps = parsed["computations"]
    entry = parsed["entry"]

    # computations reachable as while bodies/conditions get a multiplier
    rows: list[dict] = []

    def walk(comp_name: str, mult: float, ctx: str) -> None:
        by_name = {i["name"]: i for i in comps.get(comp_name, [])}
        for ins in comps.get(comp_name, []):
            if ins["opcode"] == "while":
                trip = ins["trip"] or 1
                body = ins["calls"]
                if body:
                    walk(body, mult * trip, f"{ctx}/while(x{trip})")
                continue
            if ins["opcode"] in _SKIP:
                continue
            operand_bytes = sum(
                by_name[o]["out_bytes"] for o in ins["operands"] if o in by_name
            )
            rows.append({
                "ctx": ctx,
                "opcode": ins["opcode"],
                "op_name": ins["op_name"],
                "bytes": (ins["out_bytes"] + operand_bytes) * mult,
                "mult": mult,
            })

    walk(entry, 1.0, "entry")

    by_opcode: dict[str, float] = defaultdict(float)
    by_component: dict[str, float] = defaultdict(float)
    for r in rows:
        by_opcode[r["opcode"]] += r["bytes"]
        by_component[component_of(r["op_name"])] += r["bytes"]
    return rows, dict(by_opcode), dict(by_component)


def build_step(k_steps: int = 1, batch: int = 8):
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions, ReduxOptions, TrainOptions,
    )

    opt = ReduxOptions(
        name="hlo", scale=4, num_gpu=len(jax.devices()), path=PathOptions(),
        network_g={"type": "swinir_m"}, manual_seed=0, is_train=True,
        compute_dtype="bfloat16", mesh={"data": len(jax.devices())},
        steps_per_dispatch=k_steps,
        train=TrainOptions(
            total_iter=1000, ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 2e-4},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    rng = np.random.default_rng(0)
    lqa = (rng.random((k_steps * batch, 64, 64, 3)) * 255).astype(np.uint8)
    gta = (rng.random((k_steps * batch, 256, 256, 3)) * 255).astype(np.uint8)
    model.feed_data({"lq": lqa, "gt": gta})
    return model


def main() -> None:
    top_n = 30
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])

    model = build_step(k_steps=1)
    batch = {"lq": model.lq, "gt": model.gt, "key": jax.random.key(0)}
    if "--fwd" in sys.argv:
        import jax.numpy as jnp

        net = model.net_g
        params = model.state.params_g
        lqf = jnp.asarray(model.lq, jnp.float32)

        @jax.jit
        def fwd(p, x):
            return net.apply(
                {"params": p}, x, train=True, rngs={"dropout": jax.random.key(0)}
            )

        compiled = fwd.lower(params, lqf).compile()
        tag = "fwd"
    else:
        compiled = model._train_step.lower(model.state, batch).compile()
        tag = "train"

    text = compiled.as_text()
    parsed = parse_hlo(text)
    rows, by_opcode, by_component = attribute(parsed)

    total = sum(r["bytes"] for r in rows)
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    print(f"== {tag} step: attributed {total/1e9:.2f} GB "
          f"(XLA cost_analysis: {float(ca.get('bytes accessed', 0))/1e9:.2f} GB) ==\n")

    print("-- by opcode --")
    for k, v in sorted(by_opcode.items(), key=lambda kv: -kv[1]):
        if v > total * 0.002:
            print(f"  {k:28s} {v/1e9:8.2f} GB  {100*v/total:5.1f}%")
    print("\n-- by component (op_name heuristics) --")
    for k, v in sorted(by_component.items(), key=lambda kv: -kv[1]):
        if v > total * 0.002:
            print(f"  {k:28s} {v/1e9:8.2f} GB  {100*v/total:5.1f}%")
    print(f"\n-- top {top_n} instructions --")
    for r in sorted(rows, key=lambda r: -r["bytes"])[:top_n]:
        nm = r["op_name"][-110:]
        print(f"  {r['bytes']/1e9:7.3f} GB x{r['mult']:.0f} {r['opcode']:18s} {nm}")

    os.makedirs("docs/perf", exist_ok=True)
    out = {
        "tag": tag,
        "total_gb": round(total / 1e9, 2),
        "xla_cost_gb": round(float(ca.get("bytes accessed", 0)) / 1e9, 2),
        "by_opcode_gb": {k: round(v / 1e9, 3) for k, v in by_opcode.items()},
        "by_component_gb": {k: round(v / 1e9, 3) for k, v in by_component.items()},
        "top": [
            {"gb": round(r["bytes"] / 1e9, 3), "opcode": r["opcode"],
             "op_name": r["op_name"][-160:]}
            for r in sorted(rows, key=lambda r: -r["bytes"])[:top_n]
        ],
    }
    path = f"docs/perf/hlo_bytes_swinir_m_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")


if __name__ == "__main__":
    main()
