"""Post-emission ONNX graph optimization.

The reference pipes every export through ONNX Runtime graph optimization
(ORT_ENABLE_BASIC) and onnxslim before precision conversion
(/root/reference/convert_to_onnx.py:290-340). Neither tool exists in this
image, so this module runs the equivalent pass set in-house over the
in-house emitter's output, iterated to fixpoint:

  1. constant folding — a node whose inputs are all initializers is
     evaluated with the bundled numpy runtime and becomes an initializer
  2. Identity elimination
  3. Transpose composition — Transpose(Transpose(x)) merges into one
     node, or cancels entirely when the composed permutation is identity
     (the NHWC<->NCHW sandwiches the tracer emits around every conv)
  4. no-op Cast elimination (cast to the dtype the value already has,
     when the dtype is statically known)
  5. dead-code elimination — nodes and initializers unreachable from the
     graph outputs are dropped

Correctness is checked by the exporter's existing numeric verification,
which runs AFTER optimization.
"""

from __future__ import annotations

import numpy as np

from . import proto

# Folding is only attempted for ops the bundled runtime implements; the
# runtime raises NotImplementedError otherwise and the node is kept as-is.
_FOLD_SIZE_LIMIT = 1 << 24  # elements; don't materialize giant constants


def _fold_node(node: proto.Node, inits: dict[str, np.ndarray]) -> list[np.ndarray] | None:
    from .runtime import run_graph

    sub = proto.Graph(
        name="fold",
        nodes=[node],
        initializers={k: inits[k] for k in node.inputs if k},
        inputs=[],
        outputs=list(node.outputs),
    )
    try:
        outs = run_graph(sub, {})
    except Exception:
        return None
    if any(o.size > _FOLD_SIZE_LIMIT for o in outs):
        return None
    return outs


def _rewire(g: proto.Graph, old: str, new: str) -> None:
    for n in g.nodes:
        n.inputs[:] = [new if i == old else i for i in n.inputs]


def _pass_once(g: proto.Graph) -> bool:
    """One sweep of all rewrites; returns True if anything changed."""
    changed = False
    graph_outputs = set(g.outputs)
    producer: dict[str, proto.Node] = {}
    use_count: dict[str, int] = {}
    for n in g.nodes:
        for o in n.outputs:
            producer[o] = n
        for i in n.inputs:
            use_count[i] = use_count.get(i, 0) + 1

    kept: list[proto.Node] = []
    for node in g.nodes:
        # 1. constant folding
        if (
            node.inputs
            and all(i in g.initializers for i in node.inputs if i)
            and node.op_type not in ("Constant",)
        ):
            outs = _fold_node(node, g.initializers)
            if outs is not None and not (set(node.outputs) & graph_outputs):
                for name, arr in zip(node.outputs, outs):
                    g.initializers[name] = arr
                changed = True
                continue

        # 2. Identity elimination
        if node.op_type == "Identity" and node.outputs[0] not in graph_outputs:
            _rewire(g, node.outputs[0], node.inputs[0])
            changed = True
            continue

        # 3. Transpose composition / cancellation
        if node.op_type == "Transpose":
            src = producer.get(node.inputs[0])
            if (
                src is not None
                and src.op_type == "Transpose"
                and node.outputs[0] not in graph_outputs
            ):
                p1 = list(src.attrs.get("perm", []))
                p2 = list(node.attrs.get("perm", []))
                if p1 and p2 and len(p1) == len(p2):
                    composed = [p1[a] for a in p2]
                    if composed == list(range(len(composed))):
                        _rewire(g, node.outputs[0], src.inputs[0])
                    else:
                        node.inputs[0] = src.inputs[0]
                        node.attrs["perm"] = composed
                        kept.append(node)
                    changed = True
                    continue

        # 4. no-op Cast: casting an initializer to its own dtype
        if node.op_type == "Cast" and node.outputs[0] not in graph_outputs:
            src_name = node.inputs[0]
            arr = g.initializers.get(src_name)
            if arr is not None and proto.NP_TO_ONNX.get(arr.dtype) == int(
                node.attrs.get("to", -1)
            ):
                _rewire(g, node.outputs[0], src_name)
                changed = True
                continue

        kept.append(node)
    g.nodes = kept

    # 5. dead-code elimination (backward reachability from graph outputs)
    live: set[str] = set(g.outputs)
    for node in reversed(g.nodes):
        if any(o in live for o in node.outputs):
            live.update(i for i in node.inputs if i)
    before = len(g.nodes)
    g.nodes = [n for n in g.nodes if any(o in live for o in n.outputs)]
    dead_inits = [k for k in g.initializers if k not in live]
    for k in dead_inits:
        del g.initializers[k]
    if len(g.nodes) != before or dead_inits:
        changed = True
    return changed


def optimize_model(model_bytes: bytes, max_rounds: int = 8) -> tuple[bytes, dict]:
    """Optimize an emitted model; returns (new_bytes, stats)."""
    g = proto.parse_model(model_bytes)
    io_shapes, io_dtypes = proto.parse_io_info(model_bytes)
    stats = {
        "nodes_before": len(g.nodes),
        "inits_before": len(g.initializers),
    }
    for _ in range(max_rounds):
        if not _pass_once(g):
            break
    stats["nodes_after"] = len(g.nodes)
    stats["inits_after"] = len(g.initializers)
    return proto.serialize_graph(g, io_dtypes, io_shapes, opset=13), stats
