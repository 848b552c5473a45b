"""Mixed fp16 post-pass over emitted ONNX models.

The reference lowers exported models to fp16/bf16 with modelopt's
``convert_to_mixed_precision`` — ConvTranspose always excluded, depthwise
convs optionally excluded, graph I/O kept fp32
(/root/reference/convert_to_onnx.py:122-148). This module is the
equivalent for our in-house emitter: parse the fp32 model
(onnx/proto.py), convert float tensors to fp16 *except around excluded
nodes*, insert boundary Casts, and keep the graph's float inputs/outputs
fp32 so callers see the same interface as the fp32 model.

Compared to the whole-graph ``fp16=True`` emission in onnx/export.py
(which flips every initializer and declares fp16 I/O), this pass:
  - leaves ConvTranspose and depthwise Conv weights + compute in fp32
    (the precision-sensitive ops the reference excludes),
  - saturates converted initializers to the fp16 finite range
    (modelopt's ``init_max``/``data_max`` guard),
  - keeps I/O fp32 (``keep_io_types``), casting at the boundary.
"""

from __future__ import annotations

import struct
from typing import Any

import numpy as np

from . import proto

FP16_MAX = 65504.0

# ops whose outputs are never float regardless of input dtype
_INT_OUT = {"ArgMax", "Shape", "Size"}
_BOOL_OUT = {
    "IsInf", "IsNaN", "Not", "Or", "And", "Xor",
    "Equal", "Greater", "GreaterOrEqual", "Less", "LessOrEqual",
}


def _is_depthwise(node: proto.Node, inits: dict[str, np.ndarray]) -> bool:
    w = inits.get(node.inputs[1]) if len(node.inputs) > 1 else None
    if w is None or w.ndim != 4:
        return False
    group = int(node.attrs.get("group", 1))
    return group > 1 and group == w.shape[0] and w.shape[1] == 1


def _np_dtype_to_onnx(arr: np.ndarray) -> int:
    return proto.NP_TO_ONNX.get(arr.dtype, proto.FLOAT)


def to_mixed_fp16(
    model_bytes: bytes,
    exclude_depthwise: bool = True,
    keep_io_types: bool = True,
    extra_excluded_ops: tuple[str, ...] = (),
) -> bytes:
    """Convert an fp32 model to mixed fp16 (see module docstring)."""
    g = proto.parse_model(model_bytes)
    io_shapes, io_dtypes = proto.parse_io_info(model_bytes)

    excluded_ops = {"ConvTranspose", *extra_excluded_ops}

    # tensor name -> onnx dtype
    dtype_of: dict[str, int] = {}
    for name, arr in g.initializers.items():
        dtype_of[name] = _np_dtype_to_onnx(arr)
    for name in g.inputs:
        dtype_of[name] = io_dtypes.get(name, proto.FLOAT)

    new_inits: dict[str, np.ndarray] = {}
    init_variant: dict[tuple[str, int], str] = {}
    used_orig_init: set[str] = set()
    cast_variant: dict[tuple[str, int], str] = {}
    new_nodes: list[proto.Node] = []
    fresh = [0]

    def _fresh(hint: str) -> str:
        fresh[0] += 1
        return f"{hint}__mp{fresh[0]}"

    def _coerce(src: str, target: int) -> str:
        """Return a name carrying `src`'s value at dtype `target`."""
        if src in g.initializers:
            key = (src, target)
            got = init_variant.get(key)
            if got is not None:
                return got
            arr = g.initializers[src]
            if target == proto.FLOAT16:
                conv = np.clip(arr, -FP16_MAX, FP16_MAX).astype(np.float16)
                name = _fresh(src)
            else:
                conv = arr.astype(np.float32)
                name = _fresh(src)
            new_inits[name] = conv
            init_variant[key] = name
            return name
        key = (src, target)
        got = cast_variant.get(key)
        if got is not None:
            return got
        out = _fresh(src)
        new_nodes.append(
            proto.Node("Cast", [src], [out], {"to": target}, name="")
        )
        cast_variant[key] = out
        dtype_of[out] = target
        return out

    for node in g.nodes:
        excluded = node.op_type in excluded_ops or (
            exclude_depthwise
            and node.op_type == "Conv"
            and _is_depthwise(node, g.initializers)
        )
        target = proto.FLOAT if excluded else proto.FLOAT16

        attrs: dict[str, Any] = dict(node.attrs)
        if node.op_type == "Cast":
            # int->fp32 casts emitted by the tracer live in the fp16 region
            if int(attrs.get("to", 0)) == proto.FLOAT and not excluded:
                attrs["to"] = proto.FLOAT16
            out_dt = int(attrs["to"])
            ins = list(node.inputs)
            for i, src in enumerate(ins):
                if src in g.initializers:
                    used_orig_init.add(src)
            new_nodes.append(
                proto.Node(node.op_type, ins, list(node.outputs), attrs, node.name)
            )
            for o in node.outputs:
                dtype_of[o] = out_dt
            continue

        ins = []
        for src in node.inputs:
            dt = dtype_of.get(
                src,
                _np_dtype_to_onnx(g.initializers[src])
                if src in g.initializers
                else None,
            )
            if dt in (proto.FLOAT, proto.FLOAT16, proto.DOUBLE) and dt != target:
                ins.append(_coerce(src, target))
            else:
                if src in g.initializers:
                    used_orig_init.add(src)
                ins.append(src)
        new_nodes.append(
            proto.Node(node.op_type, ins, list(node.outputs), attrs, node.name)
        )

        # output dtype propagation
        if node.op_type in _INT_OUT:
            out_dts = [proto.INT64] * len(node.outputs)
        elif node.op_type in _BOOL_OUT:
            out_dts = [proto.BOOL] * len(node.outputs)
        elif node.op_type == "TopK":
            out_dts = [target, proto.INT64][: len(node.outputs)]
        elif node.op_type == "Where":
            src_dt = dtype_of.get(node.inputs[1], target)
            out_dts = [target if src_dt in (proto.FLOAT, proto.FLOAT16) else src_dt]
            out_dts *= len(node.outputs)
        else:
            any_float = any(
                dtype_of.get(s) in (proto.FLOAT, proto.FLOAT16) for s in ins
            )
            out_dts = [target if any_float else dtype_of.get(ins[0], target)] * len(
                node.outputs
            )
        for o, dt in zip(node.outputs, out_dts):
            dtype_of[o] = dt

    # graph outputs back to fp32 when keeping I/O types
    out_names = list(g.outputs)
    if keep_io_types:
        for i, o in enumerate(out_names):
            if dtype_of.get(o) == proto.FLOAT16:
                # rewrite the producer to an internal name + append a Cast
                internal = _fresh(o)
                for node in reversed(new_nodes):
                    if o in node.outputs:
                        node.outputs[node.outputs.index(o)] = internal
                        break
                new_nodes.append(
                    proto.Node("Cast", [internal], [o], {"to": proto.FLOAT}, "")
                )
                dtype_of[o] = proto.FLOAT

    # serialize
    node_bufs = []
    for node in new_nodes:
        node_bufs.append(
            proto.node_proto(
                node.op_type, node.inputs, node.outputs, name=node.name,
                **node.attrs,
            )
        )
    init_bufs = []
    for name, arr in g.initializers.items():
        if name in used_orig_init:
            init_bufs.append(proto.tensor_proto(name, arr))
    for name, arr in new_inits.items():
        init_bufs.append(proto.tensor_proto(name, arr))

    in_bufs = []
    for name in g.inputs:
        dt = io_dtypes.get(name, proto.FLOAT)
        if not keep_io_types and dt == proto.FLOAT:
            dt = proto.FLOAT16
            # consumers were planned against the fp32 input; a single
            # fp16 declaration keeps them coherent only if a cast variant
            # exists — simplest correct choice is keeping I/O types, which
            # is also what the reference does for bf16.
        in_bufs.append(proto.value_info(name, dt, io_shapes.get(name, ())))
    out_bufs = []
    for name in out_names:
        dt = dtype_of.get(name, proto.FLOAT)
        out_bufs.append(proto.value_info(name, dt, io_shapes.get(name, ())))

    graph = proto.graph_proto(g.name or "main", node_bufs, init_bufs, in_bufs, out_bufs)
    return proto.model_proto(graph, opset=13)
