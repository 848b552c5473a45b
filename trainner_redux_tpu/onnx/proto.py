"""Minimal ONNX protobuf writer/reader (pure Python, no onnx package).

The ONNX file format is protobuf; this module implements the wire format
(varints + length-delimited fields) for the message subset needed to emit
and re-read inference graphs: ModelProto, GraphProto, NodeProto,
AttributeProto, TensorProto, ValueInfoProto (field numbers from the public
onnx.proto3 schema). The reader exists so emitted files can be structurally
and numerically verified in-environment (onnxruntime is not installed);
files are standard ONNX consumable by onnxruntime/chaiNNer externally —
replacing the reference's torch.onnx.export path
(/root/reference/convert_to_onnx.py:274-330).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

# TensorProto.DataType
FLOAT = 1
UINT8 = 2
INT8 = 3
INT32 = 6
INT64 = 7
BOOL = 9
FLOAT16 = 10
DOUBLE = 11
BFLOAT16 = 16

NP_TO_ONNX = {
    np.dtype(np.float32): FLOAT,
    np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
    np.dtype(np.int32): INT32,
    np.dtype(np.int64): INT64,
    np.dtype(np.bool_): BOOL,
    np.dtype(np.float16): FLOAT16,
    np.dtype(np.float64): DOUBLE,
}
ONNX_TO_NP = {v: k for k, v in NP_TO_ONNX.items()}

# AttributeProto.AttributeType
ATTR_FLOAT, ATTR_INT, ATTR_STRING, ATTR_TENSOR = 1, 2, 3, 4
ATTR_FLOATS, ATTR_INTS, ATTR_STRINGS = 6, 7, 8


# ---------------------------------------------------------------------------
# wire-format primitives
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def w_varint(field_no: int, value: int) -> bytes:
    return _tag(field_no, 0) + _varint(value)


def w_bytes(field_no: int, data: bytes) -> bytes:
    return _tag(field_no, 2) + _varint(len(data)) + data


def w_string(field_no: int, s: str) -> bytes:
    return w_bytes(field_no, s.encode())


def w_float(field_no: int, v: float) -> bytes:
    return _tag(field_no, 5) + struct.pack("<f", v)


# ---------------------------------------------------------------------------
# message builders
# ---------------------------------------------------------------------------


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    dtype = NP_TO_ONNX[arr.dtype]
    msg = b""
    for d in arr.shape:
        msg += w_varint(1, int(d))  # dims
    msg += w_varint(2, dtype)  # data_type
    msg += w_string(8, name)  # name
    msg += w_bytes(9, np.ascontiguousarray(arr).tobytes())  # raw_data
    return msg


def attribute(name: str, value: Any) -> bytes:
    msg = w_string(1, name)
    if isinstance(value, bool):
        msg += w_varint(3, int(value)) + w_varint(20, ATTR_INT)
    elif isinstance(value, int):
        msg += w_varint(3, value) + w_varint(20, ATTR_INT)
    elif isinstance(value, float):
        msg += w_float(2, value) + w_varint(20, ATTR_FLOAT)
    elif isinstance(value, str):
        msg += w_bytes(4, value.encode()) + w_varint(20, ATTR_STRING)
    elif isinstance(value, np.ndarray):
        msg += w_bytes(5, tensor_proto(name + "_t", value)) + w_varint(20, ATTR_TENSOR)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, (int, np.integer)) for v in value):
            for v in value:
                msg += w_varint(8, int(v))  # ints
            msg += w_varint(20, ATTR_INTS)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                msg += w_float(7, v)  # floats
            msg += w_varint(20, ATTR_FLOATS)
        else:
            raise TypeError(f"unsupported attr list for {name}: {value!r}")
    else:
        raise TypeError(f"unsupported attr {name}={value!r}")
    return msg


def node_proto(
    op_type: str, inputs: list[str], outputs: list[str],
    name: str = "", **attrs: Any,
) -> bytes:
    msg = b""
    for i in inputs:
        msg += w_string(1, i)
    for o in outputs:
        msg += w_string(2, o)
    if name:
        msg += w_string(3, name)
    msg += w_string(4, op_type)
    for k, v in attrs.items():
        msg += w_bytes(5, attribute(k, v))
    return msg


def value_info(name: str, dtype: int, shape: tuple) -> bytes:
    dims = b""
    for d in shape:
        if isinstance(d, str):
            dims += w_bytes(1, w_string(2, d))  # dim_param
        else:
            dims += w_bytes(1, w_varint(1, int(d)))  # dim_value
    shape_msg = dims
    tensor_type = w_varint(1, dtype) + w_bytes(2, shape_msg)
    type_proto = w_bytes(1, tensor_type)
    return w_string(1, name) + w_bytes(2, type_proto)


def graph_proto(
    name: str, nodes: list[bytes], initializers: list[bytes],
    inputs: list[bytes], outputs: list[bytes],
) -> bytes:
    msg = b""
    for n in nodes:
        msg += w_bytes(1, n)
    msg += w_string(2, name)
    for t in initializers:
        msg += w_bytes(5, t)
    for i in inputs:
        msg += w_bytes(11, i)
    for o in outputs:
        msg += w_bytes(12, o)
    return msg


def model_proto(graph: bytes, opset: int = 17, ir_version: int = 8,
                producer: str = "trainner_redux_tpu") -> bytes:
    opset_msg = w_string(1, "") + w_varint(2, opset)
    msg = w_varint(1, ir_version)
    msg += w_string(2, producer)
    msg += w_string(3, "0.1")
    msg += w_bytes(7, graph)
    msg += w_bytes(8, opset_msg)
    return msg


# ---------------------------------------------------------------------------
# reader (for in-environment verification)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def parse_message(buf: bytes) -> dict[int, list]:
    """Parse one protobuf message into {field_no: [raw values]}."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field_no, wire = tag >> 3, tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif wire == 1:
            val = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        fields.setdefault(field_no, []).append(val)
    return fields


@dataclass
class Node:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict[str, Any]
    name: str = ""


@dataclass
class Graph:
    name: str
    nodes: list[Node]
    initializers: dict[str, np.ndarray]
    inputs: list[str]
    outputs: list[str]
    input_info: dict[str, tuple] = field(default_factory=dict)


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    f = parse_message(buf)
    dims = [int(v) for v in f.get(1, [])]
    dtype = ONNX_TO_NP[int(f[2][0])]
    name = f.get(8, [b""])[0].decode()
    raw = f.get(9, [b""])[0]
    return name, np.frombuffer(raw, dtype=dtype).reshape(dims).copy()


def _s64(v: int) -> int:
    """Recover a signed int64 from its unsigned varint encoding (protobuf
    int64 stores negatives as two's complement)."""
    v = int(v)
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_attr(buf: bytes) -> tuple[str, Any]:
    f = parse_message(buf)
    name = f[1][0].decode()
    atype = int(f.get(20, [0])[0])
    if atype == ATTR_INT:
        return name, _s64(f[3][0])
    if atype == ATTR_FLOAT:
        return name, float(f[2][0])
    if atype == ATTR_STRING:
        return name, f[4][0].decode()
    if atype == ATTR_INTS:
        return name, [_s64(v) for v in f.get(8, [])]
    if atype == ATTR_FLOATS:
        return name, [float(v) for v in f.get(7, [])]
    if atype == ATTR_TENSOR:
        return name, _parse_tensor(f[5][0])[1]
    raise ValueError(f"unsupported attribute type {atype}")


def _parse_value_info(buf: bytes) -> tuple[str, tuple]:
    f = parse_message(buf)
    name = f[1][0].decode()
    shape: list = []
    try:
        tp = parse_message(f[2][0])
        tt = parse_message(tp[1][0])
        sh = parse_message(tt[2][0]) if 2 in tt else {}
        for dim_buf in sh.get(1, []):
            d = parse_message(dim_buf)
            if 1 in d:
                shape.append(int(d[1][0]))
            else:
                shape.append(d.get(2, [b"?"])[0].decode())
    except Exception:
        pass
    return name, tuple(shape)


def parse_model(buf: bytes) -> Graph:
    model = parse_message(buf)
    g = parse_message(model[7][0])
    nodes = []
    for nb in g.get(1, []):
        f = parse_message(nb)
        nodes.append(
            Node(
                op_type=f[4][0].decode(),
                inputs=[v.decode() for v in f.get(1, [])],
                outputs=[v.decode() for v in f.get(2, [])],
                attrs=dict(_parse_attr(a) for a in f.get(5, [])),
                name=f.get(3, [b""])[0].decode(),
            )
        )
    inits = dict(_parse_tensor(t) for t in g.get(5, []))
    inputs, input_info = [], {}
    for vb in g.get(11, []):
        n, sh = _parse_value_info(vb)
        inputs.append(n)
        input_info[n] = sh
    outputs = [_parse_value_info(vb)[0] for vb in g.get(12, [])]
    return Graph(
        name=g.get(2, [b""])[0].decode(),
        nodes=nodes, initializers=inits,
        inputs=inputs, outputs=outputs, input_info=input_info,
    )


def parse_io_info(model_bytes: bytes) -> tuple[dict[str, tuple], dict[str, int]]:
    """Graph input+output value_info: name -> shape (ints and dim_param
    strings) and name -> onnx dtype. parse_model keeps shapes only for
    inputs and drops dtypes; the post-passes (optimize, precision) need
    both to re-serialize a model unchanged."""
    model = parse_message(model_bytes)
    g = parse_message(model[7][0])
    shapes: dict[str, tuple] = {}
    dtypes: dict[str, int] = {}
    for field_no in (11, 12):
        for vb in g.get(field_no, []):
            f = parse_message(vb)
            name = f[1][0].decode()
            shape: list = []
            dt = FLOAT
            try:
                tp = parse_message(f[2][0])
                tt = parse_message(tp[1][0])
                dt = int(tt.get(1, [FLOAT])[0])
                sh = parse_message(tt[2][0]) if 2 in tt else {}
                for dim_buf in sh.get(1, []):
                    d = parse_message(dim_buf)
                    if 1 in d:
                        shape.append(int(d[1][0]))
                    else:
                        shape.append(d.get(2, [b"?"])[0].decode())
            except Exception:
                pass
            shapes[name] = tuple(shape)
            dtypes[name] = dt
    return shapes, dtypes


def serialize_graph(
    g: Graph,
    io_dtypes: dict[str, int],
    io_shapes: dict[str, tuple],
    opset: int = 13,
) -> bytes:
    """Re-emit a parsed (and possibly rewritten) Graph as model bytes."""
    node_bufs = [
        node_proto(n.op_type, n.inputs, n.outputs, name=n.name, **n.attrs)
        for n in g.nodes
    ]
    init_bufs = [tensor_proto(k, v) for k, v in g.initializers.items()]
    in_bufs = [
        value_info(n, io_dtypes.get(n, FLOAT), io_shapes.get(n, ()))
        for n in g.inputs
    ]
    out_bufs = [
        value_info(n, io_dtypes.get(n, FLOAT), io_shapes.get(n, ()))
        for n in g.outputs
    ]
    graph = graph_proto(g.name or "main", node_bufs, init_bufs, in_bufs, out_bufs)
    return model_proto(graph, opset=opset)
