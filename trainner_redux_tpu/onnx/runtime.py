"""Reference numpy evaluator for the ONNX op subset this exporter emits.

Used to verify exported .onnx files numerically in-environment (onnxruntime
is not installed here); mirrors the reference's export verification step
(/root/reference/convert_to_onnx.py: verify onnx vs torch outputs).
"""

from __future__ import annotations

import numpy as np

from trainner_redux_tpu.onnx import proto


def _conv2d(x, w, strides, pads, dilations, group):
    n, c, h, wd = x.shape
    oc, ic_g, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    ph0, pw0, ph1, pw1 = pads
    x = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
    eh = (kh - 1) * dh + 1
    ew = (kw - 1) * dw + 1
    oh = (x.shape[2] - eh) // sh + 1
    ow = (x.shape[3] - ew) // sw + 1
    out = np.zeros((n, oc, oh, ow), np.float32)
    cg = c // group
    og = oc // group
    # im2col per group
    for g in range(group):
        xg = x[:, g * cg : (g + 1) * cg]
        cols = np.empty((n, cg, kh, kw, oh, ow), np.float32)
        for i in range(kh):
            for j in range(kw):
                cols[:, :, i, j] = xg[
                    :, :, i * dh : i * dh + oh * sh : sh, j * dw : j * dw + ow * sw : sw
                ]
        wg = w[g * og : (g + 1) * og].reshape(og, -1)
        out[:, g * og : (g + 1) * og] = np.einsum(
            "ok,nkhw->nohw", wg, cols.reshape(n, -1, oh, ow), optimize=True
        )
    return out


def _conv_transpose2d(x, w, strides, pads, dilations, group):
    # equivalent dilated conv: conv(dilate(x, s), flip(swap(w)), pad=k-1-p)
    i_ch, o_g, kh, kw = w.shape
    sh, sw = strides
    n, c, h, wd = x.shape
    xd = np.zeros((n, c, (h - 1) * sh + 1, (wd - 1) * sw + 1), x.dtype)
    xd[:, :, ::sh, ::sw] = x
    wf = np.flip(w, axis=(2, 3)).swapaxes(0, 1)  # -> (O, I, kh, kw)
    if group != 1:
        raise NotImplementedError
    ph0, pw0, ph1, pw1 = pads
    full_pads = [kh - 1 - ph0, kw - 1 - pw0, kh - 1 - ph1, kw - 1 - pw1]
    return _conv2d(xd, wf, (1, 1), full_pads, dilations, 1)


def _pool2d(x, kernel, strides, pads, mode):
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    ph0, pw0, ph1, pw1 = pads
    fill = -np.inf if mode == "max" else 0.0
    x = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)), constant_values=fill)
    oh = (x.shape[2] - kh) // sh + 1
    ow = (x.shape[3] - kw) // sw + 1
    cols = np.empty((n, c, kh * kw, oh, ow), np.float32)
    idx = 0
    for i in range(kh):
        for j in range(kw):
            cols[:, :, idx] = x[:, :, i : i + oh * sh : sh, j : j + ow * sw : sw]
            idx += 1
    return cols.max(2) if mode == "max" else cols.mean(2)


def run_graph(graph: proto.Graph, feeds: dict[str, np.ndarray]) -> list[np.ndarray]:
    env: dict[str, np.ndarray] = dict(graph.initializers)
    env.update(feeds)

    for node in graph.nodes:
        i = [env[name] for name in node.inputs if name]
        a = node.attrs
        op = node.op_type
        if op == "Identity":
            out = i[0]
        elif op == "Add":
            out = i[0] + i[1]
        elif op == "Sub":
            out = i[0] - i[1]
        elif op == "Mul":
            out = i[0] * i[1]
        elif op == "Div":
            out = i[0] / i[1]
        elif op == "Max":
            out = np.maximum(i[0], i[1])
        elif op == "Min":
            out = np.minimum(i[0], i[1])
        elif op == "Pow":
            out = np.power(i[0], i[1])
        elif op == "Neg":
            out = -i[0]
        elif op == "Abs":
            out = np.abs(i[0])
        elif op == "Sign":
            out = np.sign(i[0])
        elif op == "Floor":
            out = np.floor(i[0])
        elif op == "Ceil":
            out = np.ceil(i[0])
        elif op == "Exp":
            out = np.exp(i[0])
        elif op == "Log":
            out = np.log(i[0])
        elif op == "Sqrt":
            out = np.sqrt(i[0])
        elif op == "Reciprocal":
            out = 1.0 / i[0]
        elif op == "Tanh":
            out = np.tanh(i[0])
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-i[0]))
        elif op == "Erf":
            from math import erf

            out = np.vectorize(erf, otypes=[np.float32])(i[0])
        elif op == "Sin":
            out = np.sin(i[0])
        elif op == "Cos":
            out = np.cos(i[0])
        elif op == "Not":
            out = ~i[0].astype(bool)
        elif op == "And":
            out = i[0].astype(bool) & i[1].astype(bool)
        elif op == "Or":
            out = i[0].astype(bool) | i[1].astype(bool)
        elif op == "Equal":
            out = i[0] == i[1]
        elif op == "Less":
            out = i[0] < i[1]
        elif op == "Greater":
            out = i[0] > i[1]
        elif op == "LessOrEqual":
            out = i[0] <= i[1]
        elif op == "GreaterOrEqual":
            out = i[0] >= i[1]
        elif op == "Where":
            out = np.where(i[0], i[1], i[2])
        elif op == "Clip":
            out = np.clip(i[0], i[1], i[2])
        elif op == "Cast":
            out = i[0].astype(proto.ONNX_TO_NP[a["to"]])
        elif op == "Reshape":
            out = i[0].reshape([int(s) for s in i[1]])
        elif op == "Transpose":
            out = np.transpose(i[0], a["perm"])
        elif op == "Expand":
            out = np.broadcast_to(i[0], [int(s) for s in i[1]]).copy()
        elif op == "Concat":
            out = np.concatenate(i, axis=a["axis"])
        elif op == "Tile":
            out = np.tile(i[0], tuple(i[1].tolist()))
        elif op == "GatherND":
            ind = i[1]
            out = i[0][tuple(np.moveaxis(ind, -1, 0))]
        elif op == "Unsqueeze":
            out = np.expand_dims(i[0], tuple(int(x) for x in i[1]))
        elif op == "TopK":
            k = int(i[1][0])
            ax = a.get("axis", -1)
            largest = a.get("largest", 1)
            x0 = i[0]
            order = np.argsort(x0, axis=ax, kind="stable")
            if largest:
                order = np.flip(order, axis=ax)
            idx = np.take(order, np.arange(k), axis=ax)
            vals = np.take_along_axis(x0, idx, axis=ax)
            env[node.outputs[0]] = vals
            env[node.outputs[1]] = idx.astype(np.int64)
            continue
        elif op == "GatherElements":
            out = np.take_along_axis(i[0], i[1].astype(np.int64), axis=a.get("axis", 0))
        elif op == "ArgMax":
            out = np.argmax(i[0], axis=a["axis"]).astype(np.int64)
            if a.get("keepdims", 1):
                out = np.expand_dims(out, a["axis"])
        elif op == "Slice":
            starts, ends = i[1].tolist(), i[2].tolist()
            axes = i[3].tolist() if len(i) > 3 else list(range(len(starts)))
            steps = i[4].tolist() if len(i) > 4 else [1] * len(starts)
            sl = [slice(None)] * i[0].ndim
            for s0, e0, ax, st in zip(starts, ends, axes, steps):
                lo = None if s0 in (-(2**31), -(2**63)) else int(s0)
                hi = None if e0 in (2**31 - 1, 2**63 - 1, -(2**31)) else int(e0)
                if st < 0 and e0 <= -(2**31) + 1:
                    hi = None
                sl[ax] = slice(lo, hi, int(st))
            out = i[0][tuple(sl)]
        elif op == "Pad":
            pads = i[1].tolist()
            nd = i[0].ndim
            pairs = [(int(pads[k]), int(pads[k + nd])) for k in range(nd)]
            cval = float(i[2]) if len(i) > 2 else 0.0
            mode = a.get("mode", "constant")
            if mode == "constant":
                out = np.pad(i[0], pairs, constant_values=cval)
            else:
                out = np.pad(i[0], pairs, mode="edge" if mode == "edge" else "reflect")
        elif op == "Split":
            sizes = i[1].tolist()
            ax = a.get("axis", 0)
            pieces = np.split(i[0], np.cumsum(sizes)[:-1], axis=ax)
            for oname, piece in zip(node.outputs, pieces):
                env[oname] = np.ascontiguousarray(piece)
            continue
        elif op == "IsNaN":
            out = np.isnan(i[0])
        elif op == "IsInf":
            out = np.isinf(i[0])
        elif op == "Gather":
            out = np.take(i[0], i[1].astype(np.int64), axis=a.get("axis", 0))
        elif op == "Einsum":
            out = np.einsum(a["equation"], *i, optimize=True)
        elif op == "ReduceSum":
            axes = tuple(i[1].tolist()) if len(i) > 1 else None
            out = i[0].sum(axis=axes, keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceMax":
            out = i[0].max(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceMin":
            out = i[0].min(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "ReduceMean":
            out = i[0].mean(axis=tuple(a["axes"]), keepdims=bool(a.get("keepdims", 1)))
        elif op == "CumSum":
            out = np.cumsum(i[0], axis=int(i[1]))
        elif op == "Conv":
            out = _conv2d(
                i[0], i[1], a.get("strides", [1, 1]), a.get("pads", [0] * 4),
                a.get("dilations", [1, 1]), a.get("group", 1),
            )
        elif op == "ConvTranspose":
            out = _conv_transpose2d(
                i[0], i[1], a.get("strides", [1, 1]), a.get("pads", [0] * 4),
                a.get("dilations", [1, 1]), a.get("group", 1),
            )
        elif op == "MaxPool":
            out = _pool2d(i[0], a["kernel_shape"], a.get("strides"),
                          a.get("pads", [0] * 4), "max")
        elif op == "AveragePool":
            out = _pool2d(i[0], a["kernel_shape"], a.get("strides"),
                          a.get("pads", [0] * 4), "avg")
        else:
            raise NotImplementedError(f"runtime: unsupported op {op}")
        for oname in node.outputs:
            env[oname] = np.asarray(out)

    return [env[name] for name in graph.outputs]


def run_model(model_bytes: bytes, feeds: dict[str, np.ndarray]) -> list[np.ndarray]:
    return run_graph(proto.parse_model(model_bytes), feeds)
