"""jaxpr -> ONNX graph exporter.

Traces a jittable function (e.g. a flax SR model's forward) to a closed
jaxpr and maps each lax primitive onto ONNX ops (opset 13), producing a
standard .onnx file via the pure-Python protobuf writer in proto.py. This
replaces the reference's torch.onnx.export (convert_to_onnx.py:274-330) for
the ecosystem interop story: the emitted models run in onnxruntime/chaiNNer.

Design notes:
- Graphs stay in the model's native layout (NHWC); convolutions emit
  Transpose->Conv->Transpose sandwiches with OIHW weight initializers, and a
  peephole pass cancels adjacent inverse transposes between consecutive
  convs.
- lhs_dilation convolutions (our ConvTranspose parity path) map to ONNX
  ConvTranspose with spatially-unflipped, IO-swapped kernels.
- dot_general maps to Einsum (general: batched attention included);
  reductions, pads, slices, gathers-by-index and elementwise ops cover the
  rest of the zoo's primitive vocabulary.
- call primitives (pjit/remat/custom_jvp/checkpoint) are inlined.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.extend import core as jcore

from trainner_redux_tpu.onnx import proto

# primitives inlined by recursing into their subjaxpr
_CALL_PRIMS = {
    "jit", "pjit", "closed_call", "core_call", "xla_call", "remat", "remat2",
    "checkpoint", "custom_jvp_call", "custom_vjp_call",
    "custom_jvp_call_jaxpr", "custom_vjp_call_jaxpr", "custom_jvp_generic",
}

_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "pow": "Pow", "rem": "Mod",
    "exp": "Exp", "log": "Log", "tanh": "Tanh", "logistic": "Sigmoid",
    "sqrt": "Sqrt", "abs": "Abs", "neg": "Neg", "sign": "Sign",
    "floor": "Floor", "ceil": "Ceil", "erf": "Erf", "sin": "Sin",
    "cos": "Cos", "atan2": "Atan",  # atan2 not exact; guarded below
    "not": "Not", "and": "And", "or": "Or",
}

_COMPARE = {"eq": "Equal", "lt": "Less", "gt": "Greater",
            "le": "LessOrEqual", "ge": "GreaterOrEqual"}


class OnnxBuilder:
    def __init__(self, fp16: bool = False) -> None:
        self.nodes: list[bytes] = []
        self.initializers: list[bytes] = []
        self._init_names: set[str] = set()
        self.counter = 0
        self.fp16 = fp16

    def fresh(self, hint: str = "t") -> str:
        self.counter += 1
        return f"{hint}_{self.counter}"

    def add_node(self, op: str, inputs: list[str], n_out: int = 1, **attrs) -> list[str]:
        outs = [self.fresh(op.lower()) for _ in range(n_out)]
        self.nodes.append(proto.node_proto(op, inputs, outs, **attrs))
        return outs

    def add_init(self, arr: np.ndarray, hint: str = "c") -> str:
        name = self.fresh(hint)
        arr = np.asarray(arr)
        if self.fp16 and arr.dtype in (np.float32, np.float64):
            arr = arr.astype(np.float16)
        self.initializers.append(proto.tensor_proto(name, arr))
        self._init_names.add(name)
        return name


class _Ctx:
    """Maps jaxpr vars to ONNX tensor names; constant-folded values live in
    `known` and materialize as initializers only when a non-folded consumer
    actually reads them."""

    def __init__(self, builder: OnnxBuilder) -> None:
        self.b = builder
        self.env: dict[Any, str] = {}
        self.known: dict[Any, np.ndarray] = {}
        self.cenv: dict[Any, tuple[str, str]] = {}  # complex vars -> (re, im)

    def get(self, atom) -> str:
        if isinstance(atom, jcore.Literal):
            val = np.asarray(atom.val)
            return self.b.add_init(val, "lit")
        if atom not in self.env and atom in self.known:
            self.env[atom] = self.b.add_init(self.known[atom], "fold")
        return self.env[atom]

    def set(self, var, name: str) -> None:
        self.env[var] = name

    def getc(self, atom) -> tuple[str, str]:
        if isinstance(atom, jcore.Literal):
            v = np.asarray(atom.val)
            return (
                self.b.add_init(np.asarray(v.real, np.float32), "cre"),
                self.b.add_init(np.asarray(v.imag, np.float32), "cim"),
            )
        if atom not in self.cenv and atom in self.known:
            v = self.known[atom]
            self.cenv[atom] = (
                self.b.add_init(np.asarray(v.real, np.float32), "cre"),
                self.b.add_init(np.asarray(v.imag, np.float32), "cim"),
            )
        return self.cenv[atom]

    def setc(self, var, pair: tuple[str, str]) -> None:
        self.cenv[var] = pair


class _CompView:
    """Context proxy exposing one component (re/im) of complex vars so the
    real-op emitters can be reused verbatim for structural complex ops."""

    def __init__(self, ctx: _Ctx, comp: int) -> None:
        self._ctx = ctx
        self._comp = comp
        self.b = ctx.b
        self.out: dict[Any, str] = {}

    def get(self, atom) -> str:
        aval = getattr(atom, "aval", None)
        if aval is not None and np.issubdtype(aval.dtype, np.complexfloating):
            return self._ctx.getc(atom)[self._comp]
        if isinstance(atom, jcore.Literal) and np.issubdtype(
            np.asarray(atom.val).dtype, np.complexfloating
        ):
            v = np.asarray(atom.val)
            part = np.asarray(v.real if self._comp == 0 else v.imag, np.float32)
            return self.b.add_init(part, "clit")
        return self._ctx.get(atom)

    def set(self, var, name: str) -> None:
        self.out[var] = name


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv(ctx: _Ctx, eqn) -> None:
    b = ctx.b
    p = eqn.params
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    strides = list(p["window_strides"])
    pads = [list(x) for x in p["padding"]]
    lhs_dil = list(p.get("lhs_dilation") or [1] * len(strides))
    rhs_dil = list(p.get("rhs_dilation") or [1] * len(strides))
    groups = int(p.get("feature_group_count", 1))

    x_name = ctx.get(eqn.invars[0])
    w_atom = eqn.invars[1]

    nd = len(strides)
    # permutations into NCHW / OIHW
    lhs_perm = [lhs_spec.index(i) for i in range(len(lhs_spec))]
    # lhs_spec = (batch_dim, feature_dim, *spatial_dims) as dim indices
    to_nchw = [lhs_spec[0], lhs_spec[1], *lhs_spec[2:]]
    x_nchw = b.add_node("Transpose", [x_name], perm=to_nchw)[0]

    # weight -> OIHW as graph ops (ORT constant-folds these at load time)
    w_name = ctx.get(w_atom)
    w_shape = tuple(w_atom.aval.shape)
    oihw_perm = [rhs_spec[0], rhs_spec[1], *rhs_spec[2:]]
    if oihw_perm != list(range(len(oihw_perm))):
        w_name = b.add_node("Transpose", [w_name], perm=oihw_perm)[0]
    k = [int(w_shape[rhs_spec[2 + i]]) for i in range(nd)]

    onnx_pads = [pads[i][0] for i in range(nd)] + [pads[i][1] for i in range(nd)]

    if any(d != 1 for d in lhs_dil):
        # transposed convolution: y = conv(dilate(x, s), W) ==
        # ConvTranspose(x, W', strides=s, pads=k-1-p) with W' spatially
        # flipped and I/O swapped
        spatial = list(range(2, 2 + nd))
        st = b.add_init(np.asarray([k[i] - 1 for i in range(nd)], np.int64), "st")
        en = b.add_init(np.asarray([-(2**31)] * nd, np.int64), "en")
        ax = b.add_init(np.asarray(spatial, np.int64), "ax")
        sp = b.add_init(np.asarray([-1] * nd, np.int64), "sp")
        w_flip = b.add_node("Slice", [w_name, st, en, ax, sp])[0]
        w_iohw = b.add_node(
            "Transpose", [w_flip], perm=[1, 0, *spatial]
        )[0]
        ct_pads = (
            [k[i] - 1 - pads[i][0] for i in range(nd)]
            + [k[i] - 1 - pads[i][1] for i in range(nd)]
        )
        if any(v < 0 for v in ct_pads):
            raise NotImplementedError("negative ConvTranspose pads")
        y = b.add_node(
            "ConvTranspose", [x_nchw, w_iohw],
            strides=lhs_dil, pads=ct_pads, dilations=rhs_dil, group=groups,
        )[0]
    else:
        y = b.add_node(
            "Conv", [x_nchw, w_name],
            strides=strides, pads=onnx_pads, dilations=rhs_dil, group=groups,
        )[0]

    # back to the jax output layout
    # out_spec dims: position of (batch, feature, *spatial) in the output
    inv = [0] * len(out_spec)
    for onnx_axis, jax_axis in enumerate([out_spec[0], out_spec[1], *out_spec[2:]]):
        inv[jax_axis] = onnx_axis
    out = b.add_node("Transpose", [y], perm=inv)[0]
    ctx.set(eqn.outvars[0], out)


def _dot_general(ctx: _Ctx, eqn) -> None:
    b = ctx.b
    ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
    lhs, rhs = eqn.invars
    l_nd, r_nd = len(lhs.aval.shape), len(rhs.aval.shape)
    letters = "abcdefghijklmnopqrstuvwxyz"
    # assign letters: batch dims shared, contract dims shared, rest unique
    next_i = 0

    def fresh_letter():
        nonlocal next_i
        ch = letters[next_i]
        next_i += 1
        return ch

    l_sub = [""] * l_nd
    r_sub = [""] * r_nd
    for i, j in zip(lb, rb):
        ch = fresh_letter()
        l_sub[i] = ch
        r_sub[j] = ch
    for i, j in zip(lc, rc):
        ch = fresh_letter()
        l_sub[i] = ch
        r_sub[j] = ch
    for i in range(l_nd):
        if not l_sub[i]:
            l_sub[i] = fresh_letter()
    for j in range(r_nd):
        if not r_sub[j]:
            r_sub[j] = fresh_letter()
    out_sub = (
        [l_sub[i] for i in lb]
        + [l_sub[i] for i in range(l_nd) if i not in lb and i not in lc]
        + [r_sub[j] for j in range(r_nd) if j not in rb and j not in rc]
    )
    eqn_str = f"{''.join(l_sub)},{''.join(r_sub)}->{''.join(out_sub)}"
    out = b.add_node("Einsum", [ctx.get(lhs), ctx.get(rhs)], equation=eqn_str)[0]
    ctx.set(eqn.outvars[0], out)


def _reduce(ctx: _Ctx, eqn, op: str) -> None:
    b = ctx.b
    axes = [int(a) for a in eqn.params["axes"]]
    x = ctx.get(eqn.invars[0])
    if op == "ReduceSum":  # opset 13: axes is an input
        ax = b.add_init(np.asarray(axes, np.int64), "axes")
        out = b.add_node(op, [x, ax], keepdims=0)[0]
    else:
        out = b.add_node(op, [x], axes=axes, keepdims=0)[0]
    ctx.set(eqn.outvars[0], out)


def _broadcast_in_dim(ctx: _Ctx, eqn) -> None:
    b = ctx.b
    shape = [int(s) for s in eqn.params["shape"]]
    bdims = [int(d) for d in eqn.params["broadcast_dimensions"]]
    x = ctx.get(eqn.invars[0])
    in_shape = eqn.invars[0].aval.shape
    # reshape input so its dims land at bdims, size-1 elsewhere
    mid = [1] * len(shape)
    for src, dst in enumerate(bdims):
        mid[dst] = int(in_shape[src])
    if list(in_shape) != mid:
        shp = b.add_init(np.asarray(mid, np.int64), "shape")
        x = b.add_node("Reshape", [x, shp])[0]
    tgt = b.add_init(np.asarray(shape, np.int64), "shape")
    out = b.add_node("Expand", [x, tgt])[0]
    ctx.set(eqn.outvars[0], out)


def _pad(ctx: _Ctx, eqn) -> None:
    b = ctx.b
    cfg = eqn.params["padding_config"]
    if any(interior != 0 for _, _, interior in cfg):
        # interior (dilated) padding — used by dysample_local's subpixel
        # interleave. ONNX Pad has no dilation; expand each dilated dim as
        # concat([x, zeros], new_axis) + reshape: x lands at stride
        # (interior+1) positions, then edge lo/hi pads apply normally.
        x = ctx.get(eqn.invars[0])
        shape = [int(d) for d in eqn.invars[0].aval.shape]
        pv = eqn.invars[1]
        if not (hasattr(pv, "val") and float(np.asarray(pv.val)) == 0.0):
            raise NotImplementedError("interior padding with nonzero value")
        np_dt = np.dtype(eqn.invars[0].aval.dtype)
        for d, (_, _, interior) in enumerate(cfg):
            if interior == 0:
                continue
            # (..., n_d, ...) -> (..., n_d, 1, ...) concat zeros -> reshape
            mid = shape[:d + 1] + [1] + shape[d + 1:]
            shp = b.add_init(np.asarray(mid, np.int64), "shape")
            xr = b.add_node("Reshape", [x, shp])[0]
            ztile = mid.copy()
            ztile[d + 1] = interior
            zeros = b.add_init(np.zeros(ztile, np_dt), "zeros")
            cat = b.add_node("Concat", [xr, zeros], axis=d + 1)[0]
            shape = shape.copy()
            shape[d] = shape[d] * (interior + 1)
            shp2 = b.add_init(np.asarray(shape, np.int64), "shape")
            x = b.add_node("Reshape", [cat, shp2])[0]
        # now trim the trailing interior zeros and apply lo/hi edge pads:
        # dilation appended `interior` zeros after the LAST element too;
        # fold that into the hi pad (hi_eff = hi - interior)
        lo = [int(c[0]) for c in cfg]
        hi = [int(c[1]) - int(c[2]) for c in cfg]
        starts = [0] * len(shape)
        ends = [shape[i] + min(0, hi[i]) for i in range(len(shape))]
        if any(e != s for e, s in zip(ends, shape)):
            st = b.add_init(np.asarray(starts, np.int64), "st")
            en = b.add_init(np.asarray(ends, np.int64), "en")
            x = b.add_node("Slice", [x, st, en])[0]
        hi = [max(0, v) for v in hi]
        if any(lo) or any(hi):
            pads = b.add_init(np.asarray(lo + hi, np.int64), "pads")
            cval = b.add_init(np.zeros((), np_dt), "value")
            x = b.add_node("Pad", [x, pads, cval])[0]
        ctx.set(eqn.outvars[0], x)
        return
    lo = [int(c[0]) for c in cfg]
    hi = [int(c[1]) for c in cfg]
    if any(v < 0 for v in lo + hi):
        # negative padding = slice
        x = ctx.get(eqn.invars[0])
        in_shape = eqn.invars[0].aval.shape
        starts = [max(0, -l) for l in lo]
        ends = [int(in_shape[i]) + min(0, hi[i]) for i in range(len(hi))]
        st = b.add_init(np.asarray(starts, np.int64), "st")
        en = b.add_init(np.asarray(ends, np.int64), "en")
        out = b.add_node("Slice", [x, st, en])[0]
        lo = [max(0, l) for l in lo]
        hi = [max(0, h) for h in hi]
        if any(lo) or any(hi):
            pads = b.add_init(np.asarray(lo + hi, np.int64), "pads")
            cval = ctx.get(eqn.invars[1])
            out = b.add_node("Pad", [out, pads, cval], mode="constant")[0]
        ctx.set(eqn.outvars[0], out)
        return
    x = ctx.get(eqn.invars[0])
    pads = b.add_init(np.asarray(lo + hi, np.int64), "pads")
    cval = ctx.get(eqn.invars[1])
    out = b.add_node("Pad", [x, pads, cval], mode="constant")[0]
    ctx.set(eqn.outvars[0], out)


def _reduce_window(ctx: _Ctx, eqn) -> None:
    """max/avg pooling over NHWC windows."""
    b = ctx.b
    p = eqn.params
    prim = eqn.primitive.name  # reduce_window_max / reduce_window_sum
    dims = list(p["window_dimensions"])
    strides = list(p["window_strides"])
    pads = [list(x) for x in p["padding"]]
    nd = len(dims)
    # pooling dims must be the middle (spatial) dims of an NHWC tensor
    if dims[0] != 1 or dims[-1] != 1:
        raise NotImplementedError(f"unsupported reduce_window dims {dims}")
    x = ctx.get(eqn.invars[0])
    to_nchw = [0, nd - 1, *range(1, nd - 1)]
    x_nchw = b.add_node("Transpose", [x], perm=to_nchw)[0]
    k = dims[1:-1]
    s = strides[1:-1]
    pd = pads[1:-1]
    onnx_pads = [q[0] for q in pd] + [q[1] for q in pd]
    op = "MaxPool" if prim == "reduce_window_max" else "AveragePool"
    y = b.add_node(op, [x_nchw], kernel_shape=k, strides=s, pads=onnx_pads)[0]
    inv = [0] * nd
    for onnx_axis, jax_axis in enumerate([0, nd - 1, *range(1, nd - 1)]):
        inv[jax_axis] = onnx_axis
    out = b.add_node("Transpose", [y], perm=inv)[0]
    ctx.set(eqn.outvars[0], out)


def _gather_index(ctx: _Ctx, eqn) -> None:
    """jnp.take(x, idx, axis=a) pattern -> ONNX Gather(axis=a)."""
    b = ctx.b
    p = eqn.params
    dn = p["dimension_numbers"]
    x_shape = eqn.invars[0].aval.shape
    slice_sizes = list(p["slice_sizes"])
    if (
        len(dn.start_index_map) == 1
        and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)
        and slice_sizes[dn.start_index_map[0]] == 1
        and all(
            slice_sizes[d] == x_shape[d]
            for d in range(len(x_shape))
            if d != dn.start_index_map[0]
        )
    ):
        axis = int(dn.start_index_map[0])
        x = ctx.get(eqn.invars[0])
        idx = ctx.get(eqn.invars[1])
        idx_shape = eqn.invars[1].aval.shape
        shp = b.add_init(np.asarray(idx_shape[:-1], np.int64), "shape")
        idx2 = b.add_node("Reshape", [idx, shp])[0]
        idx64 = b.add_node("Cast", [idx2], to=proto.INT64)[0]
        out = b.add_node("Gather", [x, idx64], axis=axis)[0]
        ctx.set(eqn.outvars[0], out)
        return
    # batched coordinate gather (grid_sample/DySample bilinear taps):
    # indices (..., k) pick the k leading operand dims, trailing dims kept
    # whole -> ONNX GatherND. Indices are pre-clamped per component because
    # jax gather clips out-of-bounds starts while GatherND does not.
    k = len(dn.start_index_map)
    idx_shape = eqn.invars[1].aval.shape
    if (
        tuple(dn.start_index_map) == tuple(range(k))
        and tuple(dn.collapsed_slice_dims) == tuple(range(k))
        and all(slice_sizes[d] == 1 for d in range(k))
        and all(slice_sizes[d] == x_shape[d] for d in range(k, len(x_shape)))
        and idx_shape[-1] == k
    ):
        x = ctx.get(eqn.invars[0])
        idx = ctx.get(eqn.invars[1])
        lo = b.add_init(np.zeros((k,), np.int64), "lo")
        hi = b.add_init(
            np.asarray([x_shape[d] - 1 for d in range(k)], np.int64), "hi"
        )
        idx64 = b.add_node("Cast", [idx], to=proto.INT64)[0]
        idx64 = b.add_node("Max", [idx64, lo])[0]
        idx64 = b.add_node("Min", [idx64, hi])[0]
        out = b.add_node("GatherND", [x, idx64])[0]
        ctx.set(eqn.outvars[0], out)
        return
    raise NotImplementedError(f"gather pattern unsupported: {dn} sizes={slice_sizes}")


_COMPLEX_STRUCTURAL = {
    "transpose", "reshape", "pad", "slice", "concatenate",
    "broadcast_in_dim", "rev", "squeeze", "dynamic_slice",
}


def _is_complex(atom) -> bool:
    aval = getattr(atom, "aval", None)
    if aval is not None:
        return np.issubdtype(aval.dtype, np.complexfloating)
    return np.issubdtype(np.asarray(atom.val).dtype, np.complexfloating)


def _dft_matmul(ctx, x_names, in_shape, mats, sub):
    """Einsum a (possibly complex) operand against complex matrices.
    x_names: (re, im) or (re, None) for real input; mats: (Mre, Mim) numpy.
    sub: einsum equation like '...hw,wk->...hk'. Returns (re, im) names."""
    b = ctx.b
    mre = b.add_init(np.ascontiguousarray(mats[0], dtype=np.float32), "dftr")
    mim = b.add_init(np.ascontiguousarray(mats[1], dtype=np.float32), "dfti")
    xr, xi = x_names

    def ein(a_name, m_name):
        return b.add_node("Einsum", [a_name, m_name], equation=sub)[0]

    rr = ein(xr, mre)
    ri = ein(xr, mim)
    if xi is None:
        return rr, ri
    ir = ein(xi, mre)
    ii = ein(xi, mim)
    re = b.add_node("Sub", [rr, ii])[0]
    im = b.add_node("Add", [ri, ir])[0]
    return re, im


def _emit_complex(ctx: _Ctx, eqn) -> None:  # noqa: PLR0912, PLR0915
    b = ctx.b
    prim = eqn.primitive.name

    if prim == "fft":
        ft = str(eqn.params["fft_type"])
        lengths = tuple(int(v) for v in eqn.params["fft_lengths"])
        x = eqn.invars[0]
        kind = {"FftType.FFT": "fft", "FftType.IFFT": "ifft",
                "FftType.RFFT": "rfft", "FftType.IRFFT": "irfft",
                "0": "fft", "1": "ifft", "2": "rfft", "3": "irfft"}[ft]
        if kind in ("rfft", "irfft") and len(lengths) == 2:
            h, w = lengths
            if kind == "rfft":
                kw = w // 2 + 1
                # matrices from impulse responses (robust to convention)
                fw = np.fft.rfft(np.eye(w), axis=1)          # (W, K)
                fh = np.fft.fft(np.eye(h), axis=1)           # (H, H')
                xr = ctx.get(x)
                re1, im1 = _dft_matmul(
                    ctx, (xr, None), None, (fw.real, fw.imag), "...hw,wk->...hk"
                )
                re2, im2 = _dft_matmul(
                    ctx, (re1, im1), None, (fh.real, fh.imag), "...hk,hg->...gk"
                )
                ctx.setc(eqn.outvars[0], (re2, im2))
                return
            # irfft2: complex (..., H, K) -> real (..., H, W)
            k_in = int(x.aval.shape[-1])
            gh = np.fft.ifft(np.eye(h), axis=1)              # (H, H')
            xr, xi = ctx.getc(x)
            re1, im1 = _dft_matmul(
                ctx, (xr, xi), None, (gh.real, gh.imag), "...hk,hg->...gk"
            )
            mr = np.stack(
                [np.fft.irfft(np.eye(k_in, dtype=np.complex64)[k], n=w)
                 for k in range(k_in)]
            )                                                # (K, W)
            mi = np.stack(
                [np.fft.irfft(1j * np.eye(k_in, dtype=np.complex64)[k], n=w)
                 for k in range(k_in)]
            )
            a = b.add_node(
                "Einsum", [re1, b.add_init(mr.astype(np.float32), "irr")],
                equation="...hk,kw->...hw",
            )[0]
            c = b.add_node(
                "Einsum", [im1, b.add_init(mi.astype(np.float32), "iri")],
                equation="...hk,kw->...hw",
            )[0]
            out = b.add_node("Add", [a, c])[0]
            ctx.set(eqn.outvars[0], out)
            return
        raise NotImplementedError(f"fft kind {ft} lengths {lengths}")

    if prim in _COMPLEX_STRUCTURAL:
        parts = []
        for comp in (0, 1):
            view = _CompView(ctx, comp)
            _emit_eqn(view, eqn, allow_complex=True)
            parts.append(view.out[eqn.outvars[0]])
        ctx.setc(eqn.outvars[0], (parts[0], parts[1]))
        return

    if prim == "real":
        ctx.set(eqn.outvars[0], ctx.getc(eqn.invars[0])[0])
        return
    if prim == "imag":
        ctx.set(eqn.outvars[0], ctx.getc(eqn.invars[0])[1])
        return
    if prim == "conj":
        re, im = ctx.getc(eqn.invars[0])
        ctx.setc(eqn.outvars[0], (re, b.add_node("Neg", [im])[0]))
        return
    if prim == "convert_element_type":
        src, dst = eqn.invars[0], eqn.outvars[0]
        if _is_complex(dst) and not _is_complex(src):
            re = ctx.get(src)
            zero = b.add_init(np.asarray(0.0, np.float32), "zero")
            im = b.add_node("Mul", [re, zero])[0]
            ctx.setc(dst, (re, im))
            return
        if _is_complex(dst) and _is_complex(src):
            ctx.setc(dst, ctx.getc(src))
            return
        # complex -> real: take the real part (jax semantics warn + real)
        ctx.set(dst, ctx.getc(src)[0])
        return
    if prim in ("add", "sub"):
        ar, ai = ctx.getc(eqn.invars[0])
        br, bi = ctx.getc(eqn.invars[1])
        op = "Add" if prim == "add" else "Sub"
        ctx.setc(eqn.outvars[0], (
            b.add_node(op, [ar, br])[0], b.add_node(op, [ai, bi])[0],
        ))
        return
    if prim == "mul":
        ar, ai = ctx.getc(eqn.invars[0])
        br, bi = ctx.getc(eqn.invars[1])
        rr = b.add_node("Mul", [ar, br])[0]
        ii = b.add_node("Mul", [ai, bi])[0]
        ri = b.add_node("Mul", [ar, bi])[0]
        ir = b.add_node("Mul", [ai, br])[0]
        ctx.setc(eqn.outvars[0], (
            b.add_node("Sub", [rr, ii])[0], b.add_node("Add", [ri, ir])[0],
        ))
        return
    if prim == "neg":
        re, im = ctx.getc(eqn.invars[0])
        ctx.setc(eqn.outvars[0], (
            b.add_node("Neg", [re])[0], b.add_node("Neg", [im])[0],
        ))
        return
    if prim == "abs":
        re, im = ctx.getc(eqn.invars[0])
        r2 = b.add_node("Mul", [re, re])[0]
        i2 = b.add_node("Mul", [im, im])[0]
        ctx.set(eqn.outvars[0], b.add_node(
            "Sqrt", [b.add_node("Add", [r2, i2])[0]]
        )[0])
        return
    raise NotImplementedError(f"complex primitive '{prim}' unsupported")


def _emit_eqn(ctx: _Ctx, eqn, allow_complex: bool = False) -> None:  # noqa: PLR0912, PLR0915
    b = ctx.b
    prim = eqn.primitive.name

    if not allow_complex and prim not in _CALL_PRIMS and any(
        _is_complex(v) for v in list(eqn.invars) + list(eqn.outvars)
        if hasattr(v, "aval") or isinstance(v, jcore.Literal)
    ):
        _emit_complex(ctx, eqn)
        return

    if prim in _CALL_PRIMS:
        sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
        if hasattr(sub, "jaxpr"):
            consts = sub.consts
            sub = sub.jaxpr
        else:
            consts = ()
        inner = _Ctx(b)
        for cv, cval in zip(sub.constvars, consts):
            cval_np = _np(cval)
            if np.issubdtype(cval_np.dtype, np.complexfloating):
                inner.setc(cv, (
                    b.add_init(cval_np.real.astype(np.float32), "cre"),
                    b.add_init(cval_np.imag.astype(np.float32), "cim"),
                ))
            else:
                inner.set(cv, b.add_init(cval_np, "const"))
        for iv, outer_atom in zip(sub.invars, eqn.invars):
            if _is_complex(outer_atom):
                inner.setc(iv, ctx.getc(outer_atom))
            else:
                inner.set(iv, ctx.get(outer_atom))
        for sub_eqn in sub.eqns:
            _emit_eqn(inner, sub_eqn)
        for ov, outer_ov in zip(sub.outvars, eqn.outvars):
            if _is_complex(ov):
                ctx.setc(outer_ov, inner.getc(ov))
            else:
                ctx.set(outer_ov, inner.get(ov))
        return

    if prim in _ELEMENTWISE:
        if prim == "atan2":
            raise NotImplementedError("atan2")
        ins = [ctx.get(v) for v in eqn.invars]
        out = b.add_node(_ELEMENTWISE[prim], ins)[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim in _COMPARE:
        ins = [ctx.get(v) for v in eqn.invars]
        out = b.add_node(_COMPARE[prim], ins)[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "ne":
        ins = [ctx.get(v) for v in eqn.invars]
        eq = b.add_node("Equal", ins)[0]
        out = b.add_node("Not", [eq])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "integer_pow":
        x = ctx.get(eqn.invars[0])
        y = int(eqn.params["y"])
        e = b.add_init(np.asarray(float(y), np.float32), "exp")
        out = b.add_node("Pow", [x, e])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "split":
        x = ctx.get(eqn.invars[0])
        sizes = [int(v) for v in eqn.params["sizes"]]
        axis = int(eqn.params["axis"])
        sz = b.add_init(np.asarray(sizes, np.int64), "sizes")
        outs = b.add_node("Split", [x, sz], n_out=len(sizes), axis=axis)
        for ov, name_ in zip(eqn.outvars, outs):
            ctx.set(ov, name_)
        return
    if prim == "square":
        x = ctx.get(eqn.invars[0])
        out = b.add_node("Mul", [x, x])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "log1p":
        # softplus/mish chains: log1p(x) = Log(x + 1)
        x = ctx.get(eqn.invars[0])
        one = b.add_init(np.asarray(1.0, np.float32), "one")
        s = b.add_node("Add", [x, one])[0]
        out = b.add_node("Log", [s])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "sort":
        # lax.sort along the last axis. Stable integer-key sorts (argsort's
        # lowering: sort[keys, iota]) use a unique composite key
        # key*n + iota so the non-stable ONNX TopK yields the stable order;
        # payloads follow via GatherElements.
        dim = int(eqn.params["dimension"])
        nd = len(eqn.invars[0].aval.shape)
        if dim != nd - 1:
            raise NotImplementedError("sort only supported on the last axis")
        num_keys = int(eqn.params.get("num_keys", 1))
        if num_keys != 1:
            raise NotImplementedError("multi-key sort unsupported")
        keys_var = eqn.invars[0]
        n = int(keys_var.aval.shape[-1])
        keys = ctx.get(keys_var)
        kdt = keys_var.aval.dtype
        if eqn.params.get("is_stable", False) and np.issubdtype(kdt, np.integer):
            k64 = b.add_node("Cast", [keys], to=proto.INT64)[0]
            nn_ = b.add_init(np.asarray(n, np.int64), "n")
            iota = b.add_init(
                np.broadcast_to(
                    np.arange(n, dtype=np.int64),
                    tuple(keys_var.aval.shape),
                ).copy(),
                "iota",
            )
            comp = b.add_node("Add", [b.add_node("Mul", [k64, nn_])[0], iota])[0]
        else:
            comp = keys
        kk = b.add_init(np.asarray([n], np.int64), "k")
        _vals, idx = b.add_node(
            "TopK", [comp, kk], n_out=2, axis=-1, largest=0, sorted=1
        )
        for v_in, v_out in zip(eqn.invars, eqn.outvars):
            src = ctx.get(v_in)
            g = b.add_node("GatherElements", [src, idx], axis=nd - 1)[0]
            ctx.set(v_out, g)
        return
    if prim == "argmax":
        x = ctx.get(eqn.invars[0])
        axes = eqn.params["axes"]
        assert len(axes) == 1, "argmax over multiple axes unsupported"
        out = b.add_node("ArgMax", [x], axis=int(axes[0]), keepdims=0)[0]
        # jax argmax returns index_dtype (int32 default); ArgMax emits int64
        dt = eqn.outvars[0].aval.dtype
        if dt == np.int32:
            out = b.add_node("Cast", [out], to=proto.INT32)[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "dynamic_slice":
        x = ctx.get(eqn.invars[0])
        sizes = [int(s) for s in eqn.params["slice_sizes"]]
        dims = eqn.invars[0].aval.shape
        nd = len(dims)
        # start scalars -> (nd,) int64 tensor, clamped like jax (start is
        # clipped so the full slice stays in bounds)
        parts = []
        zero_ax = b.add_init(np.asarray([0], np.int64), "ax0")
        for v in eqn.invars[1:]:
            sv = b.add_node("Cast", [ctx.get(v)], to=proto.INT64)[0]
            parts.append(b.add_node("Unsqueeze", [sv, zero_ax])[0])
        starts = b.add_node("Concat", parts, axis=0)[0]
        lo = b.add_init(np.zeros((nd,), np.int64), "lo")
        hi = b.add_init(
            np.asarray([dims[d] - sizes[d] for d in range(nd)], np.int64), "hi"
        )
        starts = b.add_node("Max", [starts, lo])[0]
        starts = b.add_node("Min", [starts, hi])[0]
        szs = b.add_init(np.asarray(sizes, np.int64), "sz")
        ends = b.add_node("Add", [starts, szs])[0]
        axes = b.add_init(np.asarray(list(range(nd)), np.int64), "axes")
        out = b.add_node("Slice", [x, starts, ends, axes])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "tile":
        x = ctx.get(eqn.invars[0])
        reps = [int(r) for r in eqn.params["reps"]]
        # jnp.tile left-pads reps to the operand rank; ONNX Tile wants one
        # repeat per axis
        rank = len(eqn.invars[0].aval.shape)
        reps = [1] * (rank - len(reps)) + reps if len(reps) < rank else reps
        r = b.add_init(np.asarray(reps, np.int64), "reps")
        out = b.add_node("Tile", [x, r])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "expm1":
        x = ctx.get(eqn.invars[0])
        e = b.add_node("Exp", [x])[0]
        one = b.add_init(np.asarray(1.0, np.float32), "one")
        out = b.add_node("Sub", [e, one])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "erfc":
        x = ctx.get(eqn.invars[0])
        e = b.add_node("Erf", [x])[0]
        one = b.add_init(np.asarray(1.0, np.float32), "one")
        out = b.add_node("Sub", [one, e])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "is_finite":
        # inference graphs treat inputs as finite; IsInf/IsNaN compose
        x = ctx.get(eqn.invars[0])
        isnan = b.add_node("IsNaN", [x])[0]
        isinf = b.add_node("IsInf", [x])[0]
        bad = b.add_node("Or", [isnan, isinf])[0]
        out = b.add_node("Not", [bad])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "rsqrt":
        x = ctx.get(eqn.invars[0])
        s = b.add_node("Sqrt", [x])[0]
        out = b.add_node("Reciprocal", [s])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "clamp":
        lo, x, hi = (ctx.get(v) for v in eqn.invars)
        out = b.add_node("Clip", [x, lo, hi])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "select_n":
        pred, a0, a1 = (ctx.get(v) for v in eqn.invars[:3])
        # select_n(pred, on_false, on_true) -> Where(pred, on_true, on_false)
        out = b.add_node("Where", [pred, a1, a0])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "convert_element_type":
        x = ctx.get(eqn.invars[0])
        dt = np.dtype(eqn.params["new_dtype"])
        onnx_dt = proto.NP_TO_ONNX.get(dt)
        if onnx_dt is None:
            raise NotImplementedError(f"cast to {dt}")
        out = b.add_node("Cast", [x], to=onnx_dt)[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "reshape":
        x = ctx.get(eqn.invars[0])
        shp = b.add_init(
            np.asarray([int(s) for s in eqn.params["new_sizes"]], np.int64), "shape"
        )
        out = b.add_node("Reshape", [x, shp])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "squeeze":
        x = ctx.get(eqn.invars[0])
        shp = b.add_init(
            np.asarray([int(s) for s in eqn.outvars[0].aval.shape], np.int64), "shape"
        )
        out = b.add_node("Reshape", [x, shp])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "expand_dims":
        x = ctx.get(eqn.invars[0])
        shp = b.add_init(
            np.asarray([int(s) for s in eqn.outvars[0].aval.shape], np.int64), "shape"
        )
        out = b.add_node("Reshape", [x, shp])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "transpose":
        x = ctx.get(eqn.invars[0])
        out = b.add_node(
            "Transpose", [x], perm=[int(p) for p in eqn.params["permutation"]]
        )[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "concatenate":
        ins = [ctx.get(v) for v in eqn.invars]
        out = b.add_node("Concat", ins, axis=int(eqn.params["dimension"]))[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "slice":
        x = ctx.get(eqn.invars[0])
        starts = [int(s) for s in eqn.params["start_indices"]]
        ends = [int(s) for s in eqn.params["limit_indices"]]
        steps = eqn.params.get("strides")
        steps = [int(s) for s in steps] if steps else [1] * len(starts)
        st = b.add_init(np.asarray(starts, np.int64), "st")
        en = b.add_init(np.asarray(ends, np.int64), "en")
        ax = b.add_init(np.asarray(list(range(len(starts))), np.int64), "ax")
        sp = b.add_init(np.asarray(steps, np.int64), "sp")
        out = b.add_node("Slice", [x, st, en, ax, sp])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "rev":
        x = ctx.get(eqn.invars[0])
        shape = eqn.invars[0].aval.shape
        dims = [int(d) for d in eqn.params["dimensions"]]
        st = b.add_init(np.asarray([int(shape[d]) - 1 for d in dims], np.int64), "st")
        en = b.add_init(np.asarray([-(2**31)] * len(dims), np.int64), "en")
        ax = b.add_init(np.asarray(dims, np.int64), "ax")
        sp = b.add_init(np.asarray([-1] * len(dims), np.int64), "sp")
        out = b.add_node("Slice", [x, st, en, ax, sp])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "iota":
        dt = np.dtype(eqn.params["dtype"])
        shape = [int(s) for s in eqn.params["shape"]]
        dim = int(eqn.params["dimension"])
        vals = np.arange(shape[dim], dtype=dt)
        target = np.broadcast_to(
            vals.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape
        )
        ctx.set(eqn.outvars[0], b.add_init(np.ascontiguousarray(target), "iota"))
        return
    if prim in ("reduce_sum",):
        _reduce(ctx, eqn, "ReduceSum")
        return
    if prim == "reduce_max":
        _reduce(ctx, eqn, "ReduceMax")
        return
    if prim == "reduce_min":
        _reduce(ctx, eqn, "ReduceMin")
        return
    if prim == "broadcast_in_dim":
        _broadcast_in_dim(ctx, eqn)
        return
    if prim == "conv_general_dilated":
        _conv(ctx, eqn)
        return
    if prim == "dot_general":
        _dot_general(ctx, eqn)
        return
    if prim == "pad":
        _pad(ctx, eqn)
        return
    if prim in ("reduce_window_max", "reduce_window_sum"):
        _reduce_window(ctx, eqn)
        return
    if prim == "gather":
        _gather_index(ctx, eqn)
        return
    if prim in ("stop_gradient", "copy"):
        ctx.set(eqn.outvars[0], ctx.get(eqn.invars[0]))
        return
    if prim == "exp2":
        x = ctx.get(eqn.invars[0])
        two = b.add_init(np.asarray(2.0, np.float32), "two")
        out = b.add_node("Pow", [two, x])[0]
        ctx.set(eqn.outvars[0], out)
        return
    if prim == "cumsum":
        x = ctx.get(eqn.invars[0])
        ax = b.add_init(np.asarray(int(eqn.params["axis"]), np.int64), "ax")
        out = b.add_node("CumSum", [x, ax])[0]
        ctx.set(eqn.outvars[0], out)
        return
    raise NotImplementedError(f"ONNX export: unsupported primitive '{prim}'")


def _peephole_cancel_transposes(g: "proto.Graph") -> None:
    """(verification-time only; emitted files keep the sandwiches — ORT's
    optimizer folds them at load.)"""


def export_onnx(
    fn, example_input: np.ndarray, path: str,
    input_name: str = "input", output_name: str = "output",
    dynamic_batch: bool = True,
    fp16: bool = False,
) -> bytes:
    """Trace fn(example_input) and write an ONNX model to path.

    fp16=True emits a half-precision model: float initializers convert to
    float16 and the graph's float input/output are declared FLOAT16 (the
    reference's convert_to_onnx fp16 conversion, without the ORT pass)."""
    closed = jax.make_jaxpr(fn)(example_input)
    jaxpr = closed.jaxpr

    b = OnnxBuilder(fp16=fp16)
    ctx = _Ctx(b)
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        ctx.known[cv] = _np(cval)
    assert len(jaxpr.invars) == 1, "single-input export only"
    ctx.set(jaxpr.invars[0], input_name)

    # constant folding: any eqn whose inputs are all compile-time constants
    # evaluates at export time (e.g. trace-built identity kernels via
    # .at[].set -> scatter, iota position grids) instead of needing an ONNX
    # lowering; results materialize as initializers lazily
    _NO_FOLD = {"pjit", "custom_jvp_call", "custom_vjp_call", "scan",
                "while", "cond", "remat", "checkpoint"}
    for eqn in jaxpr.eqns:
        vals = []
        foldable = eqn.primitive.name not in _NO_FOLD
        for v in eqn.invars:
            if isinstance(v, jcore.Literal):
                vals.append(v.val)
            elif v in ctx.known:
                vals.append(ctx.known[v])
            else:
                foldable = False
                break
        if foldable:
            try:
                out = eqn.primitive.bind(*vals, **eqn.params)
            except Exception:
                out = None
            if out is not None:
                outs = out if eqn.primitive.multiple_results else [out]
                for ov, o in zip(eqn.outvars, outs):
                    ctx.known[ov] = np.asarray(o)
                continue
        _emit_eqn(ctx, eqn)

    out_src = ctx.get(jaxpr.outvars[0])
    # ONNX graph outputs must be produced by a node with that exact name
    b.nodes.append(proto.node_proto("Identity", [out_src], [output_name]))

    in_shape = tuple(example_input.shape)
    out_aval = jaxpr.outvars[0].aval
    if dynamic_batch:
        in_shape = ("batch", *in_shape[1:])
        out_shape = ("batch", *out_aval.shape[1:])
    else:
        out_shape = tuple(out_aval.shape)
    in_dt = proto.NP_TO_ONNX[np.dtype(example_input.dtype)]
    out_dt = proto.NP_TO_ONNX[np.dtype(out_aval.dtype)]
    if fp16:
        if in_dt == proto.FLOAT:
            in_dt = proto.FLOAT16
        if out_dt == proto.FLOAT:
            out_dt = proto.FLOAT16
    graph = proto.graph_proto(
        "main",
        b.nodes,
        b.initializers,
        [proto.value_info(input_name, in_dt, in_shape)],
        [proto.value_info(output_name, out_dt, out_shape)],
    )
    model = proto.model_proto(graph, opset=13)
    with open(path, "wb") as f:
        f.write(model)
    return model
