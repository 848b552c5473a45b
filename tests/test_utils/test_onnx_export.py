"""jaxpr->ONNX exporter: emission + numeric verification via the bundled
numpy evaluator (replaces the reference's torch.onnx.export + ORT verify)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs import build_network
from trainner_redux_tpu.onnx import proto
from trainner_redux_tpu.onnx.export import export_onnx
from trainner_redux_tpu.onnx.runtime import run_model


def _export_case(opt: dict, hw: int, tmp_path, atol=1e-4, rtol=None) -> proto.Graph:
    net = build_network(dict(opt))
    x = np.random.default_rng(0).random((1, hw, hw, 3), np.float32)
    params = net.init(jax.random.key(0), jnp.asarray(x), train=False)

    def fwd(inp):
        h = jnp.transpose(inp, (0, 2, 3, 1))
        y = net.apply(params, h, train=False)
        return jnp.transpose(y, (0, 3, 1, 2))

    x_nchw = np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    path = str(tmp_path / "m.onnx")
    model = export_onnx(fwd, x_nchw, path)
    ref = np.asarray(fwd(jnp.asarray(x_nchw)))
    got = run_model(model, {"input": x_nchw})[0]
    assert got.shape == ref.shape
    diff = float(np.abs(ref - got).max())
    if rtol is not None:
        scale = max(float(np.abs(ref).max()), 1e-6)
        assert diff / scale < rtol, f"onnx rel mismatch {diff / scale} (abs {diff})"
    else:
        assert diff < atol, f"onnx mismatch {diff}"
    with open(path, "rb") as f:
        assert f.read() == model
    return proto.parse_model(model)


def test_export_compact(tmp_path):
    g = _export_case(
        {"type": "compact", "scale": 2, "num_feat": 8, "num_conv": 2}, 16, tmp_path
    )
    assert g.inputs == ["input"] and g.outputs == ["output"]
    assert g.input_info["input"][0] == "batch"  # dynamic batch dim
    assert any(n.op_type == "Conv" for n in g.nodes)


def test_export_span(tmp_path):
    _export_case({"type": "span_f32", "scale": 2}, 16, tmp_path)


@pytest.mark.slow
@pytest.mark.parametrize(
    "opt,hw",
    [
        ({"type": "esrgan_lite", "scale": 2, "num_blocks": 1, "num_filters": 8}, 16),
        ({"type": "realcugan", "scale": 2}, 32),
        ({"type": "plksr_tiny", "scale": 2, "dim": 16, "n_blocks": 1}, 16),
        ({"type": "swinir_s", "scale": 2, "embed_dim": 16, "depths": [2],
          "num_heads": [2], "drop_path_rate": 0.0}, 32),
        ({"type": "dat", "scale": 2, "embed_dim": 16, "depth": [2],
          "num_heads": [2], "split_size": [2, 4], "drop_path_rate": 0.0}, 32),
        ({"type": "hat", "scale": 2, "embed_dim": 16, "depths": [2],
          "num_heads": [2], "window_size": 4, "compress_ratio": 2,
          "squeeze_factor": 4, "drop_path_rate": 0.0, "num_feat": 16}, 32),
        ({"type": "sebica_mini", "scale": 2}, 16),
        ({"type": "rtmosr", "scale": 2, "dim": 16}, 16),
        # shallow config: deep random-init ELAN amplifies activations
        # chaotically (saturated softmax), which is an ill-conditioned
        # comparison, not an export defect
        ({"type": "elan", "scale": 2, "m_elan": 4, "c_elan": 30,
          "window_sizes": [2, 4, 8]}, 16),
        ({"type": "rcan", "scale": 2, "n_resgroups": 1, "n_resblocks": 1,
          "n_feats": 16}, 16),
        ({"type": "spanplus", "scale": 2, "feature_channels": 16}, 16),
        ({"type": "realplksr", "scale": 2, "dim": 16, "n_blocks": 1,
          "upsampler": "dysample"}, 16),
        ({"type": "lkfmixer_t", "scale": 2}, 16),
        ({"type": "moesr2", "scale": 2, "dim": 16, "n_blocks": 1, "n_block": 1}, 16),
        ({"type": "paragonsr2_realtime", "scale": 2, "num_feat": 16,
          "num_groups": 1, "num_blocks": 1}, 16),
        ({"type": "paragonsr2_photo", "scale": 2, "num_feat": 16,
          "num_groups": 1, "num_blocks": 1, "window_size": 8}, 16),
        ({"type": "fdat", "scale": 2, "embed_dim": 16, "num_groups": 1,
          "depth_per_group": 1, "num_heads": 2, "window_size": 4,
          "drop_path_rate": 0.0}, 32),
        # upstream-composition rebuilds (spandrel families)
        ({"type": "omnisr", "scale": 2, "num_feat": 16, "res_num": 1,
          "block_num": 1, "window_size": 4}, 16),
        ({"type": "ditn_real", "scale": 2, "dim": 12, "ITL_blocks": 1,
          "SAL_blocks": 1}, 16),
        ({"type": "rgt_s", "scale": 2, "embed_dim": 16, "depth": (2,),
          "num_heads": (2,), "split_size": (4, 8)}, 16),
        ({"type": "grl_t", "scale": 2, "embed_dim": 16, "depths": (2,),
          "num_heads_window": (2,), "num_heads_stripe": (2,),
          "window_size": 8, "stripe_size": (8, 8)}, 16),
    ],
    ids=lambda o: o["type"] if isinstance(o, dict) else str(o),
)
def test_export_zoo(opt, hw, tmp_path):
    _export_case(opt, hw, tmp_path)


@pytest.mark.slow
def test_export_fft_archs(tmp_path):
    """FFT-based archs: rfft2/irfft2 lower to DFT-matrix Einsums with
    complex tensors carried as (re, im) pairs."""
    _export_case({"type": "gfisrv2", "scale": 2}, 16, tmp_path, atol=1e-3)
    # lawfft multiplies by img_range 255 through deep FFT chains: random-init
    # outputs reach ~1e7, so compare relative
    _export_case({"type": "lawfft", "scale": 2}, 16, tmp_path, rtol=1e-4)


@pytest.mark.slow
def test_export_atd(tmp_path):
    """ATD: stable argsort token grouping lowers via unique-composite TopK +
    GatherElements. Tolerance is loose because near-tie category argmaxes
    can flip between XLA-f32 and the numpy evaluator, regrouping a few
    tokens — an evaluation sensitivity, not a lowering defect."""
    _export_case({"type": "atd_light", "scale": 2}, 16, tmp_path, atol=2e-2)


def test_export_fp16(tmp_path):
    """fp16 emission: half-size model, FLOAT16 graph I/O, f16-level error."""
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.onnx.export import export_onnx
    from trainner_redux_tpu.onnx.runtime import run_model

    net = build_network({"type": "superultracompact", "scale": 2})
    x = np.random.default_rng(0).random((1, 16, 16, 3), np.float32)
    params = net.init(jax.random.key(0), jnp.asarray(x), train=False)

    def fwd(inp):
        h = jnp.transpose(inp, (0, 2, 3, 1))
        return jnp.transpose(net.apply(params, h, train=False), (0, 3, 1, 2))

    xn = np.ascontiguousarray(x.transpose(0, 3, 1, 2))
    m32 = export_onnx(fwd, xn, str(tmp_path / "a.onnx"))
    m16 = export_onnx(fwd, xn, str(tmp_path / "b.onnx"), fp16=True)
    assert len(m16) < 0.6 * len(m32)
    ref = np.asarray(fwd(jnp.asarray(xn)))
    got = run_model(m16, {"input": xn.astype(np.float16)})[0]
    assert float(np.abs(ref - got.astype(np.float32)).max()) < 5e-3


def test_proto_roundtrip():
    """Writer output parses back identically (tensor payloads included)."""
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    t = proto.tensor_proto("w", arr)
    name, back = proto._parse_tensor(t)
    assert name == "w"
    np.testing.assert_array_equal(back, arr)

    node = proto.node_proto("Conv", ["x", "w"], ["y"], strides=[2, 2], group=4)
    f = proto.parse_message(node)
    assert f[4][0] == b"Conv"


def _fwd_and_sample(opt: dict, hw: int = 16):
    net = build_network(dict(opt))
    x = np.random.default_rng(0).random((1, hw, hw, 3), np.float32)
    params = net.init(jax.random.key(0), jnp.asarray(x), train=False)

    def fwd(inp):
        h = jnp.transpose(inp, (0, 2, 3, 1))
        return jnp.transpose(net.apply(params, h, train=False), (0, 3, 1, 2))

    return fwd, np.ascontiguousarray(x.transpose(0, 3, 1, 2))


def test_optimize_pass(tmp_path):
    """The onnxslim/ORT-equivalent post-pass (optimize.py) shrinks the
    graph (the tracer's NHWC<->NCHW transpose sandwiches cancel, constant
    subgraphs fold) and the optimized model stays numerically identical."""
    from trainner_redux_tpu.onnx.optimize import optimize_model

    fwd, xn = _fwd_and_sample({"type": "compact", "scale": 2, "num_feat": 8,
                               "num_conv": 2})
    m = export_onnx(fwd, xn, str(tmp_path / "m.onnx"))
    m2, stats = optimize_model(m)
    assert stats["nodes_after"] < stats["nodes_before"]
    ref = run_model(m, {"input": xn})[0]
    got = run_model(m2, {"input": xn})[0]
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # I/O contract unchanged
    g2 = proto.parse_model(m2)
    assert g2.inputs == ["input"] and g2.outputs == ["output"]
    assert g2.input_info["input"][0] == "batch"


def test_optimize_transpose_cancellation():
    """Adjacent inverse transposes cancel; non-inverse pairs merge."""
    from trainner_redux_tpu.onnx.optimize import optimize_model

    def fwd(x):
        y = jnp.transpose(x, (0, 2, 3, 1))
        y = jnp.transpose(y, (0, 3, 1, 2))  # cancels
        return y * 2.0

    xn = np.random.default_rng(0).random((1, 3, 8, 8), np.float32)
    m = export_onnx(fwd, xn, "/dev/null")
    m2, _ = optimize_model(m)
    g2 = proto.parse_model(m2)
    assert not any(n.op_type == "Transpose" for n in g2.nodes)
    np.testing.assert_allclose(
        run_model(m2, {"input": xn})[0], np.asarray(fwd(jnp.asarray(xn))),
        atol=1e-6,
    )


def test_mixed_fp16_pass(tmp_path):
    """Reference bf16 policy (convert_to_onnx.py:122-148): mixed
    precision with fp32 I/O, ConvTranspose + depthwise convs excluded.
    Depthwise/ConvTranspose weights must stay fp32; other conv weights
    become fp16; I/O dtypes stay FLOAT."""
    from trainner_redux_tpu.onnx.precision import to_mixed_fp16

    # spanplus has depthwise convs + ConvTranspose-free upsampling;
    # use a hand-rolled function with both op kinds instead
    k_dw = np.random.default_rng(1).random((4, 1, 3, 3), np.float32) * 0.1
    k_pw = np.random.default_rng(2).random((4, 4, 1, 1), np.float32) * 0.1

    def fwd(x):
        import jax.lax as lax

        y = lax.conv_general_dilated(
            x, jnp.asarray(k_dw), (1, 1), "SAME", feature_group_count=4,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = lax.conv_general_dilated(
            y, jnp.asarray(k_pw), (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y

    xn = np.random.default_rng(0).random((1, 4, 8, 8), np.float32)
    m = export_onnx(fwd, xn, "/dev/null")
    m16 = to_mixed_fp16(m, exclude_depthwise=True, keep_io_types=True)
    g = proto.parse_model(m16)
    # I/O stays fp32
    _, io_dtypes = proto.parse_io_info(m16)
    assert io_dtypes["input"] == proto.FLOAT
    assert io_dtypes["output"] == proto.FLOAT
    convs = [n for n in g.nodes if n.op_type == "Conv"]
    assert len(convs) == 2
    dw = next(n for n in convs if int(n.attrs.get("group", 1)) == 4)
    pw = next(n for n in convs if int(n.attrs.get("group", 1)) == 1)
    assert g.initializers[dw.inputs[1]].dtype == np.float32
    assert g.initializers[pw.inputs[1]].dtype == np.float16
    ref = run_model(m, {"input": xn})[0]
    got = run_model(m16, {"input": xn})[0]
    assert got.dtype == np.float32
    assert float(np.abs(ref - got).max()) < 5e-3


@pytest.mark.slow
def test_mixed_fp16_full_arch(tmp_path):
    """End-to-end mixed pass over a real arch export, optimizer included
    (the convert_to_onnx.py bf16 path)."""
    from trainner_redux_tpu.onnx.optimize import optimize_model
    from trainner_redux_tpu.onnx.precision import to_mixed_fp16

    fwd, xn = _fwd_and_sample({"type": "spanplus_st", "scale": 2})
    m = export_onnx(fwd, xn, str(tmp_path / "m.onnx"))
    m, _ = optimize_model(m)
    m16 = to_mixed_fp16(m, exclude_depthwise=True, keep_io_types=True)
    ref = np.asarray(fwd(jnp.asarray(xn)))
    got = run_model(m16, {"input": xn})[0]
    assert got.dtype == np.float32
    assert float(np.abs(ref - got).max()) < 5e-2
