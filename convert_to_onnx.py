"""Model export entry point (parity: /root/reference/convert_to_onnx.py).

The reference exports torch models to ONNX via dynamo/legacy exporters and
optimizes with ORT/onnxslim. The TPU-native equivalents emitted here:

- **StableHLO** (`.stablehlo.mlir` + serialized `jax.export` artifact): the
  portable compiler-level format for JAX models (loadable from C++/IREE/
  OpenXLA toolchains — the ONNX analogue of the XLA ecosystem).
- **ONNX** (`.onnx`, opset 13): a real ONNX protobuf emitted directly from
  the model's jaxpr (trainner_redux_tpu/onnx/) — runs in onnxruntime/
  chaiNNer, NCHW input/output like the reference's exports; numerically
  verified in-process against the JAX forward with the bundled numpy
  evaluator (onnxruntime is not installed here).
- **TF SavedModel** via jax2tf (TF-Serving/TFLite pipelines).
- **torch-layout safetensors** for arch families with registered exporters
  (chaiNNer/OpenModelDB interop).

Numeric verification compares the exported function against the JAX forward
(the reference's `onnx.verify` equivalent).

Usage: python convert_to_onnx.py -opt <config.yml>
"""

from __future__ import annotations

import os
import sys
from os import path as osp

import numpy as np

if os.environ.get("TRAINNER_PLATFORM"):
    os.environ["JAX_PLATFORMS"] = os.environ["TRAINNER_PLATFORM"]
    import jax

    jax.config.update("jax_platforms", os.environ["TRAINNER_PLATFORM"])


def parse_input_shape(shape: str) -> tuple[int, ...]:
    """'1x3xHxW' (torch layout, dynamic H/W default 256) -> NHWC tuple.
    Five components ('1x5x3xHxW' = batch x clip x C x H x W) select the video
    layout and return (N, T, H, W, C)."""
    parts = shape.lower().split("x")

    def num(i, default):
        return int(parts[i]) if len(parts) > i and parts[i].isdigit() else default

    if len(parts) == 5:
        return (num(0, 1), num(1, 5), num(3, 256), num(4, 256), num(2, 3))
    return (num(0, 1), num(2, 256), num(3, 256), num(1, 3))


def main(argv: list[str] | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils import get_root_logger
    from trainner_redux_tpu.utils.config import Config

    opt, _args = Config.load_config_from_file(
        osp.abspath(osp.dirname(__file__)), is_train=False, argv=argv
    )
    logger = get_root_logger()
    onnx_opt = opt.onnx
    shape = parse_input_shape(onnx_opt.shape if onnx_opt else "1x3x256x256")

    model = build_model(opt)
    # keep params as jax arrays: the exports close over them, and numpy
    # leaves closed over in a traced function break table[tracer] indexing
    params = model._infer_params()
    net = model.net_g

    def forward(x):
        return net.apply({"params": params}, x, train=False)

    x = jnp.zeros(shape, jnp.float32)
    out_dir = opt.path.results_root or "."
    os.makedirs(out_dir, exist_ok=True)
    base = osp.join(out_dir, opt.name)

    # ---- StableHLO via jax.export ----
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(shape, jnp.float32)
    )
    with open(base + ".stablehlo.mlir", "w") as f:
        f.write(exported.mlir_module())
    with open(base + ".jaxexport.bin", "wb") as f:
        f.write(exported.serialize())
    logger.info(f"wrote {base}.stablehlo.mlir and .jaxexport.bin")

    # ---- ONNX (jaxpr -> opset-13 protobuf) ----
    try:
        from trainner_redux_tpu.onnx.export import export_onnx
        from trainner_redux_tpu.onnx.runtime import run_model

        def forward_nchw(inp):
            h = jnp.transpose(inp, (0, 2, 3, 1))
            y = net.apply({"params": params}, h, train=False)
            return jnp.transpose(y, (0, 3, 1, 2))

        if len(shape) == 5:  # (N, T, H, W, C) -> torch-style (N, T, C, H, W)
            nchw_shape = (shape[0], shape[1], shape[4], shape[2], shape[3])

            def forward_nchw(inp):  # noqa: F811
                h = jnp.transpose(inp, (0, 1, 3, 4, 2))
                y = net.apply({"params": params}, h, train=False)
                return jnp.transpose(y, (0, 3, 1, 2))
        else:
            nchw_shape = (shape[0], shape[3], shape[1], shape[2])
        sample_nchw = np.random.default_rng(0).random(nchw_shape).astype(np.float32)
        # dtype policy mirrors the reference's convert_onnx_to_low_precision
        # (/root/reference/convert_to_onnx.py:122-148): fp16 converts the
        # whole float graph with fp16 I/O (keep_io_types=False there); bf16
        # runs the MIXED pass — precision-sensitive ops (ConvTranspose,
        # optionally depthwise convs) stay fp32, I/O stays fp32. Our
        # numpy-backed emitter has no bf16 dtype, so the bf16 policy is
        # emitted at fp16 precision with saturation guards.
        req_dtype = onnx_opt.dtype if onnx_opt else "fp32"
        use_fp16 = req_dtype == "fp16"
        model_bytes = export_onnx(
            forward_nchw, sample_nchw, base + ".onnx", fp16=use_fp16
        )
        if onnx_opt is None or onnx_opt.optimize:
            from trainner_redux_tpu.onnx.optimize import optimize_model

            model_bytes, ostats = optimize_model(model_bytes)
            logger.info(
                f"graph optimize: {ostats['nodes_before']} -> "
                f"{ostats['nodes_after']} nodes, {ostats['inits_before']} -> "
                f"{ostats['inits_after']} initializers"
            )
        if req_dtype == "bf16":
            from trainner_redux_tpu.onnx.precision import to_mixed_fp16

            model_bytes = to_mixed_fp16(
                model_bytes,
                exclude_depthwise=bool(
                    onnx_opt is None or onnx_opt.bf16_exclude_depthwise
                ),
                keep_io_types=True,
            )
            logger.info("mixed-precision pass applied (fp32 I/O + excluded ops)")
        with open(base + ".onnx", "wb") as f:
            f.write(model_bytes)
        logger.info(
            f"wrote {base}.onnx ({len(model_bytes)} bytes, opset 13, {req_dtype})"
        )
        if onnx_opt is None or onnx_opt.verify:
            ref_o = np.asarray(forward_nchw(jnp.asarray(sample_nchw)))
            feed = sample_nchw.astype(np.float16) if use_fp16 else sample_nchw
            got_o = run_model(model_bytes, {"input": feed})[0]
            err_o = float(np.abs(ref_o - got_o.astype(np.float32)).max())
            logger.info(f"onnx verification max abs error: {err_o:.3e}")
            tol = 5e-2 if req_dtype in ("fp16", "bf16") else 1e-4
            assert err_o < tol, "onnx export verification failed"
    except NotImplementedError as e:
        logger.warning(
            f"ONNX export unavailable for this arch ({e}); "
            "the StableHLO/SavedModel artifacts below still export."
        )

    # ---- TF SavedModel via jax2tf ----
    try:
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = tf.function(
            jax2tf.convert(forward, with_gradient=False),
            autograph=False,
            input_signature=[tf.TensorSpec(shape, tf.float32, name="input")],
        )
        module = tf.Module()
        module.f = tf_fn
        tf.saved_model.save(module, base + ".savedmodel")
        logger.info(f"wrote {base}.savedmodel (convert offline: tf2onnx)")
    except Exception as e:
        logger.warning(f"TF SavedModel export skipped: {type(e).__name__}: {e}")

    # ---- torch-layout safetensors (ecosystem interop) ----
    try:
        from safetensors.numpy import save_file

        from trainner_redux_tpu.models.base_model import BaseModel
        from trainner_redux_tpu.utils.torch_compat import export_torch_state_dict

        flat = BaseModel.flatten_params(params)
        torch_sd = export_torch_state_dict(flat, type(net).__name__)
        save_file(torch_sd, base + ".torch.safetensors")
        logger.info(f"wrote {base}.torch.safetensors")
    except NotImplementedError as e:
        logger.warning(f"torch-layout export unavailable: {e}")

    # ---- numeric verification ----
    if onnx_opt is None or onnx_opt.verify:
        rng = np.random.default_rng(0)
        sample = rng.random(shape).astype(np.float32)
        ref = np.asarray(forward(jnp.asarray(sample)))
        rt = jax_export.deserialize(exported.serialize())
        got = np.asarray(rt.call(jnp.asarray(sample)))
        err = float(np.abs(ref - got).max())
        logger.info(f"verification max abs error (stablehlo roundtrip): {err:.3e}")
        assert err < 1e-5, "export verification failed"


if __name__ == "__main__":
    main(sys.argv[1:])
