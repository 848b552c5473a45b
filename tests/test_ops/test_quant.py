"""W8A8 post-training quantization (ops/quant.py + arch_util.Conv2d int8
path): calibration, per-channel weight quant, and close-to-f32 outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.ops.quant import calibrate_amax, quantize_int8
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY, SPANDREL_REGISTRY


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def _build(name, **kw):
    import trainner_redux_tpu.archs  # noqa: F401  (registry population)

    reg = ARCH_REGISTRY if name in ARCH_REGISTRY.keys() else SPANDREL_REGISTRY
    net = reg.get(name)(**kw)
    x0 = jnp.zeros((1, 16, 16, 3))
    variables = {"params": net.init(jax.random.key(0), x0, train=False)["params"]}
    return net, variables


def test_calibrate_records_every_conv():
    net, variables = _build("superultracompact", scale=2)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32) for _ in range(2)]
    amax = calibrate_amax(net, variables, batches)
    assert len(amax) >= 3  # several convs
    assert all(v > 0 for v in amax.values())


def test_quantized_forward_close_to_f32():
    net, variables = _build("superultracompact", scale=2)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32) for _ in range(4)]
    quant = quantize_int8(net, variables, batches)

    x = jnp.asarray(rng.random((1, 24, 24, 3)), jnp.float32)
    y_f32 = net.apply(variables, x, train=False)
    y_q = net.apply({**variables, "quant": quant}, x, train=False)
    assert y_q.shape == y_f32.shape
    psnr = _psnr(jnp.clip(y_q, 0, 1), jnp.clip(y_f32, 0, 1))
    # random-init nets are a harsh case; trained nets do better
    assert psnr > 30, f"int8 vs f32 PSNR {psnr:.1f} dB"


def test_skip_filter_keeps_conv_fp():
    net, variables = _build("superultracompact", scale=2)
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)]
    all_q = quantize_int8(net, variables, batches)
    some_q = quantize_int8(
        net, variables, batches, skip=lambda p: any("body_0" in k for k in p)
    )
    n_all = len(jax.tree.leaves(all_q))
    n_some = len(jax.tree.leaves(some_q))
    assert n_some < n_all


def test_quant_span():
    net, variables = _build("span_s", scale=2)
    rng = np.random.default_rng(1)
    batches = [jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32) for _ in range(3)]
    quant = quantize_int8(net, variables, batches)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    y_f32 = net.apply(variables, x, train=False)
    y_q = net.apply({**variables, "quant": quant}, x, train=False)
    psnr = _psnr(jnp.clip(y_q, 0, 1), jnp.clip(y_f32, 0, 1))
    assert psnr > 25, f"span int8 vs f32 PSNR {psnr:.1f} dB"


def test_pallas_conv3x3_w8a8_interpret():
    """Fused Pallas W8A8 conv (ops/pallas/conv_int8.py) vs emulated int8
    reference, interpret mode (runs on the CPU test mesh)."""
    from jax import lax

    from trainner_redux_tpu.ops.pallas.conv_int8 import (
        conv3x3_w8a8,
        pack_weights,
    )

    rng = np.random.default_rng(0)
    B, H, W, C, O = 1, 20, 24, 8, 8
    x = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    wf = jnp.asarray(rng.normal(0, 0.2, (3, 3, C, O)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (O,)), jnp.float32)
    w_scale = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0
    wq = jnp.clip(jnp.round(wf / w_scale), -127, 127).astype(jnp.int8)
    s_in = jnp.float32(jnp.max(jnp.abs(x)) / 127.0)

    y = conv3x3_w8a8(
        x, pack_weights(wq), s_in * w_scale, bias, 1.0 / s_in, O,
        act="lrelu", interpret=True,
    )
    dn = lax.conv_dimension_numbers(x.shape, wf.shape, ("NHWC", "HWIO", "NHWC"))
    xq = jnp.clip(jnp.round(x / s_in), -127, 127)
    ref = lax.conv_general_dilated(
        xq, wq.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn
    )
    ref = ref * (s_in * w_scale) + bias
    ref = jnp.where(ref >= 0, ref, ref * 0.01)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)
