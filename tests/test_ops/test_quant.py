"""W8A8 post-training quantization (ops/quant.py + arch_util.Conv2d int8
path): calibration, per-channel weight quant, and close-to-f32 outputs."""

import jax
import jax.numpy as jnp
import pytest
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


@pytest.mark.slow
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
