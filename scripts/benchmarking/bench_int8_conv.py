"""Decide the fate of the Pallas W8A8 conv (VERDICT r1 weak #7).

Measures, on the real chip with the device_get-forced slope method (the
only timing this tunnel cannot fake — see bench.py module docstring):

  a) bf16 XLA conv3x3 (+ bias + lrelu), the production path
  b) naive XLA int8 conv (quantize -> lax.conv int8 -> dequant epilogue)
  c) the fused Pallas kernel ops/pallas/conv_int8.py

at SR-typical shapes (H=W=480, C=48 and C=64 — SPAN/Compact territory).

Usage: python scripts/benchmarking/bench_int8_conv.py
Prints one JSON line per (shape, variant) with ms/call and the verdict.
"""

from __future__ import annotations

import json
import sys
import time
from os import path as osp

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.ops.pallas.conv_int8 import conv3x3_w8a8, pack_weights


def _slope_ms(fn, x, n1=20, n2=80) -> float:
    """ms per call via two-point slope; chain by feeding the output back so
    the tunnel cannot overlap or elide calls; force with device_get."""

    def run(n: int) -> float:
        y = x
        t0 = time.perf_counter()
        for _ in range(n):
            y = fn(y)
        np.asarray(jax.device_get(y)).ravel()[:1]
        return time.perf_counter() - t0

    run(3)  # warmup/compile
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1) * 1e3


def main() -> None:
    rng = np.random.default_rng(0)
    results = []
    for c in (48, 64):
        h = w = 480
        x = jnp.asarray(rng.random((1, h, w, c)), jnp.bfloat16)
        wk = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)

        dn = jax.lax.conv_dimension_numbers(x.shape, wk.shape, ("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def bf16_conv(y, wk=wk, bias=bias, dn=dn):
            out = jax.lax.conv_general_dilated(
                y.astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
                (1, 1), "SAME", dimension_numbers=dn,
            )
            out = out + bias.astype(jnp.bfloat16)
            return jnp.where(out >= 0, out, out * jnp.bfloat16(0.01))

        s_in = 0.02
        w_scale = jnp.max(jnp.abs(wk), axis=(0, 1, 2)) / 127.0
        wq = jnp.clip(jnp.round(wk / w_scale), -127, 127).astype(jnp.int8)

        @jax.jit
        def naive_int8(y, wq=wq, w_scale=w_scale, bias=bias, dn=dn):
            xq = jnp.clip(jnp.round(y.astype(jnp.float32) / s_in), -127, 127).astype(jnp.int8)
            out = jax.lax.conv_general_dilated(
                xq, wq, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            out = out.astype(jnp.float32) * (s_in * w_scale) + bias
            return jnp.where(out >= 0, out, out * 0.01).astype(jnp.bfloat16)

        w_packed = pack_weights(wq)
        scale = (s_in * w_scale).astype(jnp.float32)

        @jax.jit
        def pallas_int8(y, w_packed=w_packed, scale=scale, bias=bias):
            return conv3x3_w8a8(
                y, w_packed, scale, bias, jnp.float32(1.0 / s_in),
                out_features=y.shape[-1], act="lrelu", slope=0.01,
                out_dtype=jnp.bfloat16,
            )

        for name, fn in (("bf16_xla", bf16_conv), ("int8_xla", naive_int8),
                         ("int8_pallas", pallas_int8)):
            try:
                ms = _slope_ms(fn, x)
            except Exception as e:  # Mosaic lowering can reject shapes
                results.append({"shape": f"{h}x{w}x{c}", "variant": name,
                                "error": str(e)[:200]})
                continue
            results.append({"shape": f"{h}x{w}x{c}", "variant": name,
                            "ms_per_call": round(ms, 4)})
            print(json.dumps(results[-1]), flush=True)

    by_shape: dict[str, dict[str, float]] = {}
    for r in results:
        if "ms_per_call" in r:
            by_shape.setdefault(r["shape"], {})[r["variant"]] = r["ms_per_call"]
    for shape, d in by_shape.items():
        if "bf16_xla" in d and "int8_pallas" in d:
            print(json.dumps({
                "shape": shape,
                "pallas_speedup_vs_bf16": round(d["bf16_xla"] / d["int8_pallas"], 3),
                "pallas_speedup_vs_int8_xla": round(
                    d.get("int8_xla", float("nan")) / d["int8_pallas"], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
