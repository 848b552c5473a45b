"""int8-vs-bf16 conv evidence (VERDICT r1 weak #7 — decided: int8 path CUT).

Measured 2026-08-19 on the real v5e with the device_get-forced slope method
(the only timing this tunnel cannot fake — see bench.py module docstring):

  480x480x64 conv3x3+bias+lrelu:  bf16 XLA 4.54 ms | naive int8 XLA 4.46 ms

i.e. int8 delivers ~2% at SR-typical shapes — XLA's int8 conv lowering does
not reach the MXU's 2x int8 rate for 3x3 spatial convs, and the fused Pallas
W8A8 kernel (formerly ops/pallas/conv_int8.py) was REJECTED by the remote
Mosaic compiler on this backend (sub-128-lane int8 slicing unsupported;
HTTP 500 from tpu_compile_helper). Decision per VERDICT r1 #8: the Pallas
kernel is deleted; W8A8 PTQ (ops/quant.py) remains for accuracy tooling and
can be re-pointed at a kernel when Mosaic grows int8 sublane rotates.

This script keeps the bf16-vs-int8_xla measurement reproducible.

Usage: python scripts/benchmarking/bench_int8_conv.py
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


        for name, fn in (("bf16_xla", bf16_conv), ("int8_xla", naive_int8)):
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
        if "bf16_xla" in d and "int8_xla" in d and d["int8_xla"] > 0:
            print(json.dumps({
                "shape": shape,
                "int8_xla_speedup_vs_bf16": round(d["bf16_xla"] / d["int8_xla"], 3),
            }), flush=True)


if __name__ == "__main__":
    main()
