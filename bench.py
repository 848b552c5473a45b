"""Benchmark: 4x SR training throughput (images/sec/chip) on the flagship.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline anchor: the reference's only visible training-throughput number is
~4.7 it/s for SPAN-S GAN training on an unspecified GPU
(/root/reference/docs/source/getting_started.md:30-33); BASELINE.json's
north star is >=3x A100 images/sec/chip for 4x SwinIR-class training.
vs_baseline here is images/sec / (4.7 it/s * 8 img/it) for the SPAN-S anchor.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    n_dev = len(jax.devices())
    batch_per_chip = 16
    b = batch_per_chip * n_dev
    lq_size = 48

    opt = ReduxOptions(
        name="bench",
        scale=4,
        num_gpu=n_dev,
        path=PathOptions(),
        network_g={"type": "span_s"},
        manual_seed=0,
        is_train=True,
        compute_dtype="bfloat16",
        mesh={"data": n_dev},
        train=TrainOptions(
            total_iter=1000,
            ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 1e-4},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)

    rng = jax.random.key(0)
    lq = jax.random.uniform(rng, (b, lq_size, lq_size, 3), jnp.float32)
    gt = jax.random.uniform(rng, (b, lq_size * 4, lq_size * 4, 3), jnp.float32)
    model.feed_data({"lq": lq, "gt": gt})

    # warmup / compile
    for i in range(1, 4):
        model.optimize_parameters(i)
    jax.block_until_ready(model.state.params_g)

    iters = 30
    t0 = time.perf_counter()
    for i in range(4, 4 + iters):
        model.optimize_parameters(i)
    jax.block_until_ready(model.state.params_g)
    dt = time.perf_counter() - t0

    images_per_sec = iters * b / dt
    per_chip = images_per_sec / n_dev
    baseline = 4.7 * 8  # SPAN-S reference sample log: ~4.7 it/s at batch 8
    print(
        json.dumps(
            {
                "metric": "span_s_4x_train_images_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
