"""Bisect the span_s_gan step's pathological cost by XLA cost analysis.

BENCH_r04 observation: span_s_gan measures 8.96 img/s (step ~0.9 s) with
hbm_bw_frac 0.279 -> ~200 GB of XLA-counted traffic per step, while the
same generator without the GAN loss mix does 1349 img/s. This script
builds the bench model with cumulative loss subsets and prints XLA's
flop/byte counts per subset (CPU lowering is enough for attribution — the
cost model is backend-independent for these opcodes).

Usage: JAX_PLATFORMS=cpu python scripts/benchmarking/bisect_gan_cost.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.getcwd())

os.environ.setdefault("TRAINNER_ALLOW_RANDOM_VGG", "1")

import jax
import numpy as np

LOSS_LADDER = [
    [{"type": "charbonnierloss", "loss_weight": 1.0}],
    [{"type": "mssimloss", "loss_weight": 0.5}],
    [{"type": "perceptualloss", "criterion": "charbonnier", "loss_weight": 0.01}],
    [{"type": "hsluvloss", "criterion": "charbonnier", "loss_weight": 1.0}],
    [{"type": "ganloss", "gan_type": "vanilla", "loss_weight": 0.1}],
    [  # the full bench mix
        {"type": "mssimloss", "loss_weight": 0.5},
        {"type": "perceptualloss", "criterion": "charbonnier", "loss_weight": 0.01},
        {"type": "hsluvloss", "criterion": "charbonnier", "loss_weight": 1.0},
        {"type": "ganloss", "gan_type": "vanilla", "loss_weight": 0.1},
    ],
]


def build(losses, with_d):
    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    opt = ReduxOptions(
        name="bisect", scale=4, num_gpu=1, path=PathOptions(),
        network_g={"type": "span_s"},
        network_d={"type": "dunet"} if with_d else None,
        manual_seed=0, is_train=True, compute_dtype="bfloat16",
        mesh={"data": 1}, steps_per_dispatch=1,
        train=TrainOptions(
            total_iter=1000, ema_decay=0.999,
            optim_g={"type": "AdamW", "lr": 2e-4},
            optim_d={"type": "AdamW", "lr": 1e-4} if with_d else None,
            losses=losses,
        ),
    )
    model = build_model(opt)
    rng = np.random.default_rng(0)
    b, lq = 8, 64
    model.feed_data({
        "lq": (rng.random((b, lq, lq, 3)) * 255).astype(np.uint8),
        "gt": (rng.random((b, lq * 4, lq * 4, 3)) * 255).astype(np.uint8),
    })
    return model


def main() -> None:
    from trainner_redux_tpu.utils import flops as _fl

    for losses in LOSS_LADDER:
        with_d = any(l["type"] == "ganloss" for l in losses)
        tag = "+".join(l["type"] for l in losses) + ("+D" if with_d else "")
        try:
            model = build(losses, with_d)
            batch = {"lq": model.lq, "gt": model.gt, "key": jax.random.key(0)}
            lowered = model._train_step.lower(model.state, batch)
            cost = _fl.xla_cost(lowered.compile())
            print(json.dumps({
                "losses": tag,
                "tflop": round(cost["flops"] / 1e12, 3),
                "gb": round(cost["bytes"] / 1e9, 2),
            }))
        except Exception as e:  # keep bisecting past a broken rung
            print(json.dumps({"losses": tag, "error": repr(e)[:200]}))


if __name__ == "__main__":
    main()
