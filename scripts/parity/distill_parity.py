"""Cross-framework distillation parity (VERDICT r1 #1).

Decisive quality-parity evidence without official datasets: initialize the
REFERENCE's own torch SPAN (reference archs/span_arch.py, run via
reference_oracle stubs), convert the init into this framework, then train
BOTH frameworks for N identical steps — same batches in the same order,
same optimizer (Adam lr/betas/eps), same L1 objective, fp32 — and compare:

  1. per-step loss curves (must track within fp32/TPU-matmul tolerance),
  2. final held-out PSNR of both trained models,
  3. final weight trees (converted torch weights vs jax weights).

The torch side runs the reference's real module on CPU; the jax side runs
this framework's full jitted SRModel train step on the TPU. Matching
curves/weights prove the trainer computes the same math as the reference.

Usage:
  python scripts/parity/distill_parity.py --steps 150 --out /tmp/distill.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FEATURES = 48
SCALE = 2
BATCH = 8
LQ = 32
LR_RATE = 1e-4
BETAS = (0.9, 0.99)
EPS = 1e-8


def make_batches(n_batches: int, n_val: int, seed: int = 0):
    """Fixed fp32 batches (NHWC in [0,1]) from structured synthetic images."""
    import cv2

    from synth_dataset import synth_image

    rng = np.random.default_rng(seed)
    batches, vals = [], []
    for bi in range(n_batches + n_val):
        lqs, gts = [], []
        for _ in range(BATCH):
            hr = synth_image(rng, LQ * SCALE).astype(np.float32) / 255.0
            lr = cv2.resize(hr, (LQ, LQ), interpolation=cv2.INTER_CUBIC)
            gts.append(hr)
            lqs.append(np.clip(lr, 0.0, 1.0))
        pair = (np.stack(lqs), np.stack(gts))
        (batches if bi < n_batches else vals).append(pair)
    return batches, vals


def run_torch(init_path: str, batches, vals, steps: int):
    import torch

    from reference_oracle import import_ref_arch

    mod = import_ref_arch("span_arch")
    net = mod.SPAN(
        num_in_ch=3, num_out_ch=3, feature_channels=FEATURES, upscale=SCALE,
        norm=False,
    )
    torch.manual_seed(0)
    net = net.float()
    torch.save(net.state_dict(), init_path)
    optim = torch.optim.Adam(net.parameters(), lr=LR_RATE, betas=BETAS, eps=EPS)
    loss_fn = torch.nn.L1Loss()
    losses = []
    net.train()
    for i in range(steps):
        lq, gt = batches[i % len(batches)]
        x = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        y = torch.from_numpy(gt.transpose(0, 3, 1, 2))
        optim.zero_grad()
        out = net(x)
        loss = loss_fn(out, y)
        loss.backward()
        optim.step()
        losses.append(float(loss.detach()))
        if i % 25 == 0:
            print(f"torch step {i}: {losses[-1]:.5f}", flush=True)
    # held-out PSNR
    net.eval()
    psnrs = []
    with torch.no_grad():
        for lq, gt in vals:
            out = net(torch.from_numpy(lq.transpose(0, 3, 1, 2)))
            out = out.clamp(0, 1).numpy().transpose(0, 2, 3, 1)
            mse = np.mean((out - gt) ** 2, axis=(1, 2, 3))
            psnrs.extend(10 * np.log10(1.0 / np.maximum(mse, 1e-12)))
    final_sd = {k: v.detach().cpu().numpy() for k, v in net.state_dict().items()}
    return losses, float(np.mean(psnrs)), final_sd


def run_jax(init_path: str, batches, vals, steps: int):
    import jax

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.models.base_model import BaseModel
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    opt = ReduxOptions(
        name="distill", scale=SCALE, num_gpu=1, is_train=True, manual_seed=0,
        compute_dtype="float32", mesh={"data": 1},
        path=PathOptions(pretrain_network_g=init_path),
        network_g={"type": "span", "feature_channels": FEATURES, "norm": False},
        train=TrainOptions(
            total_iter=steps,
            optim_g={"type": "Adam", "lr": LR_RATE, "betas": list(BETAS), "eps": EPS},
            losses=[{"type": "l1loss", "loss_weight": 1.0}],
        ),
    )
    model = build_model(opt)
    losses = []
    for i in range(steps):
        lq, gt = batches[i % len(batches)]
        model.feed_data({"lq": lq, "gt": gt})
        model.optimize_parameters(i + 1)
        losses.append(model.get_current_log()["l_g_l1"])
        if i % 25 == 0:
            print(f"jax step {i}: {losses[-1]:.5f}", flush=True)
    # held-out PSNR with the trained online params
    import jax.numpy as jnp

    params = model.state.params_g
    apply = jax.jit(lambda x: model.net_g.apply({"params": params}, x, train=False))
    psnrs = []
    for lq, gt in vals:
        out = np.clip(np.asarray(apply(jnp.asarray(lq))), 0, 1)
        mse = np.mean((out - gt) ** 2, axis=(1, 2, 3))
        psnrs.extend(10 * np.log10(1.0 / np.maximum(mse, 1e-12)))
    flat = BaseModel.flatten_params(jax.device_get(params))
    return losses, float(np.mean(psnrs)), flat


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--batches", type=int, default=25)
    ap.add_argument("--out", default="/tmp/distill_parity.json")
    args = ap.parse_args()

    batches, vals = make_batches(args.batches, n_val=4)
    with tempfile.TemporaryDirectory() as td:
        init_path = os.path.join(td, "span_init.pth")
        t_losses, t_psnr, t_final = run_torch(init_path, batches, vals, args.steps)
        j_losses, j_psnr, j_flat = run_jax(init_path, batches, vals, args.steps)

        # weight-tree comparison: convert the torch FINAL weights and diff
        import torch

        from trainner_redux_tpu.archs import build_network
        from trainner_redux_tpu.models.base_model import BaseModel
        from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint

        final_path = os.path.join(td, "span_final.pth")
        torch.save({k: torch.from_numpy(v) for k, v in t_final.items()}, final_path)
        net = build_network({"type": "span", "scale": SCALE,
                             "feature_channels": FEATURES, "norm": False})
        import jax
        import jax.numpy as jnp

        template = jax.eval_shape(
            lambda: net.init(jax.random.key(0), jnp.zeros((1, LQ, LQ, 3)), train=False)
        )["params"]
        t_conv = BaseModel.flatten_params(
            jax.device_get(load_torch_checkpoint(final_path, net, template))
        )

    rel_w = []
    for k, v in j_flat.items():
        tv = np.asarray(t_conv[k], np.float32)
        jv = np.asarray(v, np.float32)
        denom = max(float(np.max(np.abs(tv))), 1e-6)
        rel_w.append(float(np.max(np.abs(tv - jv))) / denom)
    losses_t = np.asarray(t_losses)
    losses_j = np.asarray(j_losses)
    result = {
        "steps": args.steps,
        "arch": f"span f{FEATURES} {SCALE}x",
        "loss_first5_torch": [round(v, 6) for v in t_losses[:5]],
        "loss_first5_jax": [round(v, 6) for v in j_losses[:5]],
        "loss_last5_torch": [round(v, 6) for v in t_losses[-5:]],
        "loss_last5_jax": [round(v, 6) for v in j_losses[-5:]],
        "max_rel_loss_diff": float(
            np.max(np.abs(losses_t - losses_j) / np.maximum(losses_t, 1e-8))
        ),
        "psnr_torch": round(t_psnr, 4),
        "psnr_jax": round(j_psnr, 4),
        "psnr_diff_db": round(abs(t_psnr - j_psnr), 4),
        "max_rel_weight_diff": float(np.max(rel_w)),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
