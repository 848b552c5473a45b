"""Cross-framework distillation parity (VERDICT r1 #1, r3 #7).

Decisive quality-parity evidence without official datasets: initialize the
REFERENCE's own torch arch (run via reference_oracle stubs), convert the
init into this framework, then train BOTH frameworks for N identical steps —
same batches in the same order, same optimizer (Adam lr/betas/eps), same
objective, fp32 — and compare:

  1. per-step loss curves (must track within fp32/TPU-matmul tolerance),
  2. final held-out PSNR of both trained models,
  3. final weight trees (converted torch weights vs jax weights).

The torch side runs the reference's real module on CPU; the jax side runs
this framework's full jitted SRModel train step on the TPU. Matching
curves/weights prove the trainer computes the same math as the reference.

Modes (VERDICT r3 #7 asks for a transformer and a GAN run):

  --arch span48     : SPAN f48 2x, L1 (the round-2 run; default)
  --arch drct_tiny  : reference DRCT (embed_dim 48, depths (2,2), ws 8,
                      drop_path 0) — exercises the fused Pallas transformer
                      block FORWARD AND BACKWARD (LN+window-MHSA+proj and
                      LN+MLP custom VJPs) against upstream torch autograd.
  --gan             : SPAN f48 2x generator + the reference's
                      VGGStyleDiscriminator (input 128), L1 + vanilla GAN —
                      exercises the dual-optimizer path. BatchNorm (not SN)
                      discriminator: train-mode BN normalizes by CURRENT
                      batch statistics, so lockstep does not depend on
                      running-stat update cadence (spectral-norm u vectors
                      advance once per step here vs once per forward in
                      torch, which would diverge).

The torch GAN twin mirrors models/sr_model.py's update order exactly:
G updates first (GAN term through the CURRENT D), then D updates on
(gt, stop_gradient(G_out)) using the SAME forward output G trained on.

GAN lockstep is CHAOTIC: the adversarial feedback loop amplifies fp
rounding differences exponentially, so no implementation (including the
reference vs itself under a different BLAS/thread schedule) stays within
a PSNR budget over hundreds of steps. `--control` quantifies this: it
runs the TORCH side twice, the second time with a ~1e-7 perturbation of
the initial G weights, and reports the same divergence metrics. If
torch-vs-torch(+1ulp) diverges as much as torch-vs-jax, the correct
parity evidence is early-step loss agreement, not end-state PSNR.

Usage:
  python scripts/parity/distill_parity.py --steps 300 --arch drct_tiny
  python scripts/parity/distill_parity.py --steps 300 --gan
  python scripts/parity/distill_parity.py --steps 300 --gan --control
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

LR_RATE = 1e-4
BETAS = (0.9, 0.99)
EPS = 1e-8
GAN_WEIGHT = 0.1

ARCHS = {
    # name -> (scale, batch, lq, jax network_g, torch builder name)
    "span48": {
        "scale": 2, "batch": 8, "lq": 32,
        "network_g": {"type": "span", "feature_channels": 48, "norm": False},
    },
    "drct_tiny": {
        "scale": 2, "batch": 4, "lq": 32,
        "network_g": {
            "type": "drct", "embed_dim": 48,
            "depths": (2, 2), "num_heads": (4, 4), "window_size": 8,
            "drop_path_rate": 0.0,
        },
    },
}


def make_batches(n_batches: int, n_val: int, batch: int, lq: int, scale: int,
                 seed: int = 0):
    """Fixed fp32 batches (NHWC in [0,1]) from structured synthetic images."""
    import cv2

    from synth_dataset import synth_image

    rng = np.random.default_rng(seed)
    batches, vals = [], []
    for bi in range(n_batches + n_val):
        lqs, gts = [], []
        for _ in range(batch):
            hr = synth_image(rng, lq * scale).astype(np.float32) / 255.0
            lr = cv2.resize(hr, (lq, lq), interpolation=cv2.INTER_CUBIC)
            gts.append(hr)
            lqs.append(np.clip(lr, 0.0, 1.0))
        pair = (np.stack(lqs), np.stack(gts))
        (batches if bi < n_batches else vals).append(pair)
    return batches, vals


def build_torch_g(arch: str, scale: int):
    import torch

    from reference_oracle import import_ref_arch

    torch.manual_seed(0)
    if arch == "span48":
        mod = import_ref_arch("span_arch")
        return mod.SPAN(
            num_in_ch=3, num_out_ch=3, feature_channels=48, upscale=scale,
            norm=False,
        ).float()
    if arch == "drct_tiny":
        mod = import_ref_arch("drct_arch")
        return mod.DRCT(
            upscale=scale, embed_dim=48, depths=(2, 2), num_heads=(4, 4),
            window_size=8, drop_path_rate=0.0, upsampler="pixelshuffle",
            img_size=32,
        ).float()
    raise ValueError(arch)


def run_torch(arch: str, cfg: dict, init_g: str, init_d: str | None,
              batches, vals, steps: int, gan: bool, perturb: float = 0.0):
    import torch

    net = build_torch_g(arch, cfg["scale"])
    if perturb:
        # chaos control: nudge every G weight by a relative ~1e-7 — the
        # scale of a single bf16->fp32 rounding difference
        with torch.no_grad():
            for p in net.parameters():
                p.add_(p.abs() * perturb * torch.sign(torch.randn_like(p)))
    torch.save(net.state_dict(), init_g)
    optim = torch.optim.Adam(net.parameters(), lr=LR_RATE, betas=BETAS, eps=EPS)
    loss_fn = torch.nn.L1Loss()
    net_d = optim_d = None
    if gan:
        from reference_oracle import import_ref_arch

        dmod = import_ref_arch("discriminator_arch")
        torch.manual_seed(1)
        net_d = dmod.VGGStyleDiscriminator(
            num_in_ch=3, num_feat=32, input_size=cfg["lq"] * cfg["scale"]
        ).float()
        torch.save(net_d.state_dict(), init_d)
        optim_d = torch.optim.Adam(
            net_d.parameters(), lr=LR_RATE, betas=BETAS, eps=EPS
        )
        bce = torch.nn.BCEWithLogitsLoss()
        net_d.train()
    losses = []
    net.train()
    for i in range(steps):
        lq, gt = batches[i % len(batches)]
        x = torch.from_numpy(lq.transpose(0, 3, 1, 2))
        y = torch.from_numpy(gt.transpose(0, 3, 1, 2))
        optim.zero_grad()
        out = net(x)
        loss = loss_fn(out, y)
        if gan:
            # G's GAN term through the CURRENT D (update order parity with
            # models/sr_model.py: G first, D after, same forward output)
            fake_pred = net_d(out)
            loss = loss + GAN_WEIGHT * bce(
                fake_pred, torch.ones_like(fake_pred)
            )
        loss.backward()
        optim.step()
        if gan:
            optim_d.zero_grad()
            real_pred = net_d(y)
            l_d_real = bce(real_pred, torch.ones_like(real_pred))
            fake_pred = net_d(out.detach())
            l_d_fake = bce(fake_pred, torch.zeros_like(fake_pred))
            (l_d_real + l_d_fake).backward()
            optim_d.step()
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


def run_jax(cfg: dict, init_g: str, init_d: str | None, batches, vals,
            steps: int, gan: bool):
    import jax

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.models.base_model import BaseModel
    from trainner_redux_tpu.utils.redux_options import (
        DatasetOptions,
        PathOptions,
        ReduxOptions,
        TrainOptions,
    )

    losses_cfg = [{"type": "l1loss", "loss_weight": 1.0}]
    network_d = None
    optim_d = None
    if gan:
        losses_cfg.append(
            {"type": "ganloss", "gan_type": "vanilla", "loss_weight": GAN_WEIGHT}
        )
        network_d = {
            "type": "vggstylediscriminator", "num_feat": 32,
            "input_size": cfg["lq"] * cfg["scale"],
        }
        optim_d = {"type": "Adam", "lr": LR_RATE, "betas": list(BETAS),
                   "eps": EPS}
    opt = ReduxOptions(
        name="distill", scale=cfg["scale"], num_gpu=1, is_train=True,
        manual_seed=0, compute_dtype="float32", mesh={"data": 1},
        # the model sizes the D init sample from the train dataset's lq_size
        datasets={
            "train": DatasetOptions(
                name="distill", type="pairedimagedataset", phase="train",
                scale=cfg["scale"], lq_size=cfg["lq"],
                batch_size_per_gpu=cfg["batch"],
            )
        },
        path=PathOptions(
            pretrain_network_g=init_g, pretrain_network_d=init_d
        ),
        network_g=dict(cfg["network_g"]),
        network_d=network_d,
        train=TrainOptions(
            total_iter=steps,
            optim_g={"type": "Adam", "lr": LR_RATE, "betas": list(BETAS),
                     "eps": EPS},
            optim_d=optim_d,
            losses=losses_cfg,
        ),
    )
    model = build_model(opt)
    losses = []
    for i in range(steps):
        lq, gt = batches[i % len(batches)]
        model.feed_data({"lq": lq, "gt": gt})
        model.optimize_parameters(i + 1)
        # l_g_total = sum of weighted generator losses — matches the torch
        # twin's `loss` (L1 [+ weighted GAN]) term for term
        losses.append(float(model.get_current_log()["l_g_total"]))
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
    ap.add_argument("--arch", default="span48", choices=sorted(ARCHS))
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--control", action="store_true",
                    help="torch-vs-torch(+1e-7 init perturbation) chaos "
                         "control instead of torch-vs-jax")
    ap.add_argument("--out", default="/tmp/distill_parity.json")
    args = ap.parse_args()
    cfg = dict(ARCHS[args.arch])
    if args.gan:
        # VGGStyleDiscriminator requires 128px inputs -> lq 64 at 2x
        cfg = {**cfg, "lq": 64, "batch": 4}

    batches, vals = make_batches(
        args.batches, n_val=4, batch=cfg["batch"], lq=cfg["lq"],
        scale=cfg["scale"],
    )
    with tempfile.TemporaryDirectory() as td:
        init_g = os.path.join(td, "g_init.pth")
        init_d = os.path.join(td, "d_init.pth") if args.gan else None
        t_losses, t_psnr, t_final = run_torch(
            args.arch, cfg, init_g, init_d, batches, vals, args.steps, args.gan
        )
        if args.control:
            j_losses, j_psnr, _ = run_torch(
                args.arch, cfg, os.path.join(td, "g_init2.pth"),
                os.path.join(td, "d_init2.pth") if args.gan else None,
                batches, vals, args.steps, args.gan, perturb=1e-7,
            )
            j_flat = None
        else:
            j_losses, j_psnr, j_flat = run_jax(
                cfg, init_g, init_d, batches, vals, args.steps, args.gan
            )

        # weight-tree comparison: convert the torch FINAL weights and diff
        import torch

        if j_flat is None:
            t_conv = None
        else:
            from trainner_redux_tpu.archs import build_network
            from trainner_redux_tpu.models.base_model import BaseModel
            from trainner_redux_tpu.utils.torch_compat import (
                load_torch_checkpoint,
            )

            final_path = os.path.join(td, "g_final.pth")
            torch.save(
                {k: torch.from_numpy(v) for k, v in t_final.items()},
                final_path,
            )
            net = build_network({**cfg["network_g"], "scale": cfg["scale"]})
            import jax
            import jax.numpy as jnp

            template = jax.eval_shape(
                lambda: net.init(
                    jax.random.key(0),
                    jnp.zeros((1, cfg["lq"], cfg["lq"], 3)),
                    train=False,
                )
            )["params"]
            t_conv = BaseModel.flatten_params(
                jax.device_get(load_torch_checkpoint(final_path, net, template))
            )

    rel_w = [0.0]
    if j_flat is not None:
        for k, v in j_flat.items():
            tv = np.asarray(t_conv[k], np.float32)
            jv = np.asarray(v, np.float32)
            denom = max(float(np.max(np.abs(tv))), 1e-6)
            rel_w.append(float(np.max(np.abs(tv - jv))) / denom)
    losses_t = np.asarray(t_losses)
    losses_j = np.asarray(j_losses)
    rel_by_step = np.abs(losses_t - losses_j) / np.maximum(losses_t, 1e-8)
    # divergence horizon: max rel loss diff inside growing step windows —
    # for chaotic (GAN) runs this shows exponential growth from fp noise
    horizons = {
        str(h): float(np.max(rel_by_step[:h]))
        for h in (5, 25, 50, 100, 200, len(rel_by_step))
        if h <= len(rel_by_step)
    }
    result = {
        "steps": args.steps,
        "mode": "torch_vs_torch_perturbed_control" if args.control
                else "torch_vs_jax",
        "arch": args.arch + (" +gan(vggstyle-bn)" if args.gan else ""),
        "loss_first5_torch": [round(v, 6) for v in t_losses[:5]],
        "loss_first5_jax": [round(v, 6) for v in j_losses[:5]],
        "loss_last5_torch": [round(v, 6) for v in t_losses[-5:]],
        "loss_last5_jax": [round(v, 6) for v in j_losses[-5:]],
        "max_rel_loss_diff": float(np.max(rel_by_step)),
        "rel_loss_diff_by_horizon": horizons,
        "psnr_torch": round(t_psnr, 4),
        "psnr_jax": round(j_psnr, 4),
        "psnr_diff_db": round(abs(t_psnr - j_psnr), 4),
        "max_rel_weight_diff": (
            None if j_flat is None else float(np.max(rel_w))
        ),
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
