"""Standalone upscaling CLI: checkpoint in, images out — no YAML needed.

The "just upscale my folder" tool reference/chaiNNer users expect
(reference analogue: scripts/paragonsr2/run_inference.py, generalized to
every architecture in the registries). Accepts both this framework's
safetensors and PyTorch ecosystem checkpoints (.pth/.safetensors) through
the golden-validated converters.

    python scripts/inference.py --arch span --scale 4 \
        --model 4xSPAN.pth --input in/ --output out/ \
        [--tile 512 --tile-overlap 16 --tile-batch 8] [--bf16] [--suffix _up]
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

import cv2
import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _load_params(path: str, net, x0):
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.models.base_model import BaseModel

    template = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.asarray(x0), train=False)
    )["params"]
    if path.endswith((".pth", ".pt")):
        from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint

        return load_torch_checkpoint(path, net, template)
    # safetensors: ours (flax dotted keys) or torch-layout
    import safetensors.numpy as st

    flat = st.load_file(path)
    try:
        tree = BaseModel.unflatten_params(dict(flat))
        jax.tree.map(lambda a, b: None, template, tree)  # structure check
        return tree
    except Exception:
        from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint

        return load_torch_checkpoint(path, net, template)


def _run_video(model, paths: list[str], args) -> None:
    """Streaming video upscale: frames in temporal order, edge frames
    reflect-padded so every input frame gets an output; chunks of
    `--chunk` output frames run one sequence forward each, overlapping by
    the clip radius so pyramid features are never recomputed per window."""
    import jax
    import jax.numpy as jnp

    r = args.clip_size // 2
    frames = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        assert img is not None, p
        frames.append(img[:, :, ::-1].astype(np.float32) / 255.0)
    n = len(frames)
    if n < 1:
        raise SystemExit("no frames")
    # reflect-pad the sequence ends (same policy as the video datasets)
    idx = list(range(n))
    padded = [frames[abs(i)] for i in range(-r, 0)] + frames + [
        frames[n - 2 - i if n > 1 else 0] for i in range(r)
    ]
    del idx
    params = model._infer_params()
    total_t = 0.0
    out_i = 0
    pos = 0  # index of the next output frame
    while pos < n:
        take = min(args.chunk, n - pos)
        seq = np.stack(padded[pos : pos + take + 2 * r])[None]  # (1, take+2r, H, W, C)
        t0 = time.perf_counter()
        out = model.net_g.apply(
            {"params": params}, jnp.asarray(seq), train=False
        )
        out = np.asarray(jax.device_get(out))
        total_t += time.perf_counter() - t0
        if out.ndim == 4:  # single-output contract
            out = out[:, None]
        for j in range(take):
            sr = np.clip(out[0, j], 0, 1)[:, :, ::-1]
            name = (
                osp.splitext(osp.basename(paths[pos + j]))[0] + args.suffix + ".png"
            )
            cv2.imwrite(
                osp.join(args.output, name),
                (sr * 255).round().astype(np.uint8),
            )
            out_i += 1
        pos += take
        print(f"[{out_i}/{n}] streaming chunk done ({total_t:.2f}s cumulative)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", required=True, help="registry name, e.g. span, compact")
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--model", required=True, help=".safetensors or torch .pth")
    ap.add_argument("--input", required=True, help="image file or folder")
    ap.add_argument("--output", required=True, help="output folder")
    ap.add_argument("--tile", type=int, default=0, help="tile size (0 = whole image)")
    ap.add_argument("--tile-overlap", type=int, default=16)
    ap.add_argument("--tile-batch", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", help="bfloat16 compute")
    ap.add_argument("--suffix", default="")
    ap.add_argument(
        "--video", action="store_true",
        help="treat the input folder as ordered video frames and run a "
             "video arch (e.g. tscunet) in streaming sequence mode: pyramid "
             "features are shared across sliding windows instead of "
             "recomputed per clip (~3x less compute)",
    )
    ap.add_argument("--clip-size", type=int, default=5)
    ap.add_argument(
        "--chunk", type=int, default=16,
        help="video: output frames per dispatched sequence chunk",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (the host may pin a TPU platform)",
    )
    ap.add_argument(
        "--arch-arg", action="append", default=[], metavar="KEY=VALUE",
        help="extra network_g kwargs, e.g. --arch-arg dim=48 (YAML-parsed)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import trainner_redux_tpu.archs  # noqa: F401
    from trainner_redux_tpu.archs import build_network
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        ValOptions,
    )
    from trainner_redux_tpu.models.sr_model import SRModel

    import yaml

    arch_kwargs = {}
    for kv in args.arch_arg:
        k, _, v = kv.partition("=")
        arch_kwargs[k] = yaml.safe_load(v)

    opt = ReduxOptions(
        name="inference", scale=args.scale, num_gpu=len(jax.devices()),
        path=PathOptions(),
        network_g={"type": args.arch, **arch_kwargs},
        manual_seed=0, is_train=False,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mesh={"data": 1},
        val=ValOptions(val_enabled=False, save_img=False,
                       tile_size=args.tile, tile_overlap=args.tile_overlap),
    )

    net = build_network({**opt.network_g, "scale": args.scale})
    x0 = (
        np.zeros((1, args.clip_size, 32, 32, 3), np.float32)
        if args.video
        else np.zeros((1, 32, 32, 3), np.float32)
    )
    params = _load_params(args.model, net, x0)

    model = SRModel.__new__(SRModel)  # inference surface only
    from trainner_redux_tpu.models.base_model import BaseModel

    BaseModel.__init__(model, opt)
    model.net_g = net
    model.scale = args.scale

    class _S:  # minimal state carrier for _infer_params
        params_g = params
        ema_params_g = None

    model.state = _S()
    model._apply_cache = {}

    paths = (
        [args.input]
        if osp.isfile(args.input)
        else sorted(
            osp.join(args.input, f)
            for f in os.listdir(args.input)
            if f.lower().endswith(IMG_EXTS)
        )
    )
    if not paths:
        raise SystemExit(f"no images under {args.input}")
    os.makedirs(args.output, exist_ok=True)

    if args.video:
        _run_video(model, paths, args)
        return

    for i, p in enumerate(paths):
        img = cv2.imread(p, cv2.IMREAD_COLOR)
        assert img is not None, p
        rgb = img[:, :, ::-1].astype(np.float32) / 255.0
        t0 = time.perf_counter()
        if args.tile and args.tile > 0:
            sr = model.infer_tiled(
                rgb[None], tile_size=args.tile,
                tile_overlap=args.tile_overlap, tile_batch=args.tile_batch,
            )[0]
        else:
            sr = model.test(rgb[None])[0]
        dt = time.perf_counter() - t0
        out = (np.clip(sr, 0, 1)[:, :, ::-1] * 255).round().astype(np.uint8)
        name = osp.splitext(osp.basename(p))[0] + args.suffix + ".png"
        cv2.imwrite(osp.join(args.output, name), out)
        print(f"[{i + 1}/{len(paths)}] {name} {img.shape[1]}x{img.shape[0]} -> "
              f"{out.shape[1]}x{out.shape[0]} ({dt:.2f}s)")


if __name__ == "__main__":
    main()
