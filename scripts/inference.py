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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import trainner_redux_tpu.archs  # noqa: F401
    from trainner_redux_tpu.archs import build_network
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        ValOptions,
    )
    from trainner_redux_tpu.models.sr_model import SRModel

    opt = ReduxOptions(
        name="inference", scale=args.scale, num_gpu=len(jax.devices()),
        path=PathOptions(),
        network_g={"type": args.arch},
        manual_seed=0, is_train=False,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        mesh={"data": 1},
        val=ValOptions(val_enabled=False, save_img=False,
                       tile_size=args.tile, tile_overlap=args.tile_overlap),
    )

    net = build_network({**opt.network_g, "scale": args.scale})
    x0 = np.zeros((1, 32, 32, 3), np.float32)
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
