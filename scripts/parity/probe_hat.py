"""One-off probe: per-block torch-vs-flax diffs for the hat_m_full case.

Token-shaped (B, L, C) torch intermediates are reshaped to NHWC before
comparison (bisect_parity.py skips shape-mismatched pairs, which hides
everything inside HAT's residual groups)."""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
from safetensors.torch import load_file  # noqa: E402

from generate_golden import CASES, GOLDEN_DIR  # noqa: E402
from reference_oracle import import_ref_arch  # noqa: E402
from tests.test_utils.test_golden_parity import FLAX_OPTS  # noqa: E402
from trainner_redux_tpu.archs import build_network  # noqa: E402
from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint  # noqa: E402

CASE = "hat_m_full"


def main() -> None:
    module_file, cls_name, kwargs, _shape = CASES[CASE]
    mod = import_ref_arch(module_file)
    net_t = getattr(mod, cls_name)(**kwargs)
    net_t.load_state_dict(load_file(os.path.join(GOLDEN_DIR, f"{CASE}.safetensors")))
    net_t.eval()
    data = np.load(os.path.join(GOLDEN_DIR, f"{CASE}.npz"))
    x_t = data["x"]

    acts: dict[str, np.ndarray] = {}

    def hook(name):
        def f(_m, _i, o):
            if isinstance(o, torch.Tensor):
                acts[name] = o.detach().numpy()
        return f

    for lname, layer in net_t.named_modules():
        # per-HAB/OCAB outputs inside the first group + every group output
        if lname.count(".") <= 4 and (
            "residual_group.blocks" in lname or lname.endswith("overlap_attn")
            or lname.endswith("residual_group")
        ):
            layer.register_forward_hook(hook(lname))
    with torch.no_grad():
        net_t(torch.from_numpy(x_t))

    net = build_network(dict(FLAX_OPTS[CASE]))
    x = jnp.asarray(x_t.transpose(0, 2, 3, 1))
    template = jax.eval_shape(
        lambda: net.init(jax.random.key(0), x, train=False)
    )["params"]
    params = load_torch_checkpoint(
        os.path.join(GOLDEN_DIR, f"{CASE}.safetensors"), net, template
    )
    _, inter = net.apply(
        {"params": params}, x, train=False, capture_intermediates=True
    )
    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(tree, tuple):
            flat[prefix] = np.asarray(tree[0])

    walk(inter["intermediates"])

    h = w = 64
    # torch layers.{i}.residual_group.blocks.{j} <-> flax layers_{i}/blocks_{j}
    for tname, tv in sorted(acts.items()):
        parts = tname.split(".")
        if parts[-2] == "blocks":
            fkey = f"layers_{parts[1]}/blocks_{parts[-1]}/__call__"
        elif tname.endswith("overlap_attn"):
            fkey = f"layers_{parts[1]}/overlap_attn/__call__"
        elif tname.endswith("residual_group"):
            continue
        else:
            continue
        if fkey not in flat:
            print(f"{tname}: flax key {fkey} missing; have "
                  f"{[k for k in flat if k.startswith('layers_0')][:6]}")
            continue
        fv = flat[fkey]
        if tv.ndim == 3:  # (B, L, C) -> (B, H, W, C)
            tv = tv.reshape(tv.shape[0], h, w, tv.shape[2])
        elif tv.ndim == 4:  # NCHW
            tv = tv.transpose(0, 2, 3, 1)
        if tv.shape != fv.shape:
            print(f"{tname}: SHAPE {tv.shape} vs {fv.shape}")
            continue
        print(f"{tname}: {np.abs(tv - fv).max():.3e}")


if __name__ == "__main__":
    main()
