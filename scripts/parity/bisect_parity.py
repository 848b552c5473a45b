"""Bisect a golden-parity divergence module-by-module.

Usage: python scripts/parity/bisect_parity.py <case> [max_depth]
Loads the golden fixture, runs the reference torch model with forward hooks
and the flax model with capture_intermediates, and prints per-module max
abs diffs (NCHW-aligned) sorted by module depth.
"""

from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from generate_golden import CASES, GOLDEN_DIR  # noqa: E402
from reference_oracle import import_ref_arch  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))


def main(case: str, max_depth: int = 2) -> None:
    from safetensors.torch import load_file

    from tests.test_utils.test_golden_parity import FLAX_OPTS
    from trainner_redux_tpu.archs import build_network
    from trainner_redux_tpu.utils.torch_compat import load_torch_checkpoint

    module_file, cls_name, kwargs, _shape = CASES[case]
    mod = import_ref_arch(module_file)
    net_t = getattr(mod, cls_name)(**kwargs)
    net_t.load_state_dict(load_file(os.path.join(GOLDEN_DIR, f"{case}.safetensors")))
    net_t.eval()
    data = np.load(os.path.join(GOLDEN_DIR, f"{case}.npz"))
    acts: dict = {}

    def hook(name):
        def f(_m, _i, o):
            acts[name] = o

        return f

    for name, m in net_t.named_modules():
        if name and name.count(".") < max_depth:
            m.register_forward_hook(hook(name))
    with torch.inference_mode():
        net_t(torch.from_numpy(data["x"]))

    net_f = build_network(dict(FLAX_OPTS[case]))
    x = data["x"]
    xf = jnp.asarray(x.transpose(0, 2, 3, 1) if x.ndim == 4 else x.transpose(0, 1, 3, 4, 2))
    tpl = jax.eval_shape(lambda: net_f.init(jax.random.key(0), xf, train=False))["params"]
    params = load_torch_checkpoint(
        os.path.join(GOLDEN_DIR, f"{case}.safetensors"), net_f, tpl
    )
    _, inter = net_f.apply(
        {"params": params}, xf, train=False, capture_intermediates=True
    )

    flat: dict = {}

    def rec(d, p):
        for k, v in d.items():
            if k == "__call__":
                flat[p] = v[0]
            elif isinstance(v, dict):
                rec(v, f"{p}.{k}" if p else k)

    rec(inter["intermediates"], "")

    def to_nchw(a):
        a = np.asarray(a)
        if a.ndim == 4:
            return a.transpose(0, 3, 1, 2)
        if a.ndim == 5:
            return a.transpose(0, 1, 4, 2, 3)
        return a

    for tname in sorted(acts):
        fname = tname.replace(".", "_") if tname.replace(".", "_") in flat else tname
        cands = [fname, tname.replace(".", "_"), tname]
        match = next((c for c in cands if c in flat), None)
        if match is None:
            continue
        t = acts[tname]
        f = flat[match]
        t_list = t if isinstance(t, tuple) else (t,)
        f_list = f if isinstance(f, tuple) else (f,)
        for i, (tt, ff) in enumerate(zip(t_list, f_list)):
            if not isinstance(tt, torch.Tensor):
                continue
            ta, fa = tt.detach().numpy(), to_nchw(ff)
            if ta.shape != fa.shape:
                print(f"{tname}[{i}]: SHAPE {ta.shape} vs {fa.shape}")
            else:
                print(f"{tname}[{i}]: {np.abs(ta - fa).max():.3e}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 2)
