"""Structural validation for the spandrel-ecosystem checkpoint converters
(VERDICT r1 #4: GRL, CRAFT, RGT, DITN, DCTLSA, SeemoRe, OmniSR, ATD,
PLKSR v1, RealCUGAN, SRFormer v1, SAFMN, MoSR v1).

Cross-framework goldens are oracle-blocked (the torch code lives in the
absent spandrel package), so each family is validated two ways:
  1. round-trip: random flax init -> exporter(torch layout) ->
     converter -> identical flax tree (keys AND values);
  2. shape-complete: the converter output covers every parameter of the
     flax module exactly (no missing / extra keys).
When a real checkpoint lands on disk, scripts/parity pipelines pick these
converters up unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest

import trainner_redux_tpu.archs  # noqa: F401  (populates the registries)
from trainner_redux_tpu.models.base_model import BaseModel
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY, SPANDREL_REGISTRY


def _factory(name):
    try:
        return SPANDREL_REGISTRY.get(name)
    except KeyError:
        return ARCH_REGISTRY.get(name)
from trainner_redux_tpu.utils.torch_compat import (
    _CONVERTERS,
    export_torch_state_dict,
)

# (registry factory name, tiny kwargs, input hw)
# a representative subset runs in the fast suite; the rest are slow-marked
_FAST = {"plksr", "mosr", "grl_t"}
CASES = [
    ("safmn", dict(scale=2, dim=8, n_blocks=2), 16),
    ("plksr", dict(scale=2, dim=8, n_blocks=2), 16),
    ("realcugan", dict(scale=2), 48),
    ("realcugan", dict(scale=2, fast=True), 48),  # UpCunet2x_fast layout
    ("srformer_light", dict(scale=2), 16),
    ("mosr", dict(scale=2, n_block=2, dim=8), 16),
    ("atd_light", dict(scale=2), 16),
    ("omnisr", dict(scale=2, num_feat=16, res_num=2, block_num=1, window_size=4), 16),
    ("ditn_real", dict(scale=2, dim=12, ITL_blocks=2, SAL_blocks=2, UFONE_blocks=1), 16),
    ("seemore_t", dict(scale=2, embedding_dim=16, num_layers=2, num_experts=3, topk=1), 16),
    ("dctlsa", dict(scale=2, nf=10, num_modules=3, num_head=2), 16),
    ("craft", dict(scale=2, embed_dim=16, depths=(2, 2), num_heads=(2, 2),
                   window_size=16, split_size_0=4, split_size_1=16), 16),
    ("rgt_s", dict(scale=2, embed_dim=16, depth=(2, 2), num_heads=(2, 2),
                   split_size=(4, 8)), 16),
    ("grl_t", dict(scale=2, embed_dim=16, depths=(2, 2), num_heads_window=(2, 2),
                   num_heads_stripe=(2, 2), window_size=8, stripe_size=(8, 8)), 16),
    ("grl_b", dict(scale=2, embed_dim=16, depths=(2,), num_heads_window=(2,),
                   num_heads_stripe=(2,), window_size=8, stripe_size=(8, 8)), 16),
]

# families whose upstream checkpoint shares one wqkv Linear consumed by two
# attention branches: tie the flax copies before export (a converted
# checkpoint always has them tied; random init does not)
TIE_QKV = {"atd_light"}


def _prepare(name: str, flat: dict) -> dict:
    if name in TIE_QKV:
        flat = dict(flat)
        for k in list(flat):
            if k.endswith("attn_aca.qkv.kernel"):
                flat[k] = flat[k.replace("attn_aca", "attn_win")]
            if k.endswith("attn_aca.qkv.bias"):
                flat[k] = flat[k.replace("attn_aca", "attn_win")]
    return flat


@pytest.mark.parametrize(
    "name,kwargs,hw",
    [c if c[0] in _FAST else pytest.param(*c, marks=pytest.mark.slow) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_spandrel_converter_roundtrip(name, kwargs, hw):
    import jax
    import jax.numpy as jnp

    net = _factory(name)(**kwargs)
    variables = net.init(jax.random.key(0), jnp.zeros((1, hw, hw, 3)), train=False)
    flat = _prepare(name, BaseModel.flatten_params(variables["params"]))

    arch = type(net).__name__
    sd = export_torch_state_dict(dict(flat), arch)
    # torch layouts are flat name->tensor dicts with no flax structure
    assert all("." in k for k in sd), "exporter must emit torch-style keys"

    conv = _CONVERTERS[arch.lower()](sd, net)
    conv = {k: v for k, v in conv.items() if not k.startswith("__")}
    assert sorted(conv) == sorted(flat), (
        f"converter must reproduce the flax tree exactly; "
        f"missing={sorted(set(flat) - set(conv))[:5]} "
        f"extra={sorted(set(conv) - set(flat))[:5]}"
    )
    for k in flat:
        np.testing.assert_allclose(
            np.asarray(conv[k]), np.asarray(flat[k]), rtol=0, atol=0, err_msg=k
        )


@pytest.mark.parametrize(
    "name,kwargs,hw",
    [c if c[0] in _FAST else pytest.param(*c, marks=pytest.mark.slow) for c in CASES],
    ids=[c[0] for c in CASES],
)
def test_spandrel_converted_forward_runs(name, kwargs, hw):
    """The converted tree must load and run a forward at the right scale."""
    import jax
    import jax.numpy as jnp

    net = _factory(name)(**kwargs)
    x = jnp.linspace(0, 1, hw * hw * 3, dtype=jnp.float32).reshape(1, hw, hw, 3)
    variables = net.init(jax.random.key(0), x, train=False)
    flat = _prepare(name, BaseModel.flatten_params(variables["params"]))
    variables = {"params": BaseModel.unflatten_params(dict(flat))}
    sd = export_torch_state_dict(dict(flat), type(net).__name__)
    conv = {
        k: v
        for k, v in _CONVERTERS[type(net).__name__.lower()](sd, net).items()
        if not k.startswith("__")
    }
    params = BaseModel.unflatten_params(conv)
    y_ref = net.apply({"params": variables["params"]}, x, train=False)
    y = net.apply({"params": params}, x, train=False)
    scale = kwargs.get("scale", 4)
    assert y.shape == (1, hw * scale, hw * scale, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-6)
