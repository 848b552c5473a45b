"""Spatial-sharded inference (parallel/spatial.py): H-axis sharding with
ppermute halo exchange must reproduce the single-device forward exactly for
conv networks when the halo covers the receptive field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.parallel.mesh import make_mesh
from trainner_redux_tpu.parallel.spatial import spatial_sharded_apply


def _build(name, **kw):
    import trainner_redux_tpu.archs  # noqa: F401
    from trainner_redux_tpu.archs import build_network

    net = build_network({"type": name, **kw})
    x0 = jnp.zeros((1, 16, 16, 3))
    params = net.init(jax.random.key(0), x0, train=False)
    return net, params


@pytest.mark.parametrize(
    "name,kw,halo",
    [
        ("superultracompact", {"scale": 2}, 16),
        pytest.param("compact", {"scale": 2, "num_feat": 16, "num_conv": 4}, 24,
                     marks=pytest.mark.slow),
        pytest.param("span_f32", {"scale": 2}, 48, marks=pytest.mark.slow),
    ],
)
def test_spatial_matches_single_device(name, kw, halo):
    n_dev = len(jax.devices())
    mesh = make_mesh({"data": n_dev})
    net, params = _build(name, **kw)

    h = n_dev * 2 * halo  # shard height >= 2*halo
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, h, 32, 3)), jnp.float32)

    ref = net.apply(params, x, train=False)
    got = spatial_sharded_apply(
        lambda v: net.apply(params, v, train=False),
        x, mesh, kw["scale"], halo=halo,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_spatial_rejects_bad_shapes():
    n_dev = len(jax.devices())
    mesh = make_mesh({"data": n_dev})
    net, params = _build("superultracompact", scale=2)
    x = jnp.zeros((1, n_dev * 8 + 1, 16, 3))
    with pytest.raises(ValueError):
        spatial_sharded_apply(
            lambda v: net.apply(params, v, train=False), x, mesh, 2, halo=8
        )
    if n_dev > 1:
        x2 = jnp.zeros((1, n_dev * 8, 16, 3))  # shard height 8 < 2*halo
        with pytest.raises(ValueError):
            spatial_sharded_apply(
                lambda v: net.apply(params, v, train=False), x2, mesh, 2, halo=8
            )


@pytest.mark.slow
def test_val_spatial_shard_matches_plain_test():
    """val.spatial_shard routes model.test() through the mesh-sharded
    forward; output must match the replicated single-device forward."""
    import numpy as np

    from trainner_redux_tpu.models import build_model
    from trainner_redux_tpu.utils.redux_options import (
        PathOptions,
        ReduxOptions,
        ValOptions,
    )

    def make(spatial):
        opt = ReduxOptions(
            name="sp_val", scale=2, num_gpu=8, path=PathOptions(),
            network_g={"type": "superultracompact"}, manual_seed=0,
            is_train=False, mesh={"data": 8},
            val=ValOptions(val_enabled=True, save_img=False,
                           spatial_shard=spatial, spatial_halo=16),
        )
        return build_model(opt)

    rng = np.random.default_rng(3)
    img = rng.random((1, 100, 40, 3)).astype(np.float32)  # odd H: pad path
    m0 = make(False)
    ref = m0.test(img)
    m1 = make(True)
    # reuse the same params (fresh init differs per model instance)
    m1.state = m0.state
    got = m1.test(img)
    assert got.shape == ref.shape == (1, 200, 80, 3)
    np.testing.assert_allclose(got, ref, atol=2e-5)
