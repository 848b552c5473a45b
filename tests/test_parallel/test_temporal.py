"""Temporal sequence parallelism: T-sharded streaming video inference must
match the single-device sequence forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs import build_network
from trainner_redux_tpu.parallel.mesh import make_mesh
from trainner_redux_tpu.parallel.temporal import temporal_sharded_apply


@pytest.mark.slow
def test_temporal_shard_matches_single_device():
    mesh = make_mesh({"data": 8})
    net = build_network({"type": "tscunet", "scale": 2, "clip_size": 5, "dim": 16,
                         "config": (1,) * 7})
    r = 2
    n_out = 16  # two output frames per device (n_loc must cover the radius)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, n_out + 2 * r, 16, 16, 3)).astype(np.float32))
    params = net.init(jax.random.key(0), x[:, : 2 * r + 1], train=True)

    def apply_fn(seq):
        return net.apply(params, seq, train=True)

    ref = np.asarray(apply_fn(x))
    got = np.asarray(temporal_sharded_apply(apply_fn, x, mesh, r))
    assert got.shape == ref.shape == (1, n_out, 32, 32, 3)
    # batched conv reduction order differs between the 20-frame and
    # 6-frame-per-shard forwards; equality is to fp tolerance
    np.testing.assert_allclose(got, ref, atol=1e-4)
