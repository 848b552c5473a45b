"""Pallas JPEG kernel parity vs the einsum formulation (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from trainner_redux_tpu.ops.pallas.jpeg_kernel import jpeg_block_transform
from trainner_redux_tpu.utils.diffjpeg import _dct_matrix, _diff_round, _idct_matrix_np


def test_jpeg_kernel_matches_einsum():
    rng = np.random.default_rng(0)
    blocks = jnp.asarray((rng.random((2, 100, 64)) * 255 - 128).astype(np.float32))
    qtabs = jnp.asarray(rng.uniform(1, 50, (2, 64)).astype(np.float32))
    dct = jnp.asarray(_dct_matrix())
    idct = jnp.asarray(_idct_matrix_np())
    coeff = jnp.einsum("uk,bnk->bnu", dct, blocks)
    ref = jnp.einsum(
        "uk,bnu->bnk", idct, _diff_round(coeff / qtabs[:, None, :]) * qtabs[:, None, :]
    )
    out = jpeg_block_transform(blocks, qtabs, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)
