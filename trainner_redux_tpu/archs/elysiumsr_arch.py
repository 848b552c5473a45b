"""ElysiumSR — plain residual SR net with stochastic depth (flax/NHWC).

Parity: reference traiNNer/archs/elysiumsr_arch.py:162-206 (ElysiumSR +
S/M/L/XL variants): conv-in, N two-conv ReLU residual blocks with linearly
ramped DropPath, fuse conv + long skip, pixelshuffle tail, conv-out.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import DropPath
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ResidualBlock(nn.Module):
    num_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.relu(Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv1")(x))
        return Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv2")(y) + x


class ElysiumSR(nn.Module):
    scale: int = 4
    in_chans: int = 3
    num_feat: int = 80
    num_blocks: int = 12
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        shallow = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_in")(x)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, self.num_blocks)]
        y = shallow
        for i in range(self.num_blocks):
            y = ResidualBlock(self.num_feat, dtype=self.dtype, name=f"blocks_{i}")(y)
            y = DropPath(dpr[i], name=f"drop_paths_{i}")(y, train)
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_fuse")(y) + shallow
        y = Conv2d(self.num_feat * self.scale**2, 3, dtype=self.dtype, name="upsampler")(y)
        y = pixel_shuffle(y, self.scale)
        return Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_out")(y).astype(jnp.float32)


def _elysium_factory(num_feat, num_blocks, dpr):
    def factory(scale: int = 4, **kwargs):
        return ElysiumSR(
            scale=scale, num_feat=num_feat, num_blocks=num_blocks, drop_path_rate=dpr
        )

    return factory


ARCH_REGISTRY.register(_elysium_factory(64, 10, 0.0), name="elysiumsr_s")
ARCH_REGISTRY.register(_elysium_factory(80, 16, 0.05), name="elysiumsr_m")
ARCH_REGISTRY.register(_elysium_factory(128, 24, 0.1), name="elysiumsr_l")
ARCH_REGISTRY.register(_elysium_factory(160, 32, 0.1), name="elysiumsr_xl")
ARCH_REGISTRY.register(ElysiumSR, name="elysiumsr")
