"""AutoEncoder for SR pretraining (flax/NHWC).

Parity: /root/reference/traiNNer/archs/autoencoder_arch.py:9-60:
encoder = fromRGB convs -> pixel_unshuffle(scale) -> 2x RRDB -> toRGB,
decoder = an ESRGAN (RRDBNet) generator; freeze flags stop gradients of the
respective half (the JAX equivalent of requires_grad=False).
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_unshuffle
from trainner_redux_tpu.archs.rrdbnet_arch import RRDB, RRDBNet
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class Encoder(nn.Module):
    scale: int = 4
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c0 = self.nf // self.scale**2
        x = Conv2d(c0, 3, dtype=self.dtype, name="from_rgb_0")(x)
        x = Conv2d(c0, 3, dtype=self.dtype, name="from_rgb_1")(x)
        x = pixel_unshuffle(x, self.scale)
        x = RRDB(self.nf, dtype=self.dtype, name="rrdb_0")(x)
        x = RRDB(self.nf, dtype=self.dtype, name="rrdb_1")(x)
        x = Conv2d(self.nf, 3, dtype=self.dtype, name="to_rgb_0")(x)
        x = Conv2d(3, 3, dtype=self.dtype, name="to_rgb_1")(x)
        return x


@ARCH_REGISTRY.register()
class AutoEncoder(nn.Module):
    freeze_decoder: bool = False
    freeze_encoder: bool = False
    scale: int = 4
    nf: int = 64
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.encoder = Encoder(self.scale, self.nf, dtype=self.dtype)
        self.decoder = RRDBNet(
            scale=self.scale, num_feat=self.nf, dtype=self.dtype
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        # freezing is enforced by gradient masking in AEModel (params of the
        # frozen half are excluded from optimizer updates, but gradients
        # still flow THROUGH the half — matching requires_grad=False)
        return self.encoder(x)

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(latent, train=True)

    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        return self.decode(self.encode(x))
