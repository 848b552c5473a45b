"""ParagonDiffusion — rectified-flow latent diffusion SR U-Net (flax/NHWC).

Parity: reference traiNNer/archs/paragondiffusion_arch.py:180-333
(ParagonDiffusion + nano..xl factories): sinusoidal timestep MLP,
ControlNet-style LR condition encoder, ResNet U-Net over 4-channel latents,
rectified-flow objective (straight path z0->z1, predict z1-z0), Euler
sampler. The reference freezes a downloaded Stability VAE
(stabilityai/sd-vae-ft-mse); zero-egress deployments cannot fetch it, so
the latent codec is pluggable: pass encoded latents directly (any 4-ch
latent space, e.g. this repo's AutoEncoder trained via AEModel), and
`rectified_flow_loss` / `sample_flow` operate on latents (documented
divergence — the U-Net, conditioning, and flow math are complete).

Upstream-bug note (no golden fixture possible): the reference's
`predict_flow` crashes unconditionally — its first UpBlock builds ResNet
blocks expecting `out_channels*2 + out_channels` input channels
(paragondiffusion_arch.py:160), but the tensor arriving from the mid block
has only `out_channels`, so GroupNorm raises a shape error for every
config. The reference also wraps the mid blocks in `nn.Sequential`
(paragondiffusion_arch.py:228-231,269), which silently drops the timestep
embedding there. This implementation fixes the channel bookkeeping and
threads the timestep embedding through the mid blocks; since the upstream
model cannot complete a forward pass, no reference checkpoints can exist
and no torch->flax converter is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) / (half - 1) * jnp.arange(half))
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class ResnetBlock(nn.Module):
    out_ch: int
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        g = min(self.groups, in_ch)
        h = nn.GroupNorm(num_groups=g, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        h = Conv2d(self.out_ch, 3, dtype=self.dtype, name="conv1")(nn.silu(h))
        h = h + nn.Dense(self.out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                         name="time_mlp")(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=min(self.groups, self.out_ch), epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(h)
        h = Conv2d(self.out_ch, 3, dtype=self.dtype, name="conv2")(nn.silu(h))
        if in_ch != self.out_ch:
            x = Conv2d(self.out_ch, 1, padding=0, dtype=self.dtype, name="res_conv")(x)
        return h + x


class ParagonDiffusion(nn.Module):
    """U-Net predicting the rectified-flow vector field v(zt, t | lr)."""

    channels: int = 64
    num_blocks: tuple = (1, 1, 1, 1)
    control_channels: int = 16
    latent_channels: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, zt: jnp.ndarray, t: jnp.ndarray, lr_image: jnp.ndarray,
                 train: bool = True) -> jnp.ndarray:
        ch = self.channels
        temb = timestep_embedding(t.astype(jnp.float32), ch)
        temb = nn.Dense(ch * 4, dtype=self.dtype, param_dtype=jnp.float32,
                        name="time_fc1")(temb.astype(self.dtype))
        temb = nn.Dense(ch * 4, dtype=self.dtype, param_dtype=jnp.float32,
                        name="time_fc2")(nn.silu(temb))

        cc = self.control_channels
        ctrl = nn.silu(Conv2d(cc * 2, 3, dtype=self.dtype, name="cond_0")(
            lr_image.astype(self.dtype)))
        ctrl = nn.silu(Conv2d(cc * 4, 3, dtype=self.dtype, name="cond_1")(ctrl))
        ctrl = Conv2d(ch, 1, padding=0, dtype=self.dtype, name="cond_2")(ctrl)
        b = zt.shape[0]
        ctrl = jax.image.resize(
            ctrl, (b, zt.shape[1], zt.shape[2], ch), "linear"
        )

        x = Conv2d(ch, 3, dtype=self.dtype, name="conv_in")(zt.astype(self.dtype)) + ctrl

        skips = []
        for li, n in enumerate(self.num_blocks):
            out_ch = ch * 2**li
            for bi in range(n):
                x = ResnetBlock(out_ch, dtype=self.dtype, name=f"down_{li}_r{bi}")(x, temb)
                skips.append(x)
            x = Conv2d(out_ch, 4, stride=2, padding=1, dtype=self.dtype,
                       name=f"down_{li}_ds")(x)

        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_0")(x, temb)
        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_1")(x, temb)

        for li in reversed(range(len(self.num_blocks))):
            out_ch = ch * 2**li
            x = jax.image.resize(
                x, (b, x.shape[1] * 2, x.shape[2] * 2, x.shape[-1]), "linear"
            )
            for bi in range(self.num_blocks[li]):
                skip = skips.pop()
                x = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_{li}_r{bi}")(
                    jnp.concatenate([x, skip], axis=-1), temb
                )
        return Conv2d(self.latent_channels, 3, dtype=self.dtype,
                      name="conv_out")(x).astype(jnp.float32)


def rectified_flow_loss(module: ParagonDiffusion, variables, z1: jnp.ndarray,
                        lr_image: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Flow-matching MSE: zt = (1-t) z0 + t z1, target v = z1 - z0."""
    k0, kt = jax.random.split(rng)
    z0 = jax.random.normal(k0, z1.shape, z1.dtype)
    t = jax.random.uniform(kt, (z1.shape[0],), z1.dtype)
    tr = t[:, None, None, None]
    zt = (1.0 - tr) * z0 + tr * z1
    v = module.apply(variables, zt, t, lr_image, train=True)
    return jnp.mean(jnp.square(v - (z1 - z0)))


def sample_flow(module: ParagonDiffusion, variables, lr_image: jnp.ndarray,
                latent_hw: tuple, rng: jax.Array, num_steps: int = 10) -> jnp.ndarray:
    """Euler integration of the learned flow from noise to a clean latent."""
    b = lr_image.shape[0]
    zt = jax.random.normal(rng, (b, *latent_hw, module.latent_channels))
    dt = 1.0 / num_steps
    for i in range(num_steps):
        t = jnp.full((b,), i * dt, zt.dtype)
        zt = zt + module.apply(variables, zt, t, lr_image, train=False) * dt
    return zt


def _pd_factory(channels, num_blocks, control_channels):
    def factory(scale: int = 4, **kwargs):
        return ParagonDiffusion(
            channels=channels, num_blocks=num_blocks, control_channels=control_channels
        )

    return factory


ARCH_REGISTRY.register(_pd_factory(64, (1, 1, 1, 1), 16), name="paragondiffusion_nano")
ARCH_REGISTRY.register(_pd_factory(96, (1, 1, 2, 2), 16), name="paragondiffusion_tiny")
ARCH_REGISTRY.register(_pd_factory(128, (1, 2, 2, 2), 32), name="paragondiffusion_small")
ARCH_REGISTRY.register(_pd_factory(160, (2, 2, 2, 2), 32), name="paragondiffusion_medium")
ARCH_REGISTRY.register(_pd_factory(192, (2, 2, 4, 4), 64), name="paragondiffusion_large")
ARCH_REGISTRY.register(_pd_factory(256, (2, 4, 4, 4), 64), name="paragondiffusion_xl")
