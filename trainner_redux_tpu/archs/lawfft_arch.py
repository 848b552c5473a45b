"""LAWFFT — Local Adaptive Weighted Fourier Feature Transformer (flax/NHWC).

Parity: reference traiNNer/archs/lawfft_arch.py:229-301 (LAWFFT, test-arch
registry): MetaBlocks mixing a per-sample dynamic depthwise branch
(GAP-generated kernels) with FFT cross-correlation attention (FSAS,
optionally windowed into 8x8 patches on alternating blocks), gated dwconv
FFN, residual groups ending in a DynamicLocal, optional unshuffle input,
UniUpsample tail. FFTs run in fp32.
"""

from __future__ import annotations

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_unshuffle
from trainner_redux_tpu.archs.moesr_arch import ChannelLayerNorm, UniUpsample
from trainner_redux_tpu.utils.registry import TESTARCH_REGISTRY


class DynamicLocal(nn.Module):
    channels: int
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        c = self.channels
        z = jnp.mean(x, axis=(1, 2), keepdims=True)
        z = nn.relu(Conv2d(c, 1, padding=0, dtype=self.dtype, name="gen1")(z))
        z = Conv2d(c * k * k, 1, padding=0, dtype=self.dtype, name="gen2")(z)
        kernels = z.reshape(x.shape[0], k, k, 1, c)  # per-sample HWIO depthwise

        def one(xi, ki):
            return lax.conv_general_dilated(
                xi[None], ki.astype(xi.dtype), (1, 1),
                [(k // 2, k // 2), (k // 2, k // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            )[0]

        return jax.vmap(one)(x, kernels)


class FSAS(nn.Module):
    dim: int
    mid_factor: float = 1.0
    window_size: int = 8
    windowed: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        mid = int(self.dim * 3 * self.mid_factor)
        part = mid // 3
        y = Conv2d(mid, 1, padding=0, dtype=self.dtype, name="to_hidden")(x)
        y = Conv2d(mid, 3, feature_group_count=mid, dtype=self.dtype,
                   name="to_hidden_dw")(y)
        q, k, v = y[..., :part], y[..., part : 2 * part], y[..., 2 * part :]
        ps = self.window_size
        if self.windowed:
            qp = q.reshape(b, h // ps, ps, w // ps, ps, part).transpose(0, 1, 3, 5, 2, 4)
            kp = k.reshape(b, h // ps, ps, w // ps, ps, part).transpose(0, 1, 3, 5, 2, 4)
            qf = jnp.fft.rfft2(qp.astype(jnp.float32))
            kf = jnp.fft.rfft2(kp.astype(jnp.float32))
            out = jnp.fft.irfft2(qf * kf, s=(ps, ps))
            out = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, part)
        else:
            qf = jnp.fft.rfft2(q.astype(jnp.float32), axes=(1, 2))
            kf = jnp.fft.rfft2(k.astype(jnp.float32), axes=(1, 2))
            out = jnp.fft.irfft2(qf * kf, s=(h, w), axes=(1, 2))
        out = ChannelLayerNorm(part, name="norm")(out.astype(x.dtype))
        return Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="project_out")(
            v * out
        )


class MetaBlock(nn.Module):
    dim: int
    split: float = 0.25
    t_mid_factor: float = 1.0
    window_size: int = 8
    windowed: bool = True
    mlp: float = 2.66
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        local = int(self.split * self.dim)
        gd = self.dim - local
        y = ChannelLayerNorm(self.dim, name="tm_norm")(x)
        y1 = DynamicLocal(local, 3, dtype=self.dtype, name="local_0")(y[..., :local])
        y1 = DynamicLocal(local, 5, dtype=self.dtype, name="local_1")(y1)
        y2 = FSAS(gd, self.t_mid_factor, self.window_size, self.windowed,
                  dtype=self.dtype, name="att")(y[..., local:])
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="tm_last")(
            jnp.concatenate([y1, y2], axis=-1)
        )
        x = x + y
        y = ChannelLayerNorm(self.dim, name="cm_norm")(x)
        hidden = int(self.dim * self.mlp)
        y = Conv2d(hidden * 2, 1, padding=0, dtype=self.dtype, name="ffn_in")(y)
        y = Conv2d(hidden * 2, 3, feature_group_count=hidden * 2, dtype=self.dtype,
                   name="ffn_dw")(y)
        y = nn.gelu(y[..., :hidden], approximate=False) * y[..., hidden:]
        y = Conv2d(self.dim, 1, padding=0, dtype=self.dtype, name="ffn_out")(y)
        return x + y


class LAWFFT(nn.Module):
    scale: int = 4
    in_ch: int = 3
    dim: int = 60
    split: float = 0.25
    n_rblock: int = 4
    n_mblock: int = 6
    t_mid_factor: float = 1.0
    window_size: int = 8
    mlp_factor: float = 2.66
    unshuffle_mod: bool = False
    upsampler: str = "pixelshuffle"
    mid_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        scale = self.scale
        unshuffle = 0
        if self.unshuffle_mod and self.scale < 3:
            unshuffle = 4 // self.scale
            scale = 4
        pad = self.window_size * (unshuffle if unshuffle else 1)
        ph, pw = (pad - h0 % pad) % pad, (pad - w0 % pad) % pad
        y = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        if unshuffle:
            y = pixel_unshuffle(y, unshuffle)
        y = Conv2d(self.dim, 3, dtype=self.dtype, name="in_to_dim")(y)
        feat = y
        for ri in range(self.n_rblock):
            r_in = feat
            for mi in range(self.n_mblock):
                feat = MetaBlock(
                    self.dim, self.split, self.t_mid_factor, self.window_size,
                    bool(mi % 2), self.mlp_factor, dtype=self.dtype,
                    name=f"body_{ri}_m{mi}",
                )(feat)
            feat = DynamicLocal(self.dim, 3, dtype=self.dtype,
                                name=f"body_{ri}_dl")(feat)
            feat = feat + r_in
        y = feat + y
        out = UniUpsample(self.upsampler, scale, self.dim, self.in_ch, self.mid_dim,
                          dtype=self.dtype, name="upscale")(y, train)
        return out[:, : h0 * self.scale, : w0 * self.scale, :].astype(jnp.float32)


def _lawfft_factory(scale: int = 4, **kwargs):
    return LAWFFT(scale=scale, **kwargs)


TESTARCH_REGISTRY.register(_lawfft_factory, name="lawfft")
