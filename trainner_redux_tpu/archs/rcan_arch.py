"""RCAN — Residual Channel Attention Network (flax/NHWC).

Parity: /root/reference/traiNNer/archs/rcan_arch.py:243-403 (RCAN :243,
rcan/rcan_l/rcan_unshuffle factories): residual groups of RCAB blocks with
squeeze-excite channel attention, pixel-shuffle tail, optional mean-shift
norm and the unshuffle_mod input trick for scales <= 2.

TPU notes: channel attention's global-average-pool + 1x1 convs are tiny
matmuls XLA fuses into the surrounding convs; everything else is dense 3x3
conv work on the MXU.
"""

from __future__ import annotations


import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle, pixel_unshuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _act(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "relu":
        return nn.relu(x)
    if mode == "leaky_relu":
        return nn.leaky_relu(x, 0.2)
    if mode == "elu":
        return nn.elu(x)
    if mode == "silu":
        return nn.silu(x)
    if mode == "gelu":
        return nn.gelu(x, approximate=False)
    return x


class CALayer(nn.Module):
    channel: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.mean(axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, dtype=self.dtype, name="conv_du_0")(y)
        y = nn.relu(y)
        y = Conv2d(self.channel, 1, dtype=self.dtype, name="conv_du_1")(y)
        return x * nn.sigmoid(y)


class RCAB(nn.Module):
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    res_scale: float = 1.0
    act_mode: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = Conv2d(self.n_feat, self.kernel_size, dtype=self.dtype, name="conv0")(x)
        res = _act(res, self.act_mode)
        res = Conv2d(self.n_feat, self.kernel_size, dtype=self.dtype, name="conv1")(res)
        res = CALayer(self.n_feat, self.reduction, dtype=self.dtype, name="ca")(res)
        return res * self.res_scale + x


class ResidualGroup(nn.Module):
    n_feat: int
    kernel_size: int
    reduction: int
    n_resblocks: int
    res_scale: float = 1.0
    act_mode: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(
                self.n_feat, self.kernel_size, self.reduction, self.res_scale,
                self.act_mode, dtype=self.dtype, name=f"block_{i}",
            )(res)
        res = Conv2d(self.n_feat, self.kernel_size, dtype=self.dtype, name="conv_tail")(res)
        return res + x


@ARCH_REGISTRY.register()
class RCAN(nn.Module):
    scale: int = 4
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    n_colors: int = 3
    rgb_range: int = 255
    norm: bool = False
    kernel_size: int = 3
    reduction: int = 16
    res_scale: float = 1.0
    act_mode: str = "relu"
    unshuffle_mod: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]

        unshuffle = self.unshuffle_mod and self.scale <= 2
        downscale_factor = 4 // self.scale if unshuffle else 1
        net_scale = 4 if unshuffle else self.scale
        rgb_range = self.rgb_range if self.norm else 1

        if downscale_factor > 1:
            f = downscale_factor
            ph = (f - in_h % f) % f
            pw = (f - in_w % f) % f
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        x = x * rgb_range
        if self.norm:
            mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype) * rgb_range
            x = x - mean

        if downscale_factor > 1:
            x = pixel_unshuffle(x, downscale_factor)
        feat = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype, name="head")(x)

        res = feat
        for g in range(self.n_resgroups):
            res = ResidualGroup(
                self.n_feats, self.kernel_size, self.reduction, self.n_resblocks,
                self.res_scale, self.act_mode, dtype=self.dtype, name=f"group_{g}",
            )(res)
        res = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype, name="body_tail")(res)
        res = res + feat

        # tail: pixel-shuffle upsampler
        s = net_scale
        stage = 0
        while s % 2 == 0 and s > 1:
            res = Conv2d(self.n_feats * 4, self.kernel_size, dtype=self.dtype, name=f"up_{stage}")(res)
            res = pixel_shuffle(res, 2)
            s //= 2
            stage += 1
        if s == 3:
            res = Conv2d(self.n_feats * 9, self.kernel_size, dtype=self.dtype, name=f"up_{stage}")(res)
            res = pixel_shuffle(res, 3)
        out = Conv2d(self.n_colors, self.kernel_size, dtype=self.dtype, name="tail_conv")(res)

        if self.norm:
            out = out + mean
        out = out / rgb_range
        return out[:, : in_h * self.scale, : in_w * self.scale, :].astype(jnp.float32)


@ARCH_REGISTRY.register(name="rcan_l")
def rcan_l(scale: int = 4, **kwargs) -> RCAN:
    kwargs.setdefault("n_resgroups", 10)
    kwargs.setdefault("n_resblocks", 20)
    kwargs.setdefault("n_feats", 128)
    return RCAN(scale=scale, **kwargs)


@ARCH_REGISTRY.register(name="rcan_unshuffle")
def rcan_unshuffle(scale: int = 2, **kwargs) -> RCAN:
    kwargs.setdefault("unshuffle_mod", True)
    return RCAN(scale=scale, **kwargs)
