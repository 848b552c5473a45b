"""TSCUNet — temporal SCUNet video SR (flax/NHWC).

Parity: /root/reference/traiNNer/archs/tscunet_arch.py:15-300 (+ SCUNet
blocks from scunet_aaf6aa_arch.py): per-triplet swin-conv U-Net blocks
reduce a T-frame clip pyramid-style (T -> T-2 -> ... -> 1), center-frame
residual, RRDB upsampling tail. The swin-conv hybrid (ConvTransBlock) splits
channels into a conv branch and a (shifted-)window-attention branch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.archs.rrdbnet_arch import RRDB
from trainner_redux_tpu.archs.swinir_arch import SwinBlock
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class ConvTransBlock(nn.Module):
    conv_dim: int
    trans_dim: int
    head_dim: int = 32
    window_size: int = 8
    shifted: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        total = self.conv_dim + self.trans_dim
        y = Conv2d(total, 1, dtype=self.dtype, name="conv1_1")(x)
        conv_x, trans_x = y[..., : self.conv_dim], y[..., self.conv_dim :]
        c = Conv2d(self.conv_dim, 3, use_bias=False, dtype=self.dtype, name="cb_0")(conv_x)
        c = nn.relu(c)
        c = Conv2d(self.conv_dim, 3, use_bias=False, dtype=self.dtype, name="cb_1")(c)
        conv_x = conv_x + c
        trans_x = SwinBlock(
            self.trans_dim,
            max(1, self.trans_dim // self.head_dim),
            self.window_size,
            self.window_size // 2 if self.shifted else 0,
            mlp_ratio=4.0,
            dtype=self.dtype,
            name="trans_block",
        )(trans_x, train)
        res = Conv2d(total, 1, dtype=self.dtype, name="conv1_2")(
            jnp.concatenate([conv_x, trans_x], axis=-1)
        )
        return x + res


class TSCUNetBlock(nn.Module):
    """SCUNet-style U-Net consuming stacked triplet features (3*dim -> dim)."""

    dim: int = 64
    config: tuple = (2, 2, 2, 2, 2, 2, 2)
    head_dim: int = 32
    window_size: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dtype
        dim = self.dim

        def ct_stage(x, c_dim, n, name):
            for i in range(n):
                x = ConvTransBlock(
                    c_dim, c_dim, self.head_dim, self.window_size, bool(i % 2),
                    dtype=d, name=f"{name}_{i}",
                )(x, train)
            return x

        x1 = Conv2d(dim, 3, use_bias=False, dtype=d, name="m_head")(x)
        # down path: blocks then stride-2 conv doubling channels
        y = ct_stage(x1, dim // 2, self.config[0], "down1")
        x2 = Conv2d(2 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d, name="down1_conv")(y)
        y = ct_stage(x2, dim, self.config[1], "down2")
        x3 = Conv2d(4 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d, name="down2_conv")(y)
        y = ct_stage(x3, 2 * dim, self.config[2], "down3")
        x4 = Conv2d(8 * dim, 2, stride=2, padding=0, use_bias=False, dtype=d, name="down3_conv")(y)

        body = ct_stage(x4, 4 * dim, self.config[3], "body")

        def upconv(x, out_dim, name):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.leaky_relu(Conv2d(x.shape[-1], 3, dtype=d, name=f"{name}_c0")(x), 0.2)
            return nn.leaky_relu(Conv2d(out_dim, 3, dtype=d, name=f"{name}_c1")(x), 0.2)

        u = upconv(body + x4, 4 * dim, "up3_conv")
        u = ct_stage(u, 2 * dim, self.config[4], "up3")
        u = upconv(u + x3, 2 * dim, "up2_conv")
        u = ct_stage(u, dim, self.config[5], "up2")
        u = upconv(u + x2, dim, "up1_conv")
        u = ct_stage(u, dim // 2, self.config[6], "up1")

        u = u + Conv2d(dim, 3, use_bias=False, dtype=d, name="m_res")(x1)
        out = Conv2d(dim, 3, use_bias=False, dtype=d, name="m_tail")(u)
        return nn.leaky_relu(out, 0.2)


class TSCUNet(nn.Module):
    clip_size: int = 5
    in_nc: int = 3
    out_nc: int = 3
    dim: int = 64
    scale: int = 2
    residual: bool = True
    config: tuple = (2, 2, 2, 2, 2, 2, 2)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.clip_size % 2 == 0:
            raise ValueError("TSCUNet clip_size must be odd")
        b, t, h, w, c = x.shape
        if t < self.clip_size:
            raise ValueError(
                f"input clip size {t} < model clip size {self.clip_size}"
            )
        # t == clip_size: the reference's single-output clip forward.
        # t > clip_size (beyond reference): STREAMING sequence inference —
        # every pyramid level runs once over all consecutive frame triples,
        # so the per-frame features that sliding clip windows would
        # recompute ~3x per level are shared; returns t - (clip_size-1)
        # output frames as (B, T', H*s, W*s, C).
        x = x.astype(self.dtype)

        # reflect-pad H/W to a 64 multiple (U-Net downsamples 8x, windows 8)
        pad_h = int(np.ceil(h / 64) * 64 - h)
        pad_w = int(np.ceil(w / 64) * 64 - w)
        if not train:
            # reference tscunet_arch.py:307-309: eval adds 64px extra padding
            # on each axis to push reflection artifacts past the crop
            pad_h += 64
            pad_w += 64
        pt, pb = pad_h // 2 + pad_h % 2, pad_h // 2
        pl_, pr = pad_w // 2 + pad_w % 2, pad_w // 2
        xf = x.reshape(b * t, h, w, c)
        if pad_h or pad_w:
            xf = jnp.pad(xf, ((0, 0), (pt, pb), (pl_, pr), (0, 0)), mode="reflect")
        hp, wp = h + pad_h, w + pad_w

        feat = Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype, name="m_head")(xf)
        feat = feat.reshape(b, t, hp, wp, self.dim)
        frames0 = feat

        cur = feat
        for li in range((self.clip_size - 1) // 2):
            block = TSCUNetBlock(
                self.dim, self.config, dtype=self.dtype, name=f"m_layers_{li}"
            )
            tt = cur.shape[1]
            # ALL consecutive triples in one batched block call: identical
            # math to the reference's per-window loop (the block is
            # batch-independent), one conv dispatch instead of tt-2, and in
            # sequence mode each triple is computed exactly once
            trip = jnp.concatenate(
                [cur[:, : tt - 2], cur[:, 1 : tt - 1], cur[:, 2:]], axis=-1
            )  # (b, tt-2, hp, wp, 3*dim)
            trip = trip.reshape(b * (tt - 2), hp, wp, 3 * self.dim)
            out = block(trip, train)
            cur = out.reshape(b, tt - 2, hp, wp, self.dim)

        r = self.clip_size // 2
        n_out = cur.shape[1]  # == t - 2r
        y = cur.reshape(b * n_out, hp, wp, self.dim)
        if self.residual:
            centers = frames0[:, r : r + n_out].reshape(b * n_out, hp, wp, self.dim)
            y = y + Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype, name="m_res")(centers)

        # RRDB upsample tail
        for i in range(2):
            y = RRDB(self.dim, 32, dtype=self.dtype, name=f"up_rrdb_{i}")(y)
        s = self.scale
        stage = 0
        while s > 1:
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            y = nn.leaky_relu(Conv2d(self.dim, 3, dtype=self.dtype, name=f"up_conv_{stage}")(y), 0.2)
            s //= 2
            stage += 1
        y = nn.leaky_relu(Conv2d(self.dim, 3, dtype=self.dtype, name="up_final")(y), 0.2)
        # reference returns m_tail output directly (tscunet_arch.py:360-365)
        out = Conv2d(self.out_nc, 3, use_bias=False, dtype=self.dtype, name="m_tail")(y)

        # crop the padding back out at output scale
        out = out[
            :, pt * self.scale : (pt + h) * self.scale,
            pl_ * self.scale : (pl_ + w) * self.scale, :,
        ].astype(jnp.float32)
        if n_out == 1:
            return out  # reference-identical single-frame clip contract
        return out.reshape(b, n_out, h * self.scale, w * self.scale, self.out_nc)


@ARCH_REGISTRY.register(name="tscunet")
def tscunet(scale: int = 2, clip_size: int = 5, dim: int = 64, **kwargs) -> TSCUNet:
    kwargs.pop("state", None)
    kwargs.pop("input_resolution", None)
    nb = kwargs.pop("nb", None)
    if nb is not None and "config" not in kwargs:
        kwargs["config"] = (int(nb),) * 7
    return TSCUNet(clip_size=clip_size, dim=dim, scale=scale, **kwargs)
