"""TSPANv2 — video SR with SPAN temporal blocks (flax/NHWC, clips
(B, T, H, W, C)).

Parity: reference traiNNer/archs/temporal_span_v2_arch.py:333-518 (TSPANv2 +
temporalspanv2 factory): per-frame conv head, (clip_size-1)//2 temporal
layers that slide 3-frame windows through TemporalSPANBlocks (Conv3XC head,
six SPAB blocks, 4-way feature concat, conv tail), center-frame residual,
pixelshuffle upsample, DIV2K mean/img_range normalization, centered reflect
padding to x64.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.span_arch import SPAB, Conv3XC
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class TemporalSPANBlock(nn.Module):
    dim: int
    num_blocks: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        d = self.dim
        feat = Conv3XC(x.shape[-1], d, gain=2, dtype=self.dtype, name="m_head")(x, train)
        outs = [feat]
        y = feat
        inter = None
        for i in range(self.num_blocks):
            y, out1, _sim = SPAB(d, dtype=self.dtype, name=f"blocks_{i}")(y, train)
            if i == 0:
                outs.append(y)  # out_b1
            if i == self.num_blocks - 1:
                inter = out1  # out_b5_2 (pre-activation intermediate)
        y = Conv3XC(d, d, gain=2, dtype=self.dtype, name="conv_post")(y, train)
        cat = jnp.concatenate([feat, y, outs[1], inter], axis=-1)
        y = Conv2d(d, 1, padding=0, dtype=self.dtype, name="conv_cat")(cat)
        y = Conv2d(d, 3, use_bias=False, dtype=self.dtype, name="m_tail")(y)
        return nn.leaky_relu(y, 0.2)


class TSPANv2(nn.Module):
    scale: int = 4
    in_nc: int = 3
    out_nc: int = 3
    clip_size: int = 5
    dim: int = 48
    num_blocks: int = 6
    residual: bool = True
    img_range: float = 255.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        # x: (B, T, H, W, C)
        if x.shape[1] != self.clip_size:
            raise ValueError(
                f"clip size {x.shape[1]} != model clip_size {self.clip_size}"
            )
        x = x.astype(self.dtype)
        b, t, h, w, c = x.shape
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range

        pad_h, pad_w = (-h) % 64, (-w) % 64
        top, left = (pad_h + 1) // 2, (pad_w + 1) // 2
        frames = x.reshape(b * t, h, w, c)
        frames = jnp.pad(
            frames, ((0, 0), (top, pad_h - top), (left, pad_w - left), (0, 0)),
            mode="reflect",
        )
        frames = Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype, name="m_head")(frames)
        hp, wp = frames.shape[1], frames.shape[2]
        feats = frames.reshape(b, t, hp, wp, self.dim)
        center = feats[:, t // 2]

        n_layers = (self.clip_size - 1) // 2
        for li in range(n_layers):
            block = TemporalSPANBlock(self.dim, self.num_blocks, dtype=self.dtype,
                                      name=f"m_layers_{li}")
            cur_t = feats.shape[1]
            outs = []
            for i in range(cur_t - 2):
                win = feats[:, i : i + 3]  # (B, 3, H, W, dim)
                win = win.transpose(0, 2, 3, 1, 4).reshape(b, hp, wp, 3 * self.dim)
                outs.append(block(win, train))
            feats = jnp.stack(outs, axis=1)

        y = feats[:, 0]
        if self.residual:
            y = y + Conv2d(self.dim, 3, use_bias=False, dtype=self.dtype, name="m_res")(center)
        y = Conv2d(self.dim * self.scale**2, 3, dtype=self.dtype, name="m_upsample")(y)
        y = pixel_shuffle(y, self.scale)
        y = Conv2d(self.out_nc, 3, use_bias=False, dtype=self.dtype, name="m_tail")(y)
        s = self.scale
        y = y[:, top * s : top * s + h * s, left * s : left * s + w * s, :]
        return (y / self.img_range + mean).astype(jnp.float32)


def temporalspanv2(
    scale: int = 4,
    num_in_ch: int = 3,
    num_out_ch: int = 3,
    num_frames: int = 5,
    feature_channels: int = 48,
    num_blocks: int = 6,
    residual: bool = True,
    img_range: float = 255.0,
    **kwargs,
) -> TSPANv2:
    return TSPANv2(
        scale=scale, in_nc=num_in_ch, out_nc=num_out_ch, clip_size=num_frames,
        dim=feature_channels, num_blocks=num_blocks, residual=residual,
        img_range=img_range,
    )


ARCH_REGISTRY.register(temporalspanv2, name="temporalspanv2")
