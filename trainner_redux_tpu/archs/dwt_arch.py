"""DWT — Dilated Window Transformer SR (flax/NHWC).

Parity: reference traiNNer/archs/dwt_arch.py:937-1324 (DWT + dwt/dwt_s
factories): SwinIR-style residual transformer groups where each block's
`layer_kind` selects plain windows (0), cyclic-shifted windows (-1), or
dilated windows (k>0: the image splits into k x k sub-images and each
window samples pixels strided by PH/ws within its sub-image, with cyclic
shift); standard relative-position-bias window attention; boundary masks
are precomputed statically per (kind, shift, padded size) exactly as the
reference builds them.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import WindowAttention
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


def _win_part(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_rev(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    c = x.shape[-1]
    x = x.reshape(-1, h // ws, w // ws, ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


def _dilated_part(x: jnp.ndarray, ws: int, gp: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    ph, pw = h // gp, w // gp
    x = x.reshape(b, gp, ph, gp, pw, c).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ph, pw, c)
    # strided sampling: PH index = i * (ph//ws) + j
    x = x.reshape(-1, ws, ph // ws, ws, pw // ws, c)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(-1, ws * ws, c)


def _dilated_rev(x: jnp.ndarray, ws: int, h: int, w: int, gp: int) -> jnp.ndarray:
    c = x.shape[-1]
    ph, pw = h // gp, w // gp
    x = x.reshape(-1, ph // ws, pw // ws, ws, ws, c)
    x = x.transpose(0, 3, 1, 4, 2, 5).reshape(-1, ph, pw, c)
    x = x.reshape(-1, gp, gp, ph, pw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h, w, c)


@functools.lru_cache(maxsize=128)
def _mask_standard(h: int, w: int, ws: int, shift: int) -> np.ndarray | None:
    if shift == 0:
        return None
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for hs in slices:
        for vs in slices:
            img[:, hs, vs, :] = cnt
            cnt += 1
    mw = img.reshape(1, h // ws, ws, w // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    mw = mw.reshape(-1, ws * ws)
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=128)
def _mask_dilated(h: int, w: int, ws: int, shift: int, gp: int) -> np.ndarray | None:
    if shift == 0:
        return None
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for hs in slices:
        for vs in slices:
            img[:, hs, vs, :] = cnt
            cnt += 1
    ph, pw = h // gp, w // gp
    m = img.reshape(1, gp, ph, gp, pw, 1).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ph, pw)
    # contiguous sub-windows (reference's masking partition)
    m = m.reshape(-1, ph // ws, ws, pw // ws, ws).transpose(0, 1, 3, 2, 4)
    mw = m.reshape(-1, ws * ws)
    attn = mw[:, None, :] - mw[:, :, None]
    return np.where(attn != 0, -100.0, 0.0).astype(np.float32)


class DWTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    layer_kind: int
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        # the reference clamps shift by the STATIC img_size-derived
        # resolution, not the runtime one (dwt_arch.py:336-339)
        shift = self.shift_size
        kind = self.layer_kind
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if kind == -1:
            ys = jnp.roll(y, (-shift, -shift), axis=(1, 2)) if shift else y
            win = _win_part(ys, ws)
            mask = _mask_standard(h, w, ws, shift)
        elif kind == 0:
            win = _win_part(y, ws)
            mask = None
        else:
            ys = jnp.roll(y, (-shift, -shift), axis=(1, 2)) if shift else y
            win = _dilated_part(ys, ws, kind)
            mask = _mask_dilated(h, w, ws, shift, kind)
        att = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn"
        )(win, mask)
        if kind == -1:
            y = _win_rev(att, ws, h, w)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
        elif kind == 0:
            y = _win_rev(att, ws, h, w)
        else:
            y = _dilated_rev(att, ws, h, w, kind)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        z = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(z)
        return x + z


class DWT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 180
    depths: tuple = (6,) * 6
    num_heads: tuple = (6,) * 6
    window_size: int = 16
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    layer_kinds: tuple = (
        (0, -1, 0, -1, 0, -1),
        (0, -1, 0, -1, 0, -1),
        (0, 2, 0, 2, 0, 2),
        (0, 2, 0, 2, 0, 2),
        (0, 1, 0, 1, 0, 1),
        (0, 1, 0, 1, 0, 1),
    )
    img_size: int = 64
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range
        max_gp = max([max(k) for k in self.layer_kinds] + [1])
        mult = self.window_size * max(1, max_gp)
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        # patch_norm=True: LayerNorm after patch embedding
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="patch_norm")(feat)
        # static clamp exactly as the reference (based on img_size patches)
        ws_eff = self.window_size if self.img_size > self.window_size else self.img_size
        for li, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            group_in = body
            kinds = self.layer_kinds[li]
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else ws_eff // 2
                if self.img_size <= self.window_size:
                    shift = 0
                body = DWTBlock(
                    self.embed_dim, heads, ws_eff, shift, kinds[bi],
                    self.mlp_ratio, self.qkv_bias, dtype=self.dtype,
                    name=f"layers_{li}_b{bi}",
                )(body)
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name=f"layers_{li}_conv")(body)
            body = body + group_in
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        s = self.upscale
        if self.upsampler == "pixelshuffledirect":
            out = Conv2d(self.in_chans * s * s, 3, dtype=self.dtype, name="upsample")(feat)
            out = pixel_shuffle(out, s)
        else:
            y = nn.leaky_relu(Conv2d(self.num_feat, 3, dtype=self.dtype,
                                     name="conv_before_upsample")(feat), 0.01)
            r, stage = s, 0
            while r > 1:
                f = 3 if r % 3 == 0 else 2
                y = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype,
                           name=f"upsample_{stage}")(y)
                y = pixel_shuffle(y, f)
                r //= f
                stage += 1
            out = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(y)
        out = out / self.img_range + mean
        return out[:, : h0 * s, : w0 * s, :].astype(jnp.float32)


def _dwt_factory(window_size):
    def factory(scale: int = 4, **kwargs):
        for k in ("patch_size", "resi_connection", "ape", "patch_norm",
                  "use_checkpoint", "qk_scale", "drop_rate", "attn_drop_rate",
                  "drop_path_rate"):
            kwargs.pop(k, None)
        for k in ("depths", "num_heads"):
            if k in kwargs:
                kwargs[k] = tuple(kwargs[k])
        if "layer_kinds" in kwargs:
            kwargs["layer_kinds"] = tuple(tuple(v) for v in kwargs["layer_kinds"])
        kwargs.setdefault("window_size", window_size)
        return DWT(upscale=scale, **kwargs)

    return factory


ARCH_REGISTRY.register(_dwt_factory(16), name="dwt")
ARCH_REGISTRY.register(_dwt_factory(8), name="dwt_s")
