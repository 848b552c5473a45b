"""SwinIR (flax/NHWC) — shifted-window transformer for image restoration.

Capability parity with the reference's spandrel-backed SwinIR factories
(/root/reference/traiNNer/archs/swinir_arch.py: swinir_l/m/s presets) and the
original SwinIR semantics: window attention with relative position bias,
shifted windows with masking, RSTB residual groups, pixelshuffle /
pixelshuffledirect / nearest+conv upsamplers, img_range mean-shift, and the
`start_unshuffle` input pixel-unshuffle extension.

TPU-native formulation:
- images stay NHWC; window partition is pure reshape/transpose (no gather);
- attention is einsum on the MXU with fp32 softmax under a bf16 policy;
- the shifted-window attention mask and relative-position index are
  precomputed as static numpy constants per compiled (H, W) — zero runtime
  overhead, no boolean ops in the hot path;
- shifts use jnp.roll (lowered to cheap collective-permute-free slices).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle, pixel_unshuffle
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


@lru_cache(maxsize=32)
def _relative_position_index(window_size: int) -> np.ndarray:
    """(win^2, win^2) indices into the (2w-1)^2 bias table (torch parity)."""
    ws = window_size
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]  # 2, n, n
    relative = relative.transpose(1, 2, 0).astype(np.int64)
    relative[:, :, 0] += ws - 1
    relative[:, :, 1] += ws - 1
    relative[:, :, 0] *= 2 * ws - 1
    return relative.sum(-1)


@lru_cache(maxsize=64)
def _attn_mask(hp: int, wp: int, window_size: int, shift: int) -> np.ndarray | None:
    """Static attention mask for shifted windows: (nW, win^2, win^2) with
    0 / -100 entries, or None when no shift."""
    if shift == 0:
        return None
    img_mask = np.zeros((hp, wp))
    cnt = 0
    for h in (
        slice(0, -window_size),
        slice(-window_size, -shift),
        slice(-shift, None),
    ):
        for w in (
            slice(0, -window_size),
            slice(-window_size, -shift),
            slice(-shift, None),
        ):
            img_mask[h, w] = cnt
            cnt += 1
    mask = img_mask.reshape(
        hp // window_size, window_size, wp // window_size, window_size
    )
    mask = mask.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = mask[:, None, :] - mask[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B,H,W,C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: np.ndarray | None,
        *,
        fused_shift: int | None = None,
    ) -> jnp.ndarray:
        nh = self.num_heads
        hd = self.dim // nh
        ws = self.window_size
        n = ws * ws
        scale = self.qk_scale or hd**-0.5

        qkv_dense = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="qkv",
        )
        proj_dense = nn.Dense(
            self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, nh),
            jnp.float32,
        )
        idx = jnp.asarray(_relative_position_index(self.window_size))
        # jnp.take: robust when params arrive as numpy leaves (a numpy
        # table indexed by a tracer would call __array__ and fail)
        bias = jnp.take(bias_table, idx.reshape(-1), axis=0)
        bias = bias.reshape(n, n, nh).transpose(2, 0, 1)  # (nh, n, n)

        if fused_shift is not None:
            # x is the full (B, H, W, C) map (already cyclically shifted by
            # the caller); window partition/reverse never materialize — the
            # Pallas kernel cuts windows by BlockSpec indexing and fuses
            # QK^T + bias + mask + fp32 softmax + PV in VMEM.
            from trainner_redux_tpu.ops.pallas.window_attention import (
                fused_window_mhsa,
                shift_mask_kinds,
            )

            qkv = qkv_dense(x)  # (B, H, W, 3C), channel groups [q|k|v]
            if fused_shift > 0:
                masks = jnp.asarray(shift_mask_kinds(ws, fused_shift))
                bias_kinds = bias[None] + masks[:, None]  # (4, nh, n, n)
            else:
                bias_kinds = bias[None]  # (1, nh, n, n)
            out = fused_window_mhsa(qkv, bias_kinds, nh, hd, ws)
            return proj_dense(out)

        b_, _, c = x.shape
        qkv = qkv_dense(x)
        qkv = qkv.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (b_, nh, n, hd)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            m = jnp.asarray(mask)  # (nW, n, n)
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + m[None, :, None]
            attn = attn.reshape(b_, nh, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, self.dim)
        return proj_dense(out)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        return jnp.where(mask, x / keep, 0.0)


class _AttnParams(nn.Module):
    """Param tree of WindowAttention (qkv/proj/bias table) for the fused
    block path — scoped names match the unfused modules exactly."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool

    @nn.compact
    def __call__(self):
        from trainner_redux_tpu.archs.fused_block_util import DenseParams

        wq, bq = DenseParams(
            self.dim, 3 * self.dim, self.qkv_bias, name="qkv"
        )()
        wp, bp = DenseParams(self.dim, self.dim, True, name="proj")()
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        return wq, bq, wp, bp, table


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        # x: (B, H, W, C), H/W are multiples of window_size (padded by caller)
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0

        from trainner_redux_tpu.ops.pallas.fused_block import (
            fused_attn_block,
            fused_block_interpret,
            fused_block_supported,
            fused_ln_mlp,
            fused_swin_block_train,
        )

        hidden = int(self.dim * self.mlp_ratio)
        if self.qk_scale is None and fused_block_supported(
            h, w, ws, self.dim, self.num_heads, hidden
        ):
            # Fully-fused path: the whole block runs as two Pallas kernels
            # (LN1+qkv+window-MHSA+proj+residual, then LN2+MLP+residual) —
            # the residual stream round-trips HBM twice per block instead of
            # ~12 times. Params are declared through shape/name-compatible
            # stubs so the checkpoint tree is identical to the unfused path.
            from trainner_redux_tpu.ops.pallas.window_attention import (
                shift_mask_kinds,
            )

            from trainner_redux_tpu.archs.fused_block_util import (
                DenseParams,
                LNParams,
                droppath_scale,
            )

            nh = self.num_heads
            hd = self.dim // nh
            n = ws * ws
            g1, be1 = LNParams(self.dim, name="norm1")()
            wq, bq, wp, bp, table = _AttnParams(
                self.dim, ws, nh, self.qkv_bias, name="attn"
            )()
            g2, be2 = LNParams(self.dim, name="norm2")()
            w1, b1 = DenseParams(self.dim, hidden, True, name="mlp_fc1")()
            w2, b2 = DenseParams(hidden, self.dim, True, name="mlp_fc2")()

            idx = jnp.asarray(_relative_position_index(ws))
            bias = jnp.take(table, idx.reshape(-1), axis=0)
            bias = bias.reshape(n, n, nh).transpose(2, 0, 1)  # (nh, n, n)
            if shift > 0:
                masks = jnp.asarray(shift_mask_kinds(ws, shift))
                bias_kinds = bias[None] + masks[:, None]  # (4, nh, n, n)
            else:
                bias_kinds = bias[None]

            s1 = droppath_scale(self, self.drop_path, train, b)
            s2 = droppath_scale(self, self.drop_path, train, b)

            interp = fused_block_interpret()
            xc = x.astype(self.dtype)
            if shift > 0:
                xc = jnp.roll(xc, (-shift, -shift), axis=(1, 2))
            if train:
                # ONE kernel for the whole block (both halves), saved-P
                # backward (4 MXU products/unit instead of the recompute
                # path's 6, no softmax chain). Both halves are per-token
                # outside attention, so the block commutes with the cyclic
                # roll — compute in the rolled frame, unroll the output.
                out = fused_swin_block_train(
                    xc, g1, be1, wq, bq, wp, bp, bias_kinds, g2, be2,
                    w1, b1, w2, b2, s1, s2, nh, hd, ws, 1e-5, interp,
                )
                if shift > 0:
                    out = jnp.roll(out, (shift, shift), axis=(1, 2))
                return out
            z = fused_attn_block(
                xc, g1, be1, wq, bq, wp, bp, bias_kinds, s1, nh, hd, ws,
                1e-5, interp,
            )
            if shift > 0:
                z = jnp.roll(z, (shift, shift), axis=(1, 2))
            return fused_ln_mlp(
                z, g2, be2, w1, b1, w2, b2, s2, ws, 1e-5, interp
            )

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        from trainner_redux_tpu.ops.pallas.window_attention import (
            fused_window_mhsa_supported,
        )

        attn_mod = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, name="attn",
        )
        if self.qk_scale is None and fused_window_mhsa_supported(h, w, ws, self.dim, self.num_heads):
            x = attn_mod(x, None, fused_shift=shift)
        else:
            windows = window_partition(x, ws)
            mask = _attn_mask(h, w, ws, shift)
            x = window_reverse(attn_mod(windows, mask), ws, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(x, train)

        # MLP
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class RSTB(nn.Module):
    """Residual Swin Transformer Block (a residual group + conv)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: float | None
    drop_paths: tuple
    resi_connection: str = "1conv"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            x = SwinBlock(
                self.dim,
                self.num_heads,
                self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.mlp_ratio,
                self.qkv_bias,
                self.qk_scale,
                self.drop_paths[i],
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, train)
        if self.resi_connection == "1conv":
            x = Conv2d(self.dim, 3, dtype=self.dtype, name="conv")(x)
        else:  # 3conv bottleneck
            x = Conv2d(self.dim // 4, 3, dtype=self.dtype, name="conv_0")(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv2d(self.dim // 4, 1, dtype=self.dtype, name="conv_1")(x)
            x = nn.leaky_relu(x, 0.2)
            x = Conv2d(self.dim, 3, dtype=self.dtype, name="conv_2")(x)
        return x + res


class SwinIR(nn.Module):
    upscale: int = 4
    img_size: int = 64
    in_chans: int = 3
    embed_dim: int = 96
    depths: tuple = (6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    patch_norm: bool = True
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    start_unshuffle: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        effective_scale = self.upscale

        if self.start_unshuffle > 1:
            x = pixel_unshuffle(x, self.start_unshuffle)
            effective_scale = self.upscale * self.start_unshuffle

        # torch SwinIR always mean-shifts 3-channel inputs and scales by img_range
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], dtype=x.dtype)
        if x.shape[-1] == 3:
            x = (x - mean) * self.img_range

        # pad to window multiple (reflect, like check_image_size)
        h, w = x.shape[1], x.shape[2]
        ws = self.window_size
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        hp, wp = h + ph, w + pw

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)

        # body
        total_depth = sum(self.depths)
        dpr = [
            float(v) for v in np.linspace(0, self.drop_path_rate, total_depth)
        ]
        body = feat
        if self.patch_norm:
            body = nn.LayerNorm(
                dtype=self.dtype, param_dtype=jnp.float32, name="patch_norm"
            )(body)
        cursor = 0
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            body = RSTB(
                self.embed_dim,
                depth,
                heads,
                ws,
                self.mlp_ratio,
                self.qkv_bias,
                self.qk_scale,
                tuple(dpr[cursor : cursor + depth]),
                self.resi_connection,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(body, train)
            cursor += depth
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(body)
        if self.resi_connection == "1conv":
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        else:
            body = Conv2d(self.embed_dim // 4, 3, dtype=self.dtype, name="conv_after_body_0")(body)
            body = nn.leaky_relu(body, 0.2)
            body = Conv2d(self.embed_dim // 4, 1, dtype=self.dtype, name="conv_after_body_1")(body)
            body = nn.leaky_relu(body, 0.2)
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body_2")(body)
        feat = feat + body

        out_ch = self.in_chans
        if self.upsampler == "pixelshuffle":
            feat = nn.leaky_relu(
                Conv2d(64, 3, dtype=self.dtype, name="conv_before_upsample")(feat), 0.01
            )
            s = effective_scale
            stage = 0
            while s > 1:
                f = 3 if s % 3 == 0 else 2
                feat = Conv2d(64 * f * f, 3, dtype=self.dtype, name=f"upsample_{stage}")(feat)
                feat = pixel_shuffle(feat, f)
                s //= f
                stage += 1
            out = Conv2d(out_ch, 3, dtype=self.dtype, name="conv_last")(feat)
        elif self.upsampler == "pixelshuffledirect":
            feat = Conv2d(
                out_ch * effective_scale**2, 3, dtype=self.dtype, name="upsample_direct"
            )(feat)
            out = pixel_shuffle(feat, effective_scale)
        elif self.upsampler == "nearest+conv":
            feat = nn.leaky_relu(
                Conv2d(64, 3, dtype=self.dtype, name="conv_before_upsample")(feat), 0.01
            )
            s = effective_scale
            stage = 1
            while s > 1:
                feat = jnp.repeat(jnp.repeat(feat, 2, axis=1), 2, axis=2)
                feat = nn.leaky_relu(
                    Conv2d(64, 3, dtype=self.dtype, name=f"conv_up{stage}")(feat), 0.2
                )
                s //= 2
                stage += 1
            feat = nn.leaky_relu(Conv2d(64, 3, dtype=self.dtype, name="conv_hr")(feat), 0.2)
            out = Conv2d(out_ch, 3, dtype=self.dtype, name="conv_last")(feat)
        else:  # '' — restoration (scale 1)
            out = Conv2d(out_ch, 3, dtype=self.dtype, name="conv_last")(feat)

        if out.shape[-1] == 3:
            out = out / self.img_range + mean

        out = out[:, : in_h * self.upscale, : in_w * self.upscale, :]
        return out.astype(jnp.float32)


def _swinir_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        # accepted-but-unused torch knobs
        for k in ("img_size", "patch_size", "ape", "use_checkpoint", "drop_rate",
                  "attn_drop_rate", "in_chans"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depths"] = tuple(cfg["depths"])
        cfg["num_heads"] = tuple(cfg["num_heads"])
        return SwinIR(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(
    _swinir_factory(
        embed_dim=240, depths=[6] * 9, num_heads=[8] * 9, window_size=8,
        upsampler="nearest+conv", resi_connection="3conv",
    ),
    name="swinir_l",
)
SPANDREL_REGISTRY.register(
    _swinir_factory(
        embed_dim=180, depths=[6] * 6, num_heads=[6] * 6, window_size=8,
        upsampler="pixelshuffle", resi_connection="1conv",
    ),
    name="swinir_m",
)
SPANDREL_REGISTRY.register(
    _swinir_factory(
        embed_dim=60, depths=[6] * 4, num_heads=[6] * 4, window_size=8,
        upsampler="pixelshuffledirect", resi_connection="1conv",
    ),
    name="swinir_s",
)
