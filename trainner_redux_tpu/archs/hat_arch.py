"""HAT — Hybrid Attention Transformer (flax/NHWC).

Parity: /root/reference/traiNNer/archs/hat_arch.py (HAT + hat_l :1173,
hat_m :1230, hat_s :1287 presets): window attention with a parallel
channel-attention conv branch (CAB, scaled by conv_scale), overlapping
cross-attention (OCAB) closing each residual group, pixel-shuffle upsampler.

TPU formulation mirrors swinir_arch.py: static precomputed masks/bias
indices, einsum attention in bf16 with fp32 softmax. OCAB's overlapping
key/value windows are gathered via strided reshape + concatenation of
shifted copies (no unfold materialization beyond the overlap halo).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import (
    DropPath,
    WindowAttention,
    _attn_mask,
    window_partition,
    window_reverse,
)
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


class CAB(nn.Module):
    """Channel attention conv branch."""

    num_feat: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = max(1, self.num_feat // int(self.compress_ratio))
        y = Conv2d(mid, 3, dtype=self.dtype, name="conv0")(x)
        y = nn.gelu(y, approximate=False)
        y = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv1")(y)
        # squeeze-excite channel attention
        att = y.mean(axis=(1, 2), keepdims=True)
        sq = max(1, self.num_feat // int(self.squeeze_factor))
        att = Conv2d(sq, 1, dtype=self.dtype, name="att0")(att)
        att = nn.relu(att)
        att = Conv2d(self.num_feat, 1, dtype=self.dtype, name="att1")(att)
        return y * nn.sigmoid(att)


class HAB(nn.Module):
    """Hybrid attention block: W-MSA + conv_scale * CAB, then MLP."""

    dim: int
    num_heads: int
    window_size: int = 16
    shift_size: int = 0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift_size if min(h, w) > ws else 0

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)

        conv_x = CAB(
            self.dim, self.compress_ratio, self.squeeze_factor, dtype=self.dtype,
            name="conv_block",
        )(xn)

        if shift > 0:
            xs = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
        else:
            xs = xn
        from trainner_redux_tpu.ops.pallas.window_attention import (
            fused_window_mhsa_supported,
        )

        attn_mod = WindowAttention(
            self.dim, ws, self.num_heads, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, name="attn",
        )
        if self.qk_scale is None and fused_window_mhsa_supported(h, w, ws, self.dim, self.num_heads):
            attn_x = attn_mod(xs, None, fused_shift=shift)
        else:
            windows = window_partition(xs, ws)
            mask = _attn_mask(h, w, ws, shift)
            attn_x = window_reverse(attn_mod(windows, mask), ws, h, w)
        if shift > 0:
            attn_x = jnp.roll(attn_x, (shift, shift), axis=(1, 2))

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            attn_x + self.conv_scale * conv_x, train
        )

        hidden = int(self.dim * self.mlp_ratio)
        # the attention half mixes in the CAB conv branch, but the pre-LN
        # MLP half is SwinIR-identical — run it as one fused Pallas kernel
        from trainner_redux_tpu.archs.fused_block_util import fused_mlp_residual

        fused = fused_mlp_residual(
            self, x, hidden, self.drop_path, train, ws, self.dtype
        )
        if fused is not None:
            return fused

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(y)
        return x + DropPath(self.drop_path, name="drop_path2")(y, train)


class OCAB(nn.Module):
    """Overlapping cross-attention block: queries from windows, keys/values
    from enlarged (overlapping) windows."""

    dim: int
    num_heads: int
    window_size: int = 16
    overlap_ratio: float = 0.5
    qkv_bias: bool = True
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        b, h, w, c = x.shape
        ws = self.window_size
        ows = int(ws * self.overlap_ratio) + ws  # overlapping window size
        pad = (ows - ws) // 2
        nh = self.num_heads
        hd = self.dim // nh
        scale = hd**-0.5

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)

        qkv = nn.Dense(
            self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="qkv",
        )(xn)
        q, kv = qkv[..., : self.dim], qkv[..., self.dim :]

        # queries: plain windows
        q_win = window_partition(q, ws)  # (b*nW, ws*ws, c)

        # keys/values: overlapping windows via halo padding + extraction
        # reference OCAB unfolds with nn.Unfold(padding=pad) which ZERO-pads
        # the halo (hat_arch.py:409-413) — edge/reflect here diverges at the
        # image border (caught by the hat_m_full full-size golden)
        kv_pad = jnp.pad(kv, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        nwh, nww = h // ws, w // ws
        # gather each overlapping window with dynamic-free strided slicing:
        # unfold as (nwh, nww) grid of (ows, ows) patches with stride ws
        idx_h = (np.arange(nwh)[:, None] * ws + np.arange(ows)[None, :]).reshape(-1)
        idx_w = (np.arange(nww)[:, None] * ws + np.arange(ows)[None, :]).reshape(-1)
        kv_patches = kv_pad[:, idx_h][:, :, idx_w]  # (b, nwh*ows, nww*ows, 2c)
        kv_patches = kv_patches.reshape(b, nwh, ows, nww, ows, 2 * c)
        kv_patches = kv_patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * nwh * nww, ows * ows, 2 * c
        )
        k_win, v_win = kv_patches[..., :c], kv_patches[..., c:]

        b_, nq, _ = q_win.shape
        nk = ows * ows
        qh = q_win.reshape(b_, nq, nh, hd).transpose(0, 2, 1, 3)
        kh = k_win.reshape(b_, nk, nh, hd).transpose(0, 2, 1, 3)
        vh = v_win.reshape(b_, nk, nh, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", qh * scale, kh, preferred_element_type=jnp.float32
        )

        # relative position bias between ws-window and ows-window
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((ws + ows - 1) ** 2, nh),
            jnp.float32,
        )
        idx = jnp.asarray(_ocab_rel_index(ws, ows))
        bias = bias_table[idx.reshape(-1)].reshape(nq, nk, nh).transpose(2, 0, 1)
        attn = attn + bias[None]

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b_, nq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)
        x = shortcut + window_reverse(out, ws, h, w)

        hidden = int(self.dim * self.mlp_ratio)
        from trainner_redux_tpu.archs.fused_block_util import fused_mlp_residual

        fused = fused_mlp_residual(self, x, hidden, 0.0, train, ws, self.dtype)
        if fused is not None:
            return fused

        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(y)
        return x + y


def _ocab_rel_index(ws: int, ows: int) -> np.ndarray:
    """(ws^2, ows^2) relative position index between window and overlapping
    window grids (torch HAT calc_rpi_oca parity)."""
    coords_q = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    # overlapping window coordinates relative to the q window origin
    off = (ows - ws) // 2
    coords_k = (
        np.stack(np.meshgrid(np.arange(ows), np.arange(ows), indexing="ij")).reshape(2, -1)
        - off
    )
    rel = coords_q[:, :, None] - coords_k[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ows - 1 - off
    rel[:, :, 1] += ows - 1 - off
    rel[:, :, 0] *= ws + ows - 1
    return rel.sum(-1)


class AttenBlocks(nn.Module):
    """A residual group: HAB blocks + one OCAB."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    compress_ratio: int
    squeeze_factor: int
    conv_scale: float
    overlap_ratio: float
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: float | None
    drop_paths: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        res = x
        for i in range(self.depth):
            x = HAB(
                self.dim, self.num_heads, self.window_size,
                0 if i % 2 == 0 else self.window_size // 2,
                self.compress_ratio, self.squeeze_factor, self.conv_scale,
                self.mlp_ratio, self.qkv_bias, self.qk_scale, self.drop_paths[i],
                dtype=self.dtype, name=f"blocks_{i}",
            )(x, train)
        x = OCAB(
            self.dim, self.num_heads, self.window_size, self.overlap_ratio,
            self.qkv_bias, self.mlp_ratio, dtype=self.dtype, name="overlap_attn",
        )(x, train)
        x = Conv2d(self.dim, 3, dtype=self.dtype, name="conv")(x)
        return x + res


class HAT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: tuple = (6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6)
    window_size: int = 16
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    img_range: float = 1.0
    upsampler: str = "pixelshuffle"
    resi_connection: str = "1conv"
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        if x.shape[-1] == 3:
            x = (x - mean) * self.img_range

        ws = self.window_size
        ph = (ws - in_h % ws) % ws
        pw = (ws - in_w % ws) % ws
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        # patch_embed applies LN when patch_norm=True (reference HAT default)
        body = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="patch_norm"
        )(feat)
        total_depth = sum(self.depths)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total_depth)]
        cursor = 0
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            body = AttenBlocks(
                self.embed_dim, depth, heads, ws, int(self.compress_ratio),
                int(self.squeeze_factor), self.conv_scale, self.overlap_ratio,
                self.mlp_ratio, self.qkv_bias, self.qk_scale,
                tuple(dpr[cursor : cursor + depth]),
                dtype=self.dtype, name=f"layers_{i}",
            )(body, train)
            cursor += depth
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        feat = nn.leaky_relu(
            Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(feat),
            0.01,
        )
        s = self.upscale
        stage = 0
        while s > 1:
            f = 3 if s % 3 == 0 else 2
            feat = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype, name=f"upsample_{stage}")(feat)
            feat = pixel_shuffle(feat, f)
            s //= f
            stage += 1
        out = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(feat)

        if out.shape[-1] == 3:
            out = out / self.img_range + mean
        return out[:, : in_h * self.upscale, : in_w * self.upscale, :].astype(jnp.float32)


def _hat_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "patch_size", "ape", "patch_norm", "use_checkpoint",
                  "drop_rate", "attn_drop_rate"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depths"] = tuple(cfg["depths"])
        cfg["num_heads"] = tuple(cfg["num_heads"])
        cfg["compress_ratio"] = int(cfg.get("compress_ratio", 3))
        cfg["squeeze_factor"] = int(cfg.get("squeeze_factor", 30))
        return HAT(upscale=scale, **cfg)

    return factory


ARCH_REGISTRY.register(_hat_factory(), name="hat")
# presets pass mlp_ratio=2.0 explicitly (reference hat_arch.py:1186,1244,1300);
# the class default stays 4.0 like the reference HAT class
ARCH_REGISTRY.register(
    _hat_factory(embed_dim=144, depths=[6] * 6, num_heads=[6] * 6, window_size=16,
                 compress_ratio=24, squeeze_factor=24, mlp_ratio=2.0),
    name="hat_s",
)
ARCH_REGISTRY.register(
    _hat_factory(embed_dim=180, depths=[6] * 6, num_heads=[6] * 6, window_size=16,
                 mlp_ratio=2.0),
    name="hat_m",
)
ARCH_REGISTRY.register(
    _hat_factory(embed_dim=180, depths=[6] * 12, num_heads=[6] * 12, window_size=16,
                 mlp_ratio=2.0),
    name="hat_l",
)
