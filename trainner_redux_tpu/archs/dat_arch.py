"""DAT — Dual Aggregation Transformer (flax/NHWC).

Parity: /root/reference/traiNNer/archs/dat_arch.py (DAT :903, dat/dat_s/
dat_2/dat_light factories :1083+): alternating adaptive spatial (rectangular
dual-branch shifted windows, dynamic position bias) and adaptive channel
(XCiT-style) attention blocks, each interacting with a depthwise-conv branch
through the Adaptive Interaction Module; SGFN feed-forward.

TPU notes: window masks and relative-coordinate mother-sets are static numpy
constants; the interaction convs use batch-statistics normalization without
running averages (torch's BatchNorm2d train-mode behavior; eval-time running
stats are a documented divergence).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import DropPath
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class BatchNormNoStats(nn.Module):
    """Torch-BatchNorm2d parity: batch statistics in training, stored running
    statistics in eval (filled by the checkpoint converter; identity 0/1 for
    from-scratch models, where a post-training calibration pass can refresh
    them deterministically instead of threading mutable state through jit)."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        if train:
            axes = tuple(range(x.ndim - 1))
            mu = x.mean(axis=axes, keepdims=True)
            v = x.var(axis=axes, keepdims=True)
            # calibration hooks: no-ops unless apply() makes "bn_calib"
            # mutable (utils/bn_recalibrate.py); torch stores the UNBIASED
            # variance in running_var, hence the n/(n-1) correction
            n = x.size // c
            self.sow("bn_calib", "mean", mu.reshape(-1).astype(jnp.float32))
            self.sow(
                "bn_calib", "var",
                (v.reshape(-1) * (n / max(n - 1, 1))).astype(jnp.float32),
            )
        else:
            mu, v = mean.astype(x.dtype), var.astype(x.dtype)
        y = (x - mu) * jax.lax.rsqrt(v + self.epsilon)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)


class SGFN(nn.Module):
    """Spatial-gate feed-forward: half the hidden channels gate the other
    half through a depthwise conv."""

    hidden: int
    out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="sg_norm")(x2)
        x2 = Conv2d(
            self.hidden // 2, 3, feature_group_count=self.hidden // 2,
            dtype=self.dtype, name="sg_conv",
        )(x2)
        x = x1 * x2
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(x)


@lru_cache(maxsize=64)
def _rect_rel_index(h_sp: int, w_sp: int) -> np.ndarray:
    coords = np.stack(
        np.meshgrid(np.arange(h_sp), np.arange(w_sp), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += h_sp - 1
    rel[:, :, 1] += w_sp - 1
    rel[:, :, 0] *= 2 * w_sp - 1
    return rel.sum(-1)


@lru_cache(maxsize=64)
def _rect_bias_coords(h_sp: int, w_sp: int) -> np.ndarray:
    bh = np.arange(1 - h_sp, h_sp)
    bw = np.arange(1 - w_sp, w_sp)
    biases = np.stack(np.meshgrid(bh, bw, indexing="ij")).reshape(2, -1).T
    return biases.astype(np.float32)


@lru_cache(maxsize=128)
def _rect_mask(hp: int, wp: int, h_sp: int, w_sp: int, sh: int, sw: int) -> np.ndarray:
    """Shifted rectangular-window attention mask (nW, n, n)."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -h_sp), slice(-h_sp, -sh), slice(-sh, None)):
        for wss in (slice(0, -w_sp), slice(-w_sp, -sw), slice(-sw, None)):
            img[hs, wss] = cnt
            cnt += 1
    m = img.reshape(hp // h_sp, h_sp, wp // w_sp, w_sp).transpose(0, 2, 1, 3)
    m = m.reshape(-1, h_sp * w_sp)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _rect_partition(x: jnp.ndarray, h_sp: int, w_sp: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // h_sp, h_sp, w // w_sp, w_sp, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, h_sp * w_sp, c)


def _rect_reverse(x: jnp.ndarray, h_sp: int, w_sp: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // h_sp) * (w // w_sp))
    x = x.reshape(b, h // h_sp, w // w_sp, h_sp, w_sp, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class DynamicPosBias(nn.Module):
    num_heads: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, biases: jnp.ndarray) -> jnp.ndarray:
        # hidden == 0 degenerates to a bias-only rpe, exactly like the
        # reference's 0-element Linears at tiny dims (dat_arch.py:131-146)
        if self.hidden == 0:
            x = jnp.zeros(biases.shape[:-1] + (0,), self.dtype)
            return nn.Dense(self.num_heads, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=nn.initializers.zeros,  # 0-dim fan-in
                            name="pos3")(x)
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="pos_proj")(biases)
        for i in (1, 2):
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=f"norm{i}")(x)
            x = nn.relu(x)
            x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name=f"pos{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_heads, dtype=self.dtype, param_dtype=jnp.float32, name="pos3")(x)


class SpatialAttentionBranch(nn.Module):
    """Rectangular-window attention on half the channels (one orientation)."""

    dim: int
    h_sp: int
    w_sp: int
    num_heads: int
    qk_scale: float | None = None
    shift_hw: tuple | None = None  # (row, col) roll amounts when shifted
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qkv: jnp.ndarray, mask: np.ndarray | None) -> jnp.ndarray:
        # qkv: (3, B, H, W, c_half)
        _, b, h, w, c = qkv.shape
        nh = self.num_heads
        hd = c // nh
        scale = self.qk_scale or hd**-0.5
        n = self.h_sp * self.w_sp

        from trainner_redux_tpu.ops.pallas.window_attention import (
            fused_rect_mhsa,
            fused_rect_mhsa_supported,
            rect_shift_mask_kinds,
        )

        if (
            self.qk_scale is None
            and fused_rect_mhsa_supported(h, w, self.h_sp, self.w_sp, c, nh)
        ):
            # Fused rect-window MHSA: one Pallas kernel over h_sp-row strips
            # with w_sp-column windows (n = h_sp*w_sp is a native MXU tile
            # for DAT geometries). The dynamic position bias MLP runs
            # outside (static coords) and joins the shift masks as a
            # (K, nh, n, n) kind table; its cotangent flows back into the
            # DynamicPosBias parameters.
            from trainner_redux_tpu.ops.pallas.fused_block import (
                fused_block_interpret,
            )

            pos = DynamicPosBias(
                nh, (self.dim // 4) // 4, dtype=self.dtype, name="pos"
            )(jnp.asarray(_rect_bias_coords(self.h_sp, self.w_sp)))
            idx = jnp.asarray(_rect_rel_index(self.h_sp, self.w_sp))
            bias = pos[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
            bias = bias.astype(jnp.float32)
            if mask is not None:
                # mask came from _rect_mask(shift): rebuild as kind table
                sh, sw = self.shift_hw
                kinds = jnp.asarray(
                    rect_shift_mask_kinds(self.h_sp, self.w_sp, sh, sw)
                )
                bias_kinds = bias[None] + kinds[:, None]
            else:
                bias_kinds = bias[None]
            qkv_flat = jnp.concatenate([qkv[0], qkv[1], qkv[2]], axis=-1)
            out = fused_rect_mhsa(
                qkv_flat.astype(self.dtype), bias_kinds, nh, hd,
                self.h_sp, self.w_sp, fused_block_interpret(),
            )
            return out

        q = _rect_partition(qkv[0], self.h_sp, self.w_sp)
        k = _rect_partition(qkv[1], self.h_sp, self.w_sp)
        v = _rect_partition(qkv[2], self.h_sp, self.w_sp)
        b_ = q.shape[0]
        q = q.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k, preferred_element_type=jnp.float32)

        # reference dat_arch.py:208: DynamicPosBias(self.dim // 4, heads) with
        # internal pos_dim = dim // 4 again -> hidden = branch_dim // 16
        pos = DynamicPosBias(nh, (self.dim // 4) // 4, dtype=self.dtype, name="pos")(
            jnp.asarray(_rect_bias_coords(self.h_sp, self.w_sp))
        )
        idx = jnp.asarray(_rect_rel_index(self.h_sp, self.w_sp))
        bias = pos[idx.reshape(-1)].reshape(n, n, nh).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n) + jnp.asarray(mask)[None, :, None]
            attn = attn.reshape(b_, nh, n, n)

        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return _rect_reverse(out, self.h_sp, self.w_sp, h, w)


class AdaptiveSpatialAttention(nn.Module):
    dim: int
    num_heads: int
    split_size: tuple = (2, 4)
    shift_size: tuple = (1, 2)
    qkv_bias: bool = True
    qk_scale: float | None = None
    do_shift: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, h, w, 3, c).transpose(3, 0, 1, 2, 4)  # (3,B,H,W,C)
        v_img = qkv[2]

        ssh, ssw = self.split_size
        max_sp = max(ssh, ssw)
        ph = (max_sp - h % max_sp) % max_sp
        pw = (max_sp - w % max_sp) % max_sp
        qkv_p = jnp.pad(qkv, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = h + ph, w + pw

        half = c // 2
        sh0, sh1 = self.shift_size
        if self.do_shift:
            qkv0 = jnp.roll(qkv_p[..., :half], (-sh0, -sh1), axis=(2, 3))
            qkv1 = jnp.roll(qkv_p[..., half:], (-sh1, -sh0), axis=(2, 3))
            m0 = _rect_mask(hp, wp, ssh, ssw, sh0, sh1)
            m1 = _rect_mask(hp, wp, ssw, ssh, sh1, sh0)
        else:
            qkv0 = qkv_p[..., :half]
            qkv1 = qkv_p[..., half:]
            m0 = m1 = None

        x0 = SpatialAttentionBranch(
            half, ssh, ssw, self.num_heads // 2, self.qk_scale,
            shift_hw=(sh0, sh1) if self.do_shift else None, dtype=self.dtype,
            name="attns_0",
        )(qkv0, m0)
        x1 = SpatialAttentionBranch(
            half, ssw, ssh, self.num_heads // 2, self.qk_scale,
            shift_hw=(sh1, sh0) if self.do_shift else None, dtype=self.dtype,
            name="attns_1",
        )(qkv1, m1)
        if self.do_shift:
            x0 = jnp.roll(x0, (sh0, sh1), axis=(1, 2))
            x1 = jnp.roll(x1, (sh1, sh0), axis=(1, 2))
        attened = jnp.concatenate([x0[:, :h, :w], x1[:, :h, :w]], axis=-1)

        # conv branch + AIM
        conv_x = Conv2d(c, 3, feature_group_count=c, dtype=self.dtype, name="dwconv")(v_img)
        conv_x = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="dw_bn")(conv_x, train), approximate=False)

        ch_map = conv_x.mean(axis=(1, 2), keepdims=True)
        ch_map = Conv2d(max(1, c // 8), 1, dtype=self.dtype, name="ci_0")(ch_map)
        ch_map = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="ci_bn")(ch_map, train), approximate=False)
        ch_map = Conv2d(c, 1, dtype=self.dtype, name="ci_1")(ch_map)

        sp_map = Conv2d(max(1, c // 16), 1, dtype=self.dtype, name="si_0")(attened)
        sp_map = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="si_bn")(sp_map, train), approximate=False)
        sp_map = Conv2d(1, 1, dtype=self.dtype, name="si_1")(sp_map)

        attened = attened * nn.sigmoid(ch_map)
        conv_x = conv_x * nn.sigmoid(sp_map)
        out = attened + conv_x
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class AdaptiveChannelAttention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: float | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        temperature = self.param(
            "temperature", nn.initializers.ones, (nh, 1, 1), jnp.float32
        )
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, param_dtype=jnp.float32,
            name="qkv",
        )(x).reshape(b, h * w, 3, nh, hd)
        q = qkv[:, :, 0].transpose(0, 2, 3, 1)  # (B, nh, hd, N)
        k = qkv[:, :, 1].transpose(0, 2, 3, 1)
        v = qkv[:, :, 2].transpose(0, 2, 3, 1)
        v_img = qkv[:, :, 2].reshape(b, h, w, c)

        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        attn = jnp.einsum(
            "bhcn,bhdn->bhcd", q, k, preferred_element_type=jnp.float32
        ) * temperature[None]
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attened = jnp.einsum("bhcd,bhdn->bhcn", attn, v.astype(self.dtype))
        attened = attened.transpose(0, 3, 1, 2).reshape(b, h, w, c)

        conv_x = Conv2d(c, 3, feature_group_count=c, dtype=self.dtype, name="dwconv")(v_img)
        conv_x = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="dw_bn")(conv_x, train), approximate=False)

        ch_map = attened.mean(axis=(1, 2), keepdims=True)
        ch_map = Conv2d(max(1, c // 8), 1, dtype=self.dtype, name="ci_0")(ch_map)
        ch_map = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="ci_bn")(ch_map, train), approximate=False)
        ch_map = Conv2d(c, 1, dtype=self.dtype, name="ci_1")(ch_map)

        sp_map = Conv2d(max(1, c // 16), 1, dtype=self.dtype, name="si_0")(conv_x)
        sp_map = nn.gelu(BatchNormNoStats(dtype=self.dtype, name="si_bn")(sp_map, train), approximate=False)
        sp_map = Conv2d(1, 1, dtype=self.dtype, name="si_1")(sp_map)

        attened = attened * nn.sigmoid(sp_map)
        conv_x = conv_x * nn.sigmoid(ch_map)
        out = attened + conv_x
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class DATB(nn.Module):
    dim: int
    num_heads: int
    split_size: tuple
    shift_size: tuple
    expansion_factor: float
    qkv_bias: bool
    qk_scale: float | None
    drop_path: float
    rg_idx: int
    b_idx: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if self.b_idx % 2 == 0:
            do_shift = (
                self.rg_idx % 2 == 0 and self.b_idx > 0 and (self.b_idx - 2) % 4 == 0
            ) or (self.rg_idx % 2 != 0 and self.b_idx % 4 == 0)
            att = AdaptiveSpatialAttention(
                self.dim, self.num_heads, self.split_size, self.shift_size,
                self.qkv_bias, self.qk_scale, do_shift, dtype=self.dtype, name="attn",
            )(xn, train)
        else:
            att = AdaptiveChannelAttention(
                self.dim, self.num_heads, self.qkv_bias, self.qk_scale,
                dtype=self.dtype, name="attn",
            )(xn, train)
        x = x + DropPath(self.drop_path, name="dp1")(att, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = SGFN(
            int(self.dim * self.expansion_factor), self.dim, dtype=self.dtype, name="ffn"
        )(y)
        return x + DropPath(self.drop_path, name="dp2")(y, train)


class DAT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 180
    split_size: tuple = (8, 32)
    depth: tuple = (6, 6, 6, 6, 6, 6)
    num_heads: tuple = (6, 6, 6, 6, 6, 6)
    expansion_factor: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_path_rate: float = 0.1
    img_range: float = 1.0
    resi_connection: str = "1conv"
    upsampler: str = "pixelshuffle"
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        in_h, in_w = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        if x.shape[-1] == 3:
            x = (x - mean) * self.img_range

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="before_RG")(feat)

        shift = (self.split_size[0] // 2, self.split_size[1] // 2)
        total = sum(self.depth)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        cursor = 0
        for rg in range(len(self.depth)):
            res = body
            for b_idx in range(self.depth[rg]):
                res = DATB(
                    self.embed_dim, self.num_heads[rg], tuple(self.split_size), shift,
                    self.expansion_factor, self.qkv_bias, self.qk_scale,
                    dpr[cursor + b_idx], rg, b_idx, dtype=self.dtype,
                    name=f"layers_{rg}_blocks_{b_idx}",
                )(res, train)
            res = Conv2d(self.embed_dim, 3, dtype=self.dtype, name=f"layers_{rg}_conv")(res)
            body = body + res
            cursor += self.depth[rg]

        # final LN after all residual groups (reference dat_arch.py:1007,1054)
        body = nn.LayerNorm(
            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm"
        )(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        if self.upsampler == "pixelshuffledirect":
            feat = Conv2d(
                self.in_chans * self.upscale**2, 3, dtype=self.dtype, name="up_direct"
            )(feat)
            out = pixel_shuffle(feat, self.upscale)
        else:
            feat = nn.leaky_relu(
                Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(feat),
                0.01,
            )
            s = self.upscale
            stage = 0
            while s > 1:
                f = 3 if s % 3 == 0 else 2
                feat = Conv2d(
                    self.num_feat * f * f, 3, dtype=self.dtype, name=f"upsample_{stage}"
                )(feat)
                feat = pixel_shuffle(feat, f)
                s //= f
                stage += 1
            out = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(feat)

        if out.shape[-1] == 3:
            out = out / self.img_range + mean
        return out[:, : in_h * self.upscale, : in_w * self.upscale, :].astype(jnp.float32)


def _dat_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "use_chk", "drop_rate", "attn_drop_rate"):
            kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["depth"] = tuple(cfg.get("depth", (6,) * 6))
        cfg["num_heads"] = tuple(cfg.get("num_heads", (6,) * 6))
        cfg["split_size"] = tuple(cfg.get("split_size", (8, 32)))
        cfg["expansion_factor"] = float(cfg.get("expansion_factor", 4.0))
        return DAT(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(_dat_factory(), name="dat")
SPANDREL_REGISTRY.register(
    _dat_factory(split_size=(8, 16), expansion_factor=2.0), name="dat_s"
)
SPANDREL_REGISTRY.register(_dat_factory(expansion_factor=2.0), name="dat_2")
SPANDREL_REGISTRY.register(
    _dat_factory(
        embed_dim=60, depth=(18,), num_heads=(6,), expansion_factor=2.0,
        upsampler="pixelshuffledirect",
    ),
    name="dat_light",
)
