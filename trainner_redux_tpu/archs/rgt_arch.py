"""RGT — Recursive Generalization Transformer SR (flax/NHWC).

Parity: the reference's spandrel-backed rgt/rgt_s factories
(/root/reference/traiNNer/archs/rgt_arch.py:8-87) pin the configuration
surface (embed_dim 180, depth (6,)*8 / (6,)*6, heads 6, split_size (8,32),
c_ratio 0.5, mlp_ratio 2); block internals follow the RGT paper (Xie et
al., ICLR 2024): alternating L-SA (dual rectangle-window attention with
dynamic position bias, reused from the DAT implementation — RGT shares the
DAT authors' window machinery) and RG-SA (recursive generalization:
stride-4 depthwise reductions to a representative map, channel-scaled
cross-attention with conv position encoding on values), SGFN-style gated
FFNs, SwinIR-style shell with before_RG token norm. Checkpoint
converter/exporter in utils/torch_compat.py (structural round-trip
tested; layout verified against a real checkpoint when one lands).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.dat_arch import SGFN, SpatialAttentionBranch, _rect_mask
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class RGSA(nn.Module):
    """Recursive-generalization self-attention."""

    dim: int
    num_heads: int
    c_ratio: float = 0.5
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        cr = max(self.num_heads, int(c * self.c_ratio))
        cr -= cr % self.num_heads
        nh = self.num_heads
        # recursive stride-4 depthwise reduction to a representative map:
        # ONE shared conv applied r times (upstream RG_SA reduction1)
        r = max(1, int(math.log2(max(4, min(h, w)) / 4) // 2))
        reduction = Conv2d(c, 4, stride=4, padding=0, feature_group_count=c,
                           dtype=self.dtype, name="reduction1")
        y = x
        for _ in range(r):
            if min(y.shape[1], y.shape[2]) < 4:
                break
            y = reduction(y)
        y = Conv2d(cr, 1, padding=0, dtype=self.dtype, name="conv")(y)
        y = Conv2d(cr, 3, feature_group_count=cr, dtype=self.dtype, name="dwconv")(y)
        y = nn.gelu(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm_act")(y),
            approximate=False,
        )
        rep = y.reshape(b, -1, cr)  # (B, M, cr)

        q = nn.Dense(cr, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, name="q")(x.reshape(b, h * w, c))
        k = nn.Dense(cr, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, name="k")(rep)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype,
                     param_dtype=jnp.float32, name="v")(rep)
        # conv position encoding on values (reshape rep map back to image)
        mh = y.shape[1]
        mw = y.shape[2]
        v_img = v.reshape(b, mh, mw, c)
        v_img = v_img + Conv2d(c, 3, feature_group_count=c, dtype=self.dtype,
                               name="cpe")(v_img)
        v = v_img.reshape(b, mh * mw, c)

        hd_q = cr // nh
        hd_v = c // nh
        qh = q.reshape(b, h * w, nh, hd_q).transpose(0, 2, 1, 3)
        kh = k.reshape(b, -1, nh, hd_q).transpose(0, 2, 1, 3)
        vh = v.reshape(b, -1, nh, hd_v).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * (hd_q**-0.5), kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class RGTBlock(nn.Module):
    dim: int
    num_heads: int
    split_size: tuple = (8, 32)
    use_rgsa: bool = False
    do_shift: bool = False
    c_ratio: float = 0.5
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if self.use_rgsa:
            y = RGSA(self.dim, self.num_heads, self.c_ratio, self.qkv_bias,
                     dtype=self.dtype, name="attn")(y)
        else:
            ssh, ssw = self.split_size
            max_sp = max(ssh, ssw)
            ph, pw = (max_sp - h % max_sp) % max_sp, (max_sp - w % max_sp) % max_sp
            qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                           param_dtype=jnp.float32, name="qkv")(y)
            qkv = qkv.reshape(b, h, w, 3, c).transpose(3, 0, 1, 2, 4)
            qkv = jnp.pad(qkv, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
            hp, wp = h + ph, w + pw
            half = c // 2
            sh0, sh1 = ssh // 2, ssw // 2
            if self.do_shift:
                qkv0 = jnp.roll(qkv[..., :half], (-sh0, -sh1), axis=(2, 3))
                qkv1 = jnp.roll(qkv[..., half:], (-sh1, -sh0), axis=(2, 3))
                m0 = _rect_mask(hp, wp, ssh, ssw, sh0, sh1)
                m1 = _rect_mask(hp, wp, ssw, ssh, sh1, sh0)
            else:
                qkv0, qkv1 = qkv[..., :half], qkv[..., half:]
                m0 = m1 = None
            x0 = SpatialAttentionBranch(half, ssh, ssw, max(1, self.num_heads // 2),
                                        dtype=self.dtype, name="attns_0")(qkv0, m0)
            x1 = SpatialAttentionBranch(half, ssw, ssh, max(1, self.num_heads // 2),
                                        dtype=self.dtype, name="attns_1")(qkv1, m1)
            if self.do_shift:
                x0 = jnp.roll(x0, (sh0, sh1), axis=(1, 2))
                x1 = jnp.roll(x1, (sh1, sh0), axis=(1, 2))
            y = jnp.concatenate([x0[:, :h, :w], x1[:, :h, :w]], axis=-1)
            y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(y)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        z = SGFN(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                 name="ffn")(z)
        return x + z


class RGT(nn.Module):
    upscale: int = 4
    in_chans: int = 3
    embed_dim: int = 180
    depth: tuple = (6,) * 8
    num_heads: tuple = (6,) * 8
    split_size: tuple = (8, 32)
    c_ratio: float = 0.5
    mlp_ratio: float = 2.0
    qkv_bias: bool = True
    img_range: float = 1.0
    num_feat: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        x = x.astype(self.dtype)
        h0, w0 = x.shape[1], x.shape[2]
        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = (x - mean) * self.img_range
        mult = max(self.split_size)
        ph, pw = (mult - h0 % mult) % mult, (mult - w0 % mult) % mult
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        feat = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_first")(x)
        # upstream before_RG: rearrange to tokens + LayerNorm before groups
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="before_RG")(feat)
        gi = 0
        for li, (depth, heads) in enumerate(zip(self.depth, self.num_heads)):
            group_in = body
            for bi in range(depth):
                body = RGTBlock(
                    self.embed_dim, heads, tuple(self.split_size),
                    use_rgsa=bool(gi % 2), do_shift=bool((gi // 2) % 2),
                    c_ratio=self.c_ratio, mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias, dtype=self.dtype,
                    name=f"layers_{li}_b{bi}",
                )(body)
                gi += 1
            body = Conv2d(self.embed_dim, 3, dtype=self.dtype,
                          name=f"layers_{li}_conv")(body)
            body = body + group_in
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                            name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        y = nn.leaky_relu(Conv2d(self.num_feat, 3, dtype=self.dtype,
                                 name="conv_before_upsample")(feat), 0.01)
        s, stage = self.upscale, 0
        while s > 1:
            f = 3 if s % 3 == 0 else 2
            y = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype,
                       name=f"upsample_{stage}")(y)
            y = pixel_shuffle(y, f)
            s //= f
            stage += 1
        out = Conv2d(self.in_chans, 3, dtype=self.dtype, name="conv_last")(y)
        out = out / self.img_range + mean
        return out[:, : h0 * self.upscale, : w0 * self.upscale, :].astype(jnp.float32)


def _rgt_factory(n_groups):
    def factory(scale: int = 4, **kwargs):
        for k in ("img_size", "qk_scale", "drop_rate", "attn_drop_rate",
                  "drop_path_rate", "use_chk", "resi_connection"):
            kwargs.pop(k, None)
        for k in ("depth", "num_heads", "split_size"):
            if k in kwargs:
                kwargs[k] = tuple(kwargs[k])
        kwargs.setdefault("depth", (6,) * n_groups)
        kwargs.setdefault("num_heads", (6,) * n_groups)
        return RGT(upscale=scale, **kwargs)

    return factory


SPANDREL_REGISTRY.register(_rgt_factory(8), name="rgt")
SPANDREL_REGISTRY.register(_rgt_factory(6), name="rgt_s")
