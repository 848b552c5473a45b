"""DRCT — Dense-Residual-Connected Transformer (flax/NHWC).

Parity: /root/reference/traiNNer/archs/drct_arch.py (1007 LoC; DRCT with
drct/drct_l presets): each Residual Dense Group runs SwinIR-style window
attention blocks whose outputs are projected to a growth width and densely
concatenated (RRDB-style 0.2 residual scaling), giving transformer blocks
dense feature reuse.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, pixel_shuffle
from trainner_redux_tpu.archs.swinir_arch import SwinBlock
from trainner_redux_tpu.utils.registry import SPANDREL_REGISTRY


class RDG(nn.Module):
    """Residual dense group (reference drct_arch.py:229-412): five swin
    blocks at GROWING widths dim + k*gc over the dense concatenation, each
    followed by a 1x1 'adjust' conv to gc (lrelu) — the last adjusts back to
    dim; output is x5 * 0.2 + x. Heads follow the reference's divisibility
    rule num_heads - (width % num_heads); swin4/swin5 use mlp_ratio=1."""

    dim: int
    growth: int
    num_heads: int
    window_size: int
    mlp_ratio: float
    drop_path: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        gc = self.growth
        nh = self.num_heads
        ws = self.window_size
        outs: list[jnp.ndarray] = []
        h = x
        for i in range(5):
            width = self.dim + i * gc
            heads = nh if i == 0 else nh - (width % nh)
            shift = ws // 2 if i % 2 == 1 else 0
            mlp = self.mlp_ratio if i < 3 else 1.0
            inp = jnp.concatenate([x] + outs, axis=-1) if outs else x
            h = SwinBlock(
                width, heads, ws, shift, mlp, drop_path=self.drop_path,
                dtype=self.dtype, name=f"swin_{i + 1}",
            )(inp, train)
            if i < 4:
                h = nn.leaky_relu(
                    Conv2d(gc, 1, dtype=self.dtype, name=f"adjust_{i + 1}")(h), 0.2
                )
                outs.append(h)
            else:
                h = Conv2d(self.dim, 1, dtype=self.dtype, name=f"adjust_{i + 1}")(h)
        return h * 0.2 + x


class DRCT(nn.Module):
    upscale: int = 4
    embed_dim: int = 180
    depths: tuple = (6,) * 6
    num_heads: tuple = (6,) * 6
    window_size: int = 16
    growth: int = 32
    mlp_ratio: float = 2.0
    drop_path_rate: float = 0.1
    img_range: float = 1.0
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
        # patch_embed LN (patch_norm=True default, reference drct_arch.py)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32, name="patch_norm")(feat)
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, len(self.depths))]
        for gi, heads in enumerate(self.num_heads):
            body = RDG(
                self.embed_dim, self.growth, heads, ws, self.mlp_ratio, dpr[gi],
                dtype=self.dtype, name=f"layers_{gi}",
            )(body, train)
        body = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(body)
        body = Conv2d(self.embed_dim, 3, dtype=self.dtype, name="conv_after_body")(body)
        feat = feat + body

        feat = nn.leaky_relu(
            Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv_before_upsample")(feat), 0.01
        )
        s = self.upscale
        stage = 0
        while s > 1:
            f = 3 if s % 3 == 0 else 2
            feat = Conv2d(self.num_feat * f * f, 3, dtype=self.dtype, name=f"upsample_{stage}")(feat)
            feat = pixel_shuffle(feat, f)
            s //= f
            stage += 1
        out = Conv2d(3, 3, dtype=self.dtype, name="conv_last")(feat)
        if out.shape[-1] == 3:
            out = out / self.img_range + mean
        return out[:, : in_h * self.upscale, : in_w * self.upscale, :].astype(jnp.float32)


def _drct_factory(**defaults):
    def factory(scale: int = 4, **kwargs):
        cfg = dict(defaults)
        for k in ("img_size", "patch_size", "in_chans", "ape", "patch_norm",
                  "use_checkpoint", "drop_rate", "attn_drop_rate", "qkv_bias",
                  "qk_scale", "resi_connection", "gc", "upsampler", "depths"):
            if k == "gc" and k in kwargs:
                cfg["growth"] = kwargs.pop(k)
            else:
                kwargs.pop(k, None)
        cfg.update(kwargs)
        cfg["num_heads"] = tuple(cfg.get("num_heads", (6,) * 6))
        cfg["depths"] = tuple(cfg.get("depths", (6,) * len(cfg["num_heads"])))
        return DRCT(upscale=scale, **cfg)

    return factory


SPANDREL_REGISTRY.register(_drct_factory(), name="drct")
SPANDREL_REGISTRY.register(
    _drct_factory(num_heads=(6,) * 12, depths=(6,) * 12), name="drct_l"
)
# drct_xl preset (reference drct_arch.py:980-1000): 14 groups, window 16
SPANDREL_REGISTRY.register(
    _drct_factory(num_heads=(6,) * 14, depths=(6,) * 14, window_size=16),
    name="drct_xl",
)
