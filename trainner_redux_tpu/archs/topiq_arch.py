"""TOPIQ (CFANet) — top-down IQA network (flax/NHWC).

Parity: reference traiNNer/archs/topiq_arch.py:229-497 (CFANet): frozen
ResNet-50 multi-scale features, gated local pooling (FR mode: |x-y| diff
gating over concatenated dist/ref/diff features), per-scale dim reduction +
pre-norm transformer encoders with interpolated 2D positional embeddings,
coarse-to-fine cross-scale transformer decoding, attention pooling and a
LayerNorm MLP score head mapped to MOS.

The reference downloads both the timm ResNet-50 backbone and the CFANet
head weights; zero-egress deployments must provide them locally (the
metric layer gates on TRAINNER_WEIGHTS_DIR — perceptual_metrics.py). The
eval-mode BatchNorms consume loaded running statistics (identity defaults
when randomly initialized).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class FrozenBN(nn.Module):
    """Eval-mode batch norm with loaded running statistics."""

    features: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) + bias.astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.planes
        out = nn.relu(FrozenBN(p, name="bn1")(
            Conv2d(p, 1, padding=0, use_bias=False, dtype=self.dtype, name="conv1")(x)))
        out = nn.relu(FrozenBN(p, name="bn2")(
            Conv2d(p, 3, stride=self.stride, use_bias=False, dtype=self.dtype,
                   name="conv2")(out)))
        out = FrozenBN(p * 4, name="bn3")(
            Conv2d(p * 4, 1, padding=0, use_bias=False, dtype=self.dtype,
                   name="conv3")(out))
        if self.downsample:
            x = FrozenBN(p * 4, name="ds_bn")(
                Conv2d(p * 4, 1, stride=self.stride, padding=0, use_bias=False,
                       dtype=self.dtype, name="ds_conv")(x))
        return nn.relu(out + x)


class ResNet50Features(nn.Module):
    """timm resnet50 features_only parity: returns 5 stages
    (relu 64, layer1 256, layer2 512, layer3 1024, layer4 2048)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        y = Conv2d(64, 7, stride=2, padding=3, use_bias=False, dtype=self.dtype,
                   name="conv1")(x)
        y = nn.relu(FrozenBN(64, name="bn1")(y))
        feats.append(y)
        y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        y = nn.max_pool(y, (3, 3), strides=(2, 2))
        for li, (planes, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        ):
            for bi in range(blocks):
                y = Bottleneck(
                    planes, stride if bi == 0 else 1, downsample=bi == 0,
                    dtype=self.dtype, name=f"layer{li + 1}_b{bi}",
                )(y)
            feats.append(y)
        return feats


class PreNormEncoderLayer(nn.Module):
    dim: int
    nhead: int = 4
    ff: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, N, C)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, param_dtype=jnp.float32,
            name="self_attn",
        )(y, y)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = nn.Dense(self.ff, dtype=self.dtype, param_dtype=jnp.float32, name="ff1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="ff2")(y)
        return x + y


class PreNormDecoderLayer(nn.Module):
    dim: int
    nhead: int = 4
    ff: int = 1024
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
        # reference topiq_arch.py:165-172: norm2 normalizes the MEMORY, the
        # declared self_attn is never applied — cross-attention + FFN only.
        memory = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                              name="norm2")(memory)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(tgt)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, param_dtype=jnp.float32,
            name="cross_attn",
        )(y, memory)
        tgt = tgt + y
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm3")(tgt)
        y = nn.Dense(self.ff, dtype=self.dtype, param_dtype=jnp.float32, name="ff1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="ff2")(y)
        return tgt + y


class CFANet(nn.Module):
    use_ref: bool = True
    num_class: int = 1
    inter_dim: int = 256
    num_heads: int = 4
    num_attn_layers: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray | None = None,
                 train: bool = False) -> jnp.ndarray:
        mean = jnp.asarray(_IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(_IMAGENET_STD, x.dtype)
        backbone = ResNet50Features(dtype=self.dtype, name="semantic_model")
        dist_feats = backbone((x - mean) / std)
        ref_feats = backbone((y - mean) / std) if self.use_ref else None

        ff = min(4 * self.inter_dim, 2048)
        half = self.inter_dim // 2
        h_emb = self.param("h_emb", nn.initializers.truncated_normal(0.02),
                           (32, 1, half), jnp.float32)
        w_emb = self.param("w_emb", nn.initializers.truncated_normal(0.02),
                           (1, 32, half), jnp.float32)
        pos = jnp.concatenate(
            [jnp.tile(h_emb, (1, 32, 1)), jnp.tile(w_emb, (32, 1, 1))], axis=-1
        )  # (32, 32, inter_dim)

        th, tw = dist_feats[-1].shape[1], dist_feats[-1].shape[2]
        tokens = []
        n_levels = len(dist_feats)
        for i in reversed(range(n_levels)):
            df = dist_feats[i]
            if self.use_ref:
                rf = ref_feats[i]
                diff = jnp.sqrt(jnp.square(df - rf) + 1e-12)
                feat = jnp.concatenate([df, rf, diff], axis=-1)
                wgt = nn.gelu(Conv2d(64, 1, padding=0, dtype=self.dtype,
                                     name=f"wp_{i}_0")(diff), approximate=False)
                wgt = nn.gelu(Conv2d(64, 3, dtype=self.dtype, name=f"wp_{i}_1")(wgt),
                              approximate=False)
                wgt = nn.sigmoid(Conv2d(1, 3, dtype=self.dtype, name=f"wp_{i}_2")(wgt))
                feat = feat * wgt
            else:
                # GatedConv (reference topiq_arch.py:206-226): split a 1x1
                # 2x-conv, gate gelu(x1) by a sigmoid weight block on x2
                dim = df.shape[-1]
                split = Conv2d(dim * 2, 1, padding=0, dtype=self.dtype,
                               name=f"wp_{i}_split")(df)
                x1, x2 = split[..., :dim], split[..., dim:]
                wgt = nn.gelu(Conv2d(64, 1, padding=0, dtype=self.dtype,
                                     name=f"wp_{i}_0")(x2), approximate=False)
                wgt = nn.gelu(Conv2d(64, 3, dtype=self.dtype,
                                     name=f"wp_{i}_1")(wgt), approximate=False)
                wgt = nn.sigmoid(Conv2d(1, 3, dtype=self.dtype,
                                        name=f"wp_{i}_2")(wgt))
                feat = nn.gelu(x1, approximate=False) * wgt
            if feat.shape[1] > th and feat.shape[2] > tw:
                # average pool to the deepest level's resolution
                fh, fw = feat.shape[1] // th, feat.shape[2] // tw
                feat = nn.avg_pool(feat, (fh, fw), strides=(fh, fw))
            b, fh, fw, _ = feat.shape
            # torch F.interpolate bicubic (a=-0.75, no antialias) parity
            from trainner_redux_tpu.ops.resize import resize as _resize

            p = _resize(pos[None].astype(jnp.float32), (fh, fw), "bicubic", False)[0]
            feat = nn.gelu(Conv2d(self.inter_dim, 1, padding=0, dtype=self.dtype,
                                  name=f"dim_reduce_{i}")(feat), approximate=False)
            tok = feat.reshape(b, fh * fw, self.inter_dim)
            tok = tok + p.reshape(1, fh * fw, self.inter_dim).astype(tok.dtype)
            for li in range(self.num_attn_layers):
                tok = PreNormEncoderLayer(self.inter_dim, self.num_heads, ff,
                                          dtype=self.dtype,
                                          name=f"sa_{i}_l{li}")(tok)
            tokens.append(tok)

        query = tokens[0]
        for i in range(len(tokens) - 1):
            for li in range(self.num_attn_layers):
                query = PreNormDecoderLayer(self.inter_dim, self.num_heads, ff,
                                            dtype=self.dtype,
                                            name=f"ca_{i}_l{li}")(query, tokens[i + 1])
        final = PreNormEncoderLayer(self.inter_dim, self.num_heads, ff,
                                    dtype=self.dtype, name="attn_pool")(query)
        feat = final.mean(axis=1)
        for i in range(2):
            feat = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                param_dtype=jnp.float32, name=f"score_ln{i}")(feat)
            feat = nn.gelu(nn.Dense(self.inter_dim, dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name=f"score_fc{i}")(feat), approximate=False)
        score = nn.Dense(self.num_class, dtype=self.dtype, param_dtype=jnp.float32,
                         name="score_out")(feat)
        if self.num_class > 1:
            probs = jax.nn.softmax(score, axis=-1)
            mos = (probs * jnp.arange(1, self.num_class + 1)).sum(-1)
            return mos
        return score[..., 0]


def topiq(scale: int = 1, use_ref: bool = True, num_class: int = 1, **kwargs):
    return CFANet(use_ref=use_ref, num_class=num_class)


ARCH_REGISTRY.register(topiq, name="topiq")
ARCH_REGISTRY.register(topiq, name="cfanet")
