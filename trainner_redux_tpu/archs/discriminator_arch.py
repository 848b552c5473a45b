"""Discriminators: VGG-style and U-Net with spectral norm (flax/NHWC).

Parity: /root/reference/traiNNer/archs/discriminator_arch.py
(VGGStyleDiscriminator :9, UNetDiscriminatorSN :99). Both expose
`forward_with_features` semantics via `return_features=True` for the
FeatureMatchingLoss (reference sr_model.py:602-620).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, SNConv2d, bilinear_resize
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY


@ARCH_REGISTRY.register()
class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator for 128/256 inputs (SRGAN/ESRGAN)."""

    num_in_ch: int = 3
    num_feat: int = 64
    input_size: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        assert self.input_size in (128, 256)
        assert x.shape[1] == self.input_size, (
            f"Input size must be {self.input_size}, got {x.shape}"
        )
        nf = self.num_feat
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731

        def bn(v, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=name,
            )(v)

        feats = []
        x = x.astype(self.dtype)
        feat = lrelu(Conv2d(nf, 3, dtype=self.dtype, name="conv0_0")(x))
        feat = lrelu(
            bn(Conv2d(nf, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="conv0_1")(feat), "bn0_1")
        )
        feats.append(feat)
        mults = [2, 4, 8, 8] + ([8] if self.input_size == 256 else [])
        for i, m in enumerate(mults, start=1):
            feat = lrelu(
                bn(Conv2d(nf * m, 3, use_bias=False, dtype=self.dtype, name=f"conv{i}_0")(feat), f"bn{i}_0")
            )
            feat = lrelu(
                bn(
                    Conv2d(nf * m, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name=f"conv{i}_1")(feat),
                    f"bn{i}_1",
                )
            )
            feats.append(feat)

        flat = feat.reshape(feat.shape[0], -1)
        hidden = lrelu(
            nn.Dense(100, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(flat)
        )
        out = nn.Dense(1, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(hidden)
        out = out.astype(jnp.float32)
        if return_features:
            return out, feats
        return out


@ARCH_REGISTRY.register()
class UNetDiscriminatorSN(nn.Module):
    """U-Net discriminator with spectral normalization (Real-ESRGAN)."""

    num_in_ch: int = 3
    num_feat: int = 64
    skip_connection: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, return_features: bool = False
    ):
        nf = self.num_feat
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)  # noqa: E731
        x = x.astype(self.dtype)

        x0 = lrelu(Conv2d(nf, 3, dtype=self.dtype, name="conv0")(x))
        x1 = lrelu(
            SNConv2d(nf * 2, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x0, train)
        )
        x2 = lrelu(
            SNConv2d(nf * 4, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="conv2")(x1, train)
        )
        x3 = lrelu(
            SNConv2d(nf * 8, 4, stride=2, padding=1, use_bias=False, dtype=self.dtype, name="conv3")(x2, train)
        )

        u3 = bilinear_resize(x3, shape=(x2.shape[1], x2.shape[2]))
        x4 = lrelu(SNConv2d(nf * 4, 3, use_bias=False, dtype=self.dtype, name="conv4")(u3, train))
        if self.skip_connection:
            x4 = x4 + x2
        u4 = bilinear_resize(x4, shape=(x1.shape[1], x1.shape[2]))
        x5 = lrelu(SNConv2d(nf * 2, 3, use_bias=False, dtype=self.dtype, name="conv5")(u4, train))
        if self.skip_connection:
            x5 = x5 + x1
        u5 = bilinear_resize(x5, shape=(x0.shape[1], x0.shape[2]))
        x6 = lrelu(SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="conv6")(u5, train))
        if self.skip_connection:
            x6 = x6 + x0

        out = lrelu(SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="conv7")(x6, train))
        out = lrelu(SNConv2d(nf, 3, use_bias=False, dtype=self.dtype, name="conv8")(out, train))
        out = Conv2d(1, 3, dtype=self.dtype, name="conv9")(out)
        out = out.astype(jnp.float32)
        if return_features:
            return out, [x1, x2, x3, x4, x5, x6]
        return out
