"""SRVGGNetCompact (Real-ESRGAN "Compact" family), flax/NHWC.

Behavior parity with /root/reference/traiNNer/archs/srvgg_arch.py:9-88 and
its factory presets (compact :91, ultracompact :112, superultracompact :133):
a plain stack of 3x3 convs + activations, a final conv to C*scale^2, pixel
shuffle, plus a nearest-neighbor residual of the input.

TPU notes: this is the throughput king of the zoo — a pure conv pipeline
that XLA fuses end-to-end on the MXU; bf16 compute by default.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from trainner_redux_tpu.archs.arch_util import Conv2d, Dtype, PReLU, pixel_shuffle
from trainner_redux_tpu.utils.registry import ARCH_REGISTRY, SPANDREL_REGISTRY


class SRVGGNetCompact(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_feat: int = 64
    num_conv: int = 16
    upscale: int = 4
    act_type: str = "prelu"
    learn_residual: bool = True
    dtype: Dtype = jnp.float32

    def _act(self, x: jnp.ndarray, idx: int) -> jnp.ndarray:
        if self.act_type == "relu":
            return nn.relu(x)
        if self.act_type == "prelu":
            return PReLU(num_parameters=self.num_feat, name=f"act_{idx}")(x)
        if self.act_type == "leakyrelu":
            return nn.leaky_relu(x, negative_slope=0.1)
        raise ValueError(f"unsupported act_type {self.act_type}")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        del train  # no train/eval behavioral difference
        inp = x
        x = x.astype(self.dtype)
        x = Conv2d(self.num_feat, 3, dtype=self.dtype, name="body_0")(x)
        x = self._act(x, 0)
        for i in range(self.num_conv):
            x = Conv2d(self.num_feat, 3, dtype=self.dtype, name=f"body_{i + 1}")(x)
            x = self._act(x, i + 1)
        x = Conv2d(
            self.num_out_ch * self.upscale**2, 3, dtype=self.dtype, name="body_last"
        )(x)
        out = pixel_shuffle(x, self.upscale)
        if self.learn_residual:
            # nearest-neighbor upsample of the input as the residual base
            n, h, w, c = inp.shape
            base = jnp.repeat(jnp.repeat(inp, self.upscale, axis=1), self.upscale, axis=2)
            out = out + base.astype(out.dtype)
        return out.astype(jnp.float32)


@SPANDREL_REGISTRY.register()
def compact(
    scale: int = 4,
    num_in_ch: int = 3,
    num_out_ch: int = 3,
    num_feat: int = 64,
    num_conv: int = 16,
    act_type: str = "prelu",
    learn_residual: bool = True,
    **kwargs,
) -> SRVGGNetCompact:
    return SRVGGNetCompact(
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        num_feat=num_feat,
        num_conv=num_conv,
        upscale=scale,
        act_type=act_type,
        learn_residual=learn_residual,
        **kwargs,
    )


@SPANDREL_REGISTRY.register()
def ultracompact(
    scale: int = 4,
    num_in_ch: int = 3,
    num_out_ch: int = 3,
    num_feat: int = 64,
    num_conv: int = 8,
    **kwargs,
) -> SRVGGNetCompact:
    return compact(
        scale=scale,
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        num_feat=num_feat,
        num_conv=num_conv,
        **kwargs,
    )


@SPANDREL_REGISTRY.register()
def superultracompact(
    scale: int = 4,
    num_in_ch: int = 3,
    num_out_ch: int = 3,
    num_feat: int = 24,
    num_conv: int = 8,
    **kwargs,
) -> SRVGGNetCompact:
    return compact(
        scale=scale,
        num_in_ch=num_in_ch,
        num_out_ch=num_out_ch,
        num_feat=num_feat,
        num_conv=num_conv,
        **kwargs,
    )


ARCH_REGISTRY.register(compact, name="srvggnetcompact")
