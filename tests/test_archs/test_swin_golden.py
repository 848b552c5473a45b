"""Golden parity: SwinIR window attention vs a torch reference implementation.

Validates the subtlest pieces of the transformer stack — window partition
order, shifted-window masks, relative-position-bias indexing, qkv packing —
by building the same block in torch, mapping the weights, and comparing
outputs to fp32 tolerance.
"""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from trainner_redux_tpu.archs.swinir_arch import (
    SwinBlock,
    _attn_mask,
    _relative_position_index,
)


class TorchWindowAttention(tnn.Module):
    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.dim = dim
        self.ws = window_size
        self.nh = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        self.bias_table = tnn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads)
        )
        idx = torch.from_numpy(_relative_position_index(window_size))
        self.register_buffer("rel_idx", idx)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = (
            self.qkv(x)
            .reshape(b_, n, 3, self.nh, c // self.nh)
            .permute(2, 0, 3, 1, 4)
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = (
            self.bias_table[self.rel_idx.view(-1)]
            .view(n, n, -1)
            .permute(2, 0, 1)
        )
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.nh, n, n) + torch.from_numpy(
                mask
            ).unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.nh, n, n)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(out)


class TorchSwinBlock(tnn.Module):
    def __init__(self, dim, heads, ws, shift, mlp_ratio=2.0):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):  # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.ws
        shortcut = x
        x = self.norm1(x)
        if self.shift:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
        x = x.view(b, h // ws, ws, w // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(-1, ws * ws, c)
        mask = _attn_mask(h, w, ws, self.shift)
        x = self.attn(x, mask)
        x = x.view(b, h // ws, w // ws, ws, ws, c).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, h, w, c)
        if self.shift:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


def _map_weights(tmodel: TorchSwinBlock) -> dict:
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    return {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            "qkv": {"kernel": sd["attn.qkv.weight"].T, "bias": sd["attn.qkv.bias"]},
            "proj": {"kernel": sd["attn.proj.weight"].T, "bias": sd["attn.proj.bias"]},
            "relative_position_bias_table": sd["attn.bias_table"],
        },
        "mlp_fc1": {"kernel": sd["fc1.weight"].T, "bias": sd["fc1.bias"]},
        "mlp_fc2": {"kernel": sd["fc2.weight"].T, "bias": sd["fc2.bias"]},
    }


def test_swin_block_matches_torch_no_shift():
    _run_case(shift=0)


def test_swin_block_matches_torch_shifted():
    _run_case(shift=2)


def _run_case(shift: int):
    torch.manual_seed(0)
    dim, heads, ws = 16, 2, 4
    tmodel = TorchSwinBlock(dim, heads, ws, shift).eval()
    with torch.no_grad():
        tmodel.attn.bias_table.normal_(0, 0.5)

    x = np.random.default_rng(0).random((2, 8, 12, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()

    block = SwinBlock(dim, heads, ws, shift, mlp_ratio=2.0, drop_path=0.0)
    params = _map_weights(tmodel)
    ours = np.asarray(block.apply({"params": params}, jnp.asarray(x), False))
    np.testing.assert_allclose(ours, ref, atol=3e-5)
