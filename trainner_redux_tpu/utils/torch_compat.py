"""PyTorch checkpoint interop: load reference-ecosystem state dicts into
flax param trees.

Replaces the reference's dependency on `spandrel` for checkpoint-compatible
model loading and mirrors its key canonicalization
(/root/reference/traiNNer/models/base_model.py:570-699): `module.` prefix
stripping, `params`/`params_ema`/`state_dict` unwrapping, then a per-arch
key-mapping (torch OIHW conv kernels -> flax HWIO, linear weights
transposed). Converters register per flax arch class name.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from typing import Any

import numpy as np

# arch class name -> fn(torch_flat, module) -> flax_flat ('.'-joined keys)
_CONVERTERS: dict[str, Callable] = {}


def register_converter(arch_name: str):
    def deco(fn):
        _CONVERTERS[arch_name.lower()] = fn
        return fn

    return deco


def canonicalize_state_dict(sd: dict[str, Any]) -> dict[str, np.ndarray]:
    """Unwrap nested param keys and strip DDP prefixes (reference
    base_model.py:651-699)."""
    for key in ("params_ema", "params", "state_dict", "model_state_dict", "model"):
        if key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")
        if k.startswith(("initted", "step", "ema_model.", "online_model.")):
            # ema_pytorch bookkeeping keys
            k = k.removeprefix("ema_model.").removeprefix("online_model.")
            if k in ("initted", "step"):
                continue
        out[k] = np.asarray(v)
    return out


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a .pth or torch-layout .safetensors file into numpy arrays."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=True)
        sd = {
            k: v.numpy() if hasattr(v, "numpy") else v
            for k, v in (raw.items() if isinstance(raw, dict) else [])
        }
        # tensors may be nested one level (params/params_ema)
        for key in ("params_ema", "params", "state_dict"):
            if key in sd and isinstance(sd[key], dict):
                sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd[key].items()}
                break
    return canonicalize_state_dict(sd)


def conv_w(w: np.ndarray) -> np.ndarray:
    """Torch conv OIHW -> flax HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def linear_w(w: np.ndarray) -> np.ndarray:
    """Torch (out, in) -> flax (in, out)."""
    return np.ascontiguousarray(w.T)


# Families whose flax implementation was built from the PAPER because the
# upstream torch source ships only inside the absent spandrel package: the
# block-level composition is not guaranteed key-for-key (or even
# computation-for-computation) identical to upstream, so a converter would
# be an unverifiable guess. Revisit when spandrel or an official checkpoint
# is on disk (NEXT_STEPS).
CONVERTER_BLOCKED: dict[str, str] = {
}


def _convert_flat(path: str, module) -> dict[str, np.ndarray]:
    sd = load_torch_state_dict(path)
    arch_name = type(module).__name__.lower()
    conv = _CONVERTERS.get(arch_name)
    if conv is None:
        reason = CONVERTER_BLOCKED.get(arch_name)
        if reason:
            raise NotImplementedError(
                f"torch checkpoint conversion for '{arch_name}' is blocked: "
                f"{reason}"
            )
        raise NotImplementedError(
            f"No torch checkpoint converter registered for arch '{arch_name}'. "
            f"Available: {sorted(_CONVERTERS)}"
        )
    return conv(sd, module)


def load_torch_checkpoint(path: str, module, params_template: Any) -> Any:
    """Convert a torch checkpoint into a flax param tree for `module`.
    Non-param collections (spectral-norm u/v, BN batch stats) are dropped;
    use load_torch_checkpoint_collections to keep them."""
    from trainner_redux_tpu.models.base_model import BaseModel

    flat = {
        k: v for k, v in _convert_flat(path, module).items()
        if not k.startswith("__")
    }
    return BaseModel.unflatten_params(flat)


def load_torch_checkpoint_collections(path: str, module) -> dict[str, Any]:
    """Full conversion: returns {'params': tree, <collection>: tree, ...}.
    Converters mark auxiliary variables with '__<collection>__.' key
    prefixes (e.g. '__spectral__.conv1.u', '__batch_stats__.bn0.mean')."""
    from trainner_redux_tpu.models.base_model import BaseModel

    cols: dict[str, dict[str, np.ndarray]] = {"params": {}}
    for k, v in _convert_flat(path, module).items():
        if k.startswith("__"):
            col, rest = k[2:].split("__.", 1)
            cols.setdefault(col, {})[rest] = v
        else:
            cols["params"][k] = v
    return {c: BaseModel.unflatten_params(f) for c, f in cols.items()}


def export_torch_state_dict(params_flat: dict[str, np.ndarray], arch_name: str) -> dict:
    """Inverse mapping for safetensors export in torch layout (used so saved
    models keep working in chaiNNer/the reference ecosystem)."""
    exp = _EXPORTERS.get(arch_name.lower())
    if exp is None:
        raise NotImplementedError(f"No torch exporter for arch '{arch_name}'")
    return exp(params_flat)


_EXPORTERS: dict[str, Callable] = {}


def register_exporter(arch_name: str):
    def deco(fn):
        _EXPORTERS[arch_name.lower()] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# SRVGGNetCompact
# ---------------------------------------------------------------------------


@register_converter("SRVGGNetCompact")
def _convert_srvgg(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    num_conv = module.num_conv
    for k, v in sd.items():
        m = re.fullmatch(r"body\.(\d+)\.(weight|bias)", k)
        if not m:
            continue
        idx, kind = int(m.group(1)), m.group(2)
        if idx % 2 == 0:  # conv layers at even indices
            ci = idx // 2
            name = "body_last" if ci == num_conv + 1 else f"body_{ci}"
            if kind == "weight":
                out[f"{name}.conv.kernel"] = conv_w(v)
            else:
                out[f"{name}.conv.bias"] = v
        else:  # PReLU activations at odd indices
            ai = idx // 2
            out[f"act_{ai}.weight"] = v
    return out


@register_exporter("SRVGGNetCompact")
def _export_srvgg(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for k, v in flat.items():
        m = re.fullmatch(r"body_(\d+|last)\.conv\.(kernel|bias)", k)
        if m:
            tag, kind = m.group(1), m.group(2)
            if tag == "last":
                # index inferred by caller; resolved below via act count
                out[f"__last.{kind}"] = v
            else:
                idx = 2 * int(tag)
                out[f"body.{idx}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                    conv_w_inv(v) if kind == "kernel" else v
                )
            continue
        m = re.fullmatch(r"act_(\d+)\.weight", k)
        if m:
            out[f"body.{2 * int(m.group(1)) + 1}.weight"] = v
    n_act = sum(1 for k in flat if k.startswith("act_"))
    if "__last.kernel" in out:
        idx = 2 * n_act
        out[f"body.{idx}.weight"] = conv_w_inv(out.pop("__last.kernel"))
        out[f"body.{idx}.bias"] = out.pop("__last.bias")
    return out


def conv_w_inv(w: np.ndarray) -> np.ndarray:
    """Flax HWIO -> torch OIHW."""
    return np.ascontiguousarray(w.transpose(3, 2, 0, 1))


# ---------------------------------------------------------------------------
# SPAN
# ---------------------------------------------------------------------------


def _convert_conv3xc(sd, prefix_t: str, prefix_f: str, out: dict) -> None:
    table = {
        f"{prefix_t}.conv.0.weight": (f"{prefix_f}.conv0_kernel", conv_w),
        f"{prefix_t}.conv.0.bias": (f"{prefix_f}.conv0_bias", None),
        f"{prefix_t}.conv.1.weight": (f"{prefix_f}.conv1_kernel", conv_w),
        f"{prefix_t}.conv.1.bias": (f"{prefix_f}.conv1_bias", None),
        f"{prefix_t}.conv.2.weight": (f"{prefix_f}.conv2_kernel", conv_w),
        f"{prefix_t}.conv.2.bias": (f"{prefix_f}.conv2_bias", None),
        f"{prefix_t}.sk.weight": (f"{prefix_f}.sk_kernel", conv_w),
        f"{prefix_t}.sk.bias": (f"{prefix_f}.sk_bias", None),
    }
    for tk, (fk, tr) in table.items():
        if tk in sd:
            out[fk] = tr(sd[tk]) if tr else sd[tk]


@register_converter("SPAN")
def _convert_span(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _convert_conv3xc(sd, "conv_1", "conv_1", out)
    _convert_conv3xc(sd, "conv_2", "conv_2", out)
    for b in range(1, 7):
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_conv3xc(sd, f"block_{b}.{c}", f"block_{b}.{c}", out)
    if "conv_cat.weight" in sd:
        out["conv_cat.conv.kernel"] = conv_w(sd["conv_cat.weight"])
        out["conv_cat.conv.bias"] = sd["conv_cat.bias"]
    if "upsampler.0.weight" in sd:
        out["upsampler_conv.conv.kernel"] = conv_w(sd["upsampler.0.weight"])
        out["upsampler_conv.conv.bias"] = sd["upsampler.0.bias"]
    return out


# ---------------------------------------------------------------------------
# RRDBNet (new-style BasicSR naming)
# ---------------------------------------------------------------------------


@register_converter("RRDBNet")
def _convert_rrdbnet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        fk = k
        m = re.fullmatch(r"body\.(\d+)\.(rdb\d)\.(conv\d)\.(weight|bias)", k)
        if m:
            fk = f"body_{m.group(1)}.{m.group(2)}.{m.group(3)}.conv.{m.group(4)}"
        else:
            m2 = re.fullmatch(r"(conv_first|conv_body|conv_up1|conv_up2|conv_up3|conv_hr|conv_last)\.(weight|bias)", k)
            if m2:
                fk = f"{m2.group(1)}.conv.{m2.group(2)}"
            else:
                continue
        if fk.endswith("weight"):
            out[fk.replace(".weight", ".kernel")] = conv_w(v)
        else:
            out[fk] = v
    return out


# ---------------------------------------------------------------------------
# SwinIR (official key layout; block math already golden-tested bit-exact)
# ---------------------------------------------------------------------------


@register_converter("SwinIR")
def _convert_swinir(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """Map official SwinIR torch keys -> flax keys.

    Torch layout (reference loads these via spandrel; upstream SwinIR repo):
      layers.{i}.residual_group.blocks.{j}.{norm1,attn.qkv,attn.proj,norm2,
      mlp.fc1,mlp.fc2}, layers.{i}.conv[.{0,2,4}], patch_embed.norm, norm,
      conv_first, conv_after_body[.{0,2,4}], conv_before_upsample.0,
      upsample.{2k}, conv_last, conv_up1/2, conv_hr.
    Buffers (relative_position_index, attn_mask) are recomputed statically.
    """
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(("relative_position_index", "attn_mask")) or k.startswith(
            ("absolute_pos_embed", "mean")
        ):
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)\.(weight|bias)", k
        )
        if m:
            i, j, inner, kind = m.groups()
            prefix = f"layers_{i}.blocks_{j}"
            if inner in ("norm1", "norm2"):
                out[f"{prefix}.{inner}.{'scale' if kind == 'weight' else 'bias'}"] = v
            elif inner in ("attn.qkv", "attn.proj"):
                out[f"{prefix}.{inner}.{'kernel' if kind == 'weight' else 'bias'}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            elif inner in ("mlp.fc1", "mlp.fc2"):
                tgt = inner.replace("mlp.fc", "mlp_fc")
                out[f"{prefix}.{tgt}.{'kernel' if kind == 'weight' else 'bias'}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.attn"
            r"\.relative_position_bias_table",
            k,
        )
        if m:
            out[f"layers_{m.group(1)}.blocks_{m.group(2)}.attn.relative_position_bias_table"] = v
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            kind = m.group(2)
            fk = f"layers_{m.group(1)}.conv.conv.{'kernel' if kind == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if kind == "weight" else v
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(\d+)\.(weight|bias)", k)
        if m:  # 3conv residual connection: seq indices 0/2/4 -> conv_0/1/2
            i, si, kind = m.group(1), int(m.group(2)) // 2, m.group(3)
            fk = f"layers_{i}.conv_{si}.conv.{'kernel' if kind == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if kind == "weight" else v
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            out[f"patch_norm.{'scale' if m.group(1) == 'weight' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            out[f"norm.{'scale' if m.group(1) == 'weight' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"conv_after_body\.(\d+)\.(weight|bias)", k)
        if m:
            si, kind = int(m.group(1)) // 2, m.group(2)
            fk = f"conv_after_body_{si}.conv.{'kernel' if kind == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if kind == "weight" else v
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            fk = f"conv_before_upsample.conv.{'kernel' if m.group(1) == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if m.group(1) == "weight" else v
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            si, kind = int(m.group(1)) // 2, m.group(2)
            name = (
                "upsample_direct"
                if getattr(module, "upsampler", "") == "pixelshuffledirect"
                else f"upsample_{si}"
            )
            fk = f"{name}.conv.{'kernel' if kind == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if kind == "weight" else v
            continue
        m = re.fullmatch(
            r"(conv_first|conv_after_body|conv_last|conv_up1|conv_up2|conv_hr)"
            r"\.(weight|bias)",
            k,
        )
        if m:
            fk = f"{m.group(1)}.conv.{'kernel' if m.group(2) == 'weight' else 'bias'}"
            out[fk] = conv_w(v) if m.group(2) == "weight" else v
            continue
    return out


# ---------------------------------------------------------------------------
# HAT (official key layout: RHAG = residual_group(HAB*, OCAB) + conv)
# ---------------------------------------------------------------------------


def _norm_key(kind: str) -> str:
    return "scale" if kind == "weight" else "bias"


def _dense_key(kind: str) -> str:
    return "kernel" if kind == "weight" else "bias"


@register_converter("HAT")
def _convert_hat(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """Map official HAT torch keys -> flax keys (hat_arch.py).

    CAB sequential indices: cab.0/cab.2 convs, cab.3.attention.1/3 channel
    attention convs. Buffers (relative_position_index_SA/OCA, attn_mask)
    are recomputed statically.
    """
    cab_map = {
        "cab.0": "conv0", "cab.2": "conv1",
        "cab.3.attention.1": "att0", "cab.3.attention.3": "att1",
    }
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if "relative_position_index" in k or k.endswith("attn_mask") or k.startswith(
            ("mean", "absolute_pos_embed")
        ):
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+?)(?:\.(weight|bias))?$", k
        )
        if m:
            i, j, inner, kind = m.groups()
            prefix = f"layers_{i}.blocks_{j}"
            if inner == "attn.relative_position_bias_table":
                out[f"{prefix}.attn.relative_position_bias_table"] = v
            elif inner in ("norm1", "norm2"):
                out[f"{prefix}.{inner}.{_norm_key(kind)}"] = v
            elif inner in ("attn.qkv", "attn.proj"):
                out[f"{prefix}.{inner}.{_dense_key(kind)}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            elif inner in ("mlp.fc1", "mlp.fc2"):
                tgt = inner.replace("mlp.fc", "mlp_fc")
                out[f"{prefix}.{tgt}.{_dense_key(kind)}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            elif inner.startswith("conv_block."):
                tgt = cab_map[inner.removeprefix("conv_block.")]
                out[f"{prefix}.conv_block.{tgt}.conv.{_dense_key(kind)}"] = (
                    conv_w(v) if kind == "weight" else v
                )
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.residual_group\.overlap_attn\.(.+?)(?:\.(weight|bias))?$", k
        )
        if m:
            i, inner, kind = m.groups()
            prefix = f"layers_{i}.overlap_attn"
            if inner == "relative_position_bias_table":
                out[f"{prefix}.relative_position_bias_table"] = v
            elif inner in ("norm1", "norm2"):
                out[f"{prefix}.{inner}.{_norm_key(kind)}"] = v
            elif inner in ("qkv", "proj"):
                out[f"{prefix}.{inner}.{_dense_key(kind)}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            elif inner in ("mlp.fc1", "mlp.fc2"):
                tgt = inner.replace("mlp.fc", "mlp_fc")
                out[f"{prefix}.{tgt}.{_dense_key(kind)}"] = (
                    linear_w(v) if kind == "weight" else v
                )
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            kind = m.group(2)
            out[f"layers_{m.group(1)}.conv.conv.{_dense_key(kind)}"] = (
                conv_w(v) if kind == "weight" else v
            )
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            out[f"patch_norm.{'scale' if m.group(1) == 'weight' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            out[f"norm.{_norm_key(m.group(1))}"] = v
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            kind = m.group(1)
            out[f"conv_before_upsample.conv.{_dense_key(kind)}"] = (
                conv_w(v) if kind == "weight" else v
            )
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            si, kind = int(m.group(1)) // 2, m.group(2)
            out[f"upsample_{si}.conv.{_dense_key(kind)}"] = (
                conv_w(v) if kind == "weight" else v
            )
            continue
        m = re.fullmatch(r"(conv_first|conv_after_body|conv_last)\.(weight|bias)", k)
        if m:
            kind = m.group(2)
            out[f"{m.group(1)}.conv.{_dense_key(kind)}"] = (
                conv_w(v) if kind == "weight" else v
            )
            continue
    return out


@register_exporter("SwinIR")
def _export_swinir(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """flax -> official SwinIR torch layout (inverse of _convert_swinir)."""
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        m = re.fullmatch(r"layers_(\d+)\.blocks_(\d+)\.(.+)", k)
        if m:
            i, j, rest = m.groups()
            rest = (
                rest.replace("mlp_fc", "mlp.fc")
                .replace(".scale", ".weight")
            )
            if rest.endswith(".kernel"):
                rest = rest.replace(".kernel", ".weight")
                v = linear_w(v)
            out[f"layers.{i}.residual_group.blocks.{j}.{rest}"] = v
            continue
        m = re.fullmatch(r"layers_(\d+)\.conv\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(2)
            out[f"layers.{m.group(1)}.conv.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"patch_norm\.(scale|bias)", k)
        if m:
            out[f"patch_embed.norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"norm\.(scale|bias)", k)
        if m:
            out[f"norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"conv_before_upsample\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(1)
            out[f"conv_before_upsample.0.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k)
        if m:
            si, kind = 2 * int(m.group(1)), m.group(2)
            out[f"upsample.{si}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"upsample_direct\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(1)
            out[f"upsample.0.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"(\w+)\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(2)
            out[f"{m.group(1)}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
    return out


@register_exporter("HAT")
def _export_hat(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """flax -> official HAT torch layout (inverse of _convert_hat)."""
    cab_inv = {"conv0": "cab.0", "conv1": "cab.2",
               "att0": "cab.3.attention.1", "att1": "cab.3.attention.3"}
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        m = re.fullmatch(r"patch_norm\.(scale|bias)", k)
        if m:
            out[f"patch_embed.norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"layers_(\d+)\.blocks_(\d+)\.conv_block\.(\w+)\.conv\.(kernel|bias)", k)
        if m:
            i, j, part, kind = m.groups()
            tk = (f"layers.{i}.residual_group.blocks.{j}.conv_block."
                  f"{cab_inv[part]}.{'weight' if kind == 'kernel' else 'bias'}")
            out[tk] = conv_w_inv(v) if kind == "kernel" else v
            continue
        m = re.fullmatch(r"layers_(\d+)\.(blocks_\d+|overlap_attn)\.(.+)", k)
        if m:
            i, mid, rest = m.groups()
            rest = rest.replace("mlp_fc", "mlp.fc").replace(".scale", ".weight")
            if rest.endswith(".kernel"):
                rest = rest.replace(".kernel", ".weight")
                v = linear_w(v)
            if mid == "overlap_attn":
                out[f"layers.{i}.residual_group.overlap_attn.{rest}"] = v
            else:
                j = mid.removeprefix("blocks_")
                out[f"layers.{i}.residual_group.blocks.{j}.{rest}"] = v
            continue
        m = re.fullmatch(r"layers_(\d+)\.conv\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(2)
            out[f"layers.{m.group(1)}.conv.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"norm\.(scale|bias)", k)
        if m:
            out[f"norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
            continue
        m = re.fullmatch(r"conv_before_upsample\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(1)
            out[f"conv_before_upsample.0.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k)
        if m:
            si, kind = 2 * int(m.group(1)), m.group(2)
            out[f"upsample.{si}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
        m = re.fullmatch(r"(\w+)\.conv\.(kernel|bias)", k)
        if m:
            kind = m.group(2)
            out[f"{m.group(1)}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
            continue
    return out


# ---------------------------------------------------------------------------
# DAT (official key layout; reference dat_arch.py:903, validated against a
# reference-torch golden fixture in tests/test_utils/test_golden_parity.py)
# ---------------------------------------------------------------------------


def _bn_to_flax(out: dict, sd: dict, tpre: str, fpre: str) -> None:
    """torch BatchNorm2d state -> flax {scale,bias,mean,var} params."""
    out[f"{fpre}.scale"] = sd[f"{tpre}.weight"]
    out[f"{fpre}.bias"] = sd[f"{tpre}.bias"]
    out[f"{fpre}.mean"] = sd[f"{tpre}.running_mean"]
    out[f"{fpre}.var"] = sd[f"{tpre}.running_var"]


def _put_ln(out: dict, fpre: str, kind: str, v) -> None:
    out[f"{fpre}.{'scale' if kind == 'weight' else 'bias'}"] = v


def _put_linear(out: dict, fpre: str, kind: str, v) -> None:
    out[f"{fpre}.{'kernel' if kind == 'weight' else 'bias'}"] = (
        linear_w(v) if kind == "weight" else v
    )


def _put_conv(out: dict, fpre: str, kind: str, v) -> None:
    out[f"{fpre}.conv.{'kernel' if kind == 'weight' else 'bias'}"] = (
        conv_w(v) if kind == "weight" else v
    )


@register_converter("DAT")
def _convert_dat(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    handled: set[str] = set()

    for k in list(sd):
        if k.endswith((
            "relative_position_index", "rpe_biases", "num_batches_tracked",
        )) or re.fullmatch(r".*\.attn\.attn_mask_\d+", k):
            # attn_mask_* are registered shift-window buffers (reference
            # dat_arch.py Spatial_Attention); the flax side recomputes them
            # statically from the runtime spatial size (_rect_mask above)
            handled.add(k)
    # BNs inside the adaptive interaction module
    for k in list(sd):
        m = re.fullmatch(
            r"layers\.(\d+)\.blocks\.(\d+)\.attn\.(dwconv\.1|channel_interaction\.2"
            r"|spatial_interaction\.1)\.(weight|bias|running_mean|running_var)", k,
        )
        if m and k not in handled:
            i, j, which = m.group(1), m.group(2), m.group(3)
            fname = {"dwconv.1": "dw_bn", "channel_interaction.2": "ci_bn",
                     "spatial_interaction.1": "si_bn"}[which]
            _bn_to_flax(out, sd, f"layers.{i}.blocks.{j}.attn.{which}",
                        f"layers_{i}_blocks_{j}.attn.{fname}")
            for suf in ("weight", "bias", "running_mean", "running_var"):
                handled.add(f"layers.{i}.blocks.{j}.attn.{which}.{suf}")

    for k, v in sd.items():
        if k in handled:
            continue
        if v.size == 0 and not re.search(r"pos3\.2\.weight$", k):
            # degenerate 0-dim DynamicPosBias MLP layers (tiny dims): flax
            # creates only pos3 in bias-only mode, whose (0, heads) kernel
            # must still be present
            continue
        m = re.fullmatch(r"layers\.(\d+)\.blocks\.(\d+)\.(.+)\.(weight|bias)", k)
        if m:
            i, j, inner, kind = m.groups()
            fpre = f"layers_{i}_blocks_{j}"
            if inner in ("norm1", "norm2"):
                _put_ln(out, f"{fpre}.{inner}", kind, v)
            elif inner in ("attn.qkv", "attn.proj", "ffn.fc1", "ffn.fc2"):
                _put_linear(out, f"{fpre}.{inner}", kind, v)
            elif inner == "ffn.sg.norm":
                _put_ln(out, f"{fpre}.ffn.sg_norm", kind, v)
            elif inner == "ffn.sg.conv":
                _put_conv(out, f"{fpre}.ffn.sg_conv", kind, v)
            elif inner == "attn.dwconv.0":
                _put_conv(out, f"{fpre}.attn.dwconv", kind, v)
            elif inner == "attn.channel_interaction.1":
                _put_conv(out, f"{fpre}.attn.ci_0", kind, v)
            elif inner == "attn.channel_interaction.4":
                _put_conv(out, f"{fpre}.attn.ci_1", kind, v)
            elif inner == "attn.spatial_interaction.0":
                _put_conv(out, f"{fpre}.attn.si_0", kind, v)
            elif inner == "attn.spatial_interaction.3":
                _put_conv(out, f"{fpre}.attn.si_1", kind, v)
            else:
                pm = re.fullmatch(r"attn\.attns\.(\d+)\.pos\.(.+)", inner)
                if pm:
                    b, pin = pm.groups()
                    ppre = f"{fpre}.attn.attns_{b}.pos"
                    if pin == "pos_proj":
                        _put_linear(out, f"{ppre}.pos_proj", kind, v)
                    elif re.fullmatch(r"pos([123])\.0", pin):
                        _put_ln(out, f"{ppre}.norm{pin[3]}", kind, v)
                    elif re.fullmatch(r"pos([123])\.2", pin):
                        _put_linear(out, f"{ppre}.pos{pin[3]}", kind, v)
                    else:
                        raise KeyError(f"unmapped DAT pos key: {k}")
                else:
                    raise KeyError(f"unmapped DAT block key: {k}")
            continue
        m = re.fullmatch(r"layers\.(\d+)\.blocks\.(\d+)\.attn\.temperature", k)
        if m:
            out[f"layers_{m.group(1)}_blocks_{m.group(2)}.attn.temperature"] = v
            continue
        m = re.fullmatch(r"before_RG\.1\.(weight|bias)", k)
        if m:
            _put_ln(out, "before_RG", m.group(1), v)
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            _put_ln(out, "norm", m.group(1), v)
            continue
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, f"layers_{m.group(1)}_conv", m.group(2), v)
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_before_upsample", m.group(1), v)
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            si = int(m.group(1)) // 2
            name = (
                "upsample_direct"
                if getattr(module, "upsampler", "") == "pixelshuffledirect"
                else f"upsample_{si}"
            )
            _put_conv(out, name, m.group(2), v)
            continue
        m = re.fullmatch(
            r"(conv_first|conv_after_body|conv_last)\.(weight|bias)", k
        )
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        raise KeyError(f"unmapped DAT key: {k}")
    return out


# ---------------------------------------------------------------------------
# UniUpsampleV3 (shared upsampler; reference arch_util.py:584-732)
# ---------------------------------------------------------------------------


def convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I,O,kh,kw) -> flipped HWIO gradient view."""
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _convert_uni_upsample(
    sd: dict, tpre: str, fpre: str, mode: str, scale: int, out: dict
) -> None:
    """Map torch UniUpsampleV3 Sequential params -> flax c{j} units.

    Parameterized torch modules are taken in index order; in transpose+conv
    mode every unit except the trailing conv is a ConvTranspose2d.
    """
    if mode == "dysample":
        raise NotImplementedError(
            "dysample upsampler checkpoint conversion not supported yet"
        )
    entries: list[tuple[int, str]] = []  # (torch_index, key_prefix)
    seen = set()
    for k in sd:
        m = re.match(rf"{re.escape(tpre)}\.(\d+)(\.conv\.0)?\.(weight|bias)$", k)
        if m:
            idx = int(m.group(1))
            pre = f"{tpre}.{idx}" + (m.group(2) or "")
            if pre not in seen:
                seen.add(pre)
                entries.append((idx, pre))
    entries.sort()
    n_transpose = 0
    if mode == "transpose+conv":
        n_transpose = 2 if scale == 4 else 1
    for j, (_idx, pre) in enumerate(entries):
        w, b = sd[f"{pre}.weight"], sd.get(f"{pre}.bias")
        if j < n_transpose:
            out[f"{fpre}.c{j}.kernel"] = convT_w(w)
            if b is not None:
                out[f"{fpre}.c{j}.bias"] = b
        else:
            out[f"{fpre}.c{j}.conv.kernel"] = conv_w(w)
            if b is not None:
                out[f"{fpre}.c{j}.conv.bias"] = b


_UNI_MODES = (
    "conv", "pixelshuffledirect", "pixelshuffle", "nearest+conv", "dysample",
    "transpose+conv", "lda", "pa_up",
)


def uni_upsample_mode(sd: dict, tpre: str, default: str = "pixelshuffle") -> tuple[str, int]:
    """Read (mode, scale) from the MetaUpsample buffer when present."""
    meta = sd.get(f"{tpre}.MetaUpsample")
    if meta is not None and len(meta) >= 3:
        return _UNI_MODES[int(meta[1])], int(meta[2])
    return default, 0


# ---------------------------------------------------------------------------
# FDAT (reference fdat_arch.py:206-307; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("FDAT")
def _convert_fdat(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    pattern = tuple(module.group_block_pattern)
    mode, meta_scale = uni_upsample_mode(sd, "upsampler", module.upsampler_type)
    net_scale = meta_scale or (
        4 if (module.unshuffle_mod and module.scale <= 2) else module.scale
    )
    _convert_uni_upsample(sd, "upsampler", "upsampler", mode, net_scale, out)

    for k, v in sd.items():
        if k.startswith("upsampler."):
            continue
        m = re.fullmatch(r"conv_first(?:\.1)?\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_first", m.group(1), v)
            continue
        m = re.fullmatch(r"conv_after\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_after", m.group(1), v)
            continue
        m = re.fullmatch(r"groups\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, f"groups_{m.group(1)}_conv", m.group(2), v)
            continue
        m = re.fullmatch(r"groups\.(\d+)\.blocks\.(\d+)\.(.+)", k)
        if m:
            g, i, rest = m.groups()
            fpre = f"groups_{g}_blocks_{i}"
            btype = pattern[int(i) % len(pattern)]
            if rest in ("attn.temp", "attn.bias"):
                out[f"{fpre}.{rest}"] = v
                continue
            rm = re.fullmatch(r"(n1|n2)\.(weight|bias)", rest)
            if rm:
                _put_ln(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"(attn\.qkv|attn\.proj|ffn\.fc1|ffn\.fc2)\.(weight|bias)", rest)
            if rm:
                _put_linear(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"conv\.0\.(weight|bias)", rest)
            if rm:
                _put_conv(out, f"{fpre}.conv", rm.group(1), v)
                continue
            rm = re.fullmatch(r"ffn\.smix\.(weight|bias)", rest)
            if rm:
                _put_conv(out, f"{fpre}.ffn.smix", rm.group(1), v)
                continue
            rm = re.fullmatch(r"inter\.(sg\.0|cg\.1|cg\.3)\.(weight|bias)", rest)
            if rm:
                which, kind = rm.groups()
                # flax builds only the branch the block type uses
                # (spatial -> channel-gate, channel -> spatial-gate)
                if btype == "spatial" and which.startswith("cg"):
                    fname = "cg_0" if which == "cg.1" else "cg_1"
                    _put_conv(out, f"{fpre}.inter.{fname}", kind, v)
                elif btype != "spatial" and which == "sg.0":
                    _put_conv(out, f"{fpre}.inter.sg", kind, v)
                continue
            raise KeyError(f"unmapped FDAT block key: {k}")
        raise KeyError(f"unmapped FDAT key: {k}")
    return out


# ---------------------------------------------------------------------------
# DRCT (reference drct_arch.py; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("DRCT")
def _convert_drct(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(("relative_position_index", "attn_mask")) or k.startswith(
            ("absolute_pos_embed", "mean")
        ):
            continue
        m = re.fullmatch(r"layers\.(\d+)\.swin(\d)\.(.+)", k)
        if m:
            i, sw, rest = m.groups()
            fpre = f"layers_{i}.swin_{sw}"
            if rest == "attn.relative_position_bias_table":
                out[f"{fpre}.attn.relative_position_bias_table"] = v
                continue
            rm = re.fullmatch(r"(norm1|norm2)\.(weight|bias)", rest)
            if rm:
                _put_ln(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"(attn\.qkv|attn\.proj)\.(weight|bias)", rest)
            if rm:
                _put_linear(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest)
            if rm:
                _put_linear(out, f"{fpre}.mlp_fc{rm.group(1)}", rm.group(2), v)
                continue
            raise KeyError(f"unmapped DRCT swin key: {k}")
        m = re.fullmatch(r"layers\.(\d+)\.adjust(\d)\.(weight|bias)", k)
        if m:
            _put_conv(out, f"layers_{m.group(1)}.adjust_{m.group(2)}", m.group(3), v)
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            _put_ln(out, "patch_norm", m.group(1), v)
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            _put_ln(out, "norm", m.group(1), v)
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_before_upsample", m.group(1), v)
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            _put_conv(out, f"upsample_{int(m.group(1)) // 2}", m.group(2), v)
            continue
        m = re.fullmatch(
            r"(conv_first|conv_after_body|conv_last|conv_up1|conv_up2|conv_hr)"
            r"\.(weight|bias)", k,
        )
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        raise KeyError(f"unmapped DRCT key: {k}")
    return out


# ---------------------------------------------------------------------------
# TSCUNet (reference tscunet_arch.py + scunet_aaf6aa_arch.py blocks;
# golden-validated)
# ---------------------------------------------------------------------------


def _put_scunet_block(out: dict, sd: dict, tpre: str, fpre: str) -> None:
    """ConvTransBlock: conv1_1/conv1_2 1x1 convs, conv_block.{0,2} -> cb_{0,1},
    trans_block {ln->norm, mlp.{0,2}->mlp_fc{1,2}, msa -> attn}."""
    for c in ("conv1_1", "conv1_2"):
        _put_conv(out, f"{fpre}.{c}", "weight", sd[f"{tpre}.{c}.weight"])
        _put_conv(out, f"{fpre}.{c}", "bias", sd[f"{tpre}.{c}.bias"])
    _put_conv(out, f"{fpre}.cb_0", "weight", sd[f"{tpre}.conv_block.0.weight"])
    _put_conv(out, f"{fpre}.cb_1", "weight", sd[f"{tpre}.conv_block.2.weight"])
    tb, fb = f"{tpre}.trans_block", f"{fpre}.trans_block"
    _put_ln(out, f"{fb}.norm1", "weight", sd[f"{tb}.ln1.weight"])
    _put_ln(out, f"{fb}.norm1", "bias", sd[f"{tb}.ln1.bias"])
    _put_ln(out, f"{fb}.norm2", "weight", sd[f"{tb}.ln2.weight"])
    _put_ln(out, f"{fb}.norm2", "bias", sd[f"{tb}.ln2.bias"])
    _put_linear(out, f"{fb}.mlp_fc1", "weight", sd[f"{tb}.mlp.0.weight"])
    _put_linear(out, f"{fb}.mlp_fc1", "bias", sd[f"{tb}.mlp.0.bias"])
    _put_linear(out, f"{fb}.mlp_fc2", "weight", sd[f"{tb}.mlp.2.weight"])
    _put_linear(out, f"{fb}.mlp_fc2", "bias", sd[f"{tb}.mlp.2.bias"])
    _put_linear(out, f"{fb}.attn.qkv", "weight", sd[f"{tb}.msa.embedding_layer.weight"])
    _put_linear(out, f"{fb}.attn.qkv", "bias", sd[f"{tb}.msa.embedding_layer.bias"])
    _put_linear(out, f"{fb}.attn.proj", "weight", sd[f"{tb}.msa.linear.weight"])
    _put_linear(out, f"{fb}.attn.proj", "bias", sd[f"{tb}.msa.linear.bias"])
    # (heads, 2w-1, 2w-1) -> ((2w-1)^2, heads), swin row-major rel index
    rpp = sd[f"{tb}.msa.relative_position_params"]
    out[f"{fb}.attn.relative_position_bias_table"] = np.ascontiguousarray(
        rpp.transpose(1, 2, 0).reshape(-1, rpp.shape[0])
    )


@register_converter("TSCUNet")
def _convert_tscunet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    nb = max(
        (int(m.group(1)) for k in sd
         if (m := re.match(r"m_layers\.0\.m_body\.(\d+)\.", k))),
        default=0,
    ) + 1
    # stems/tails (1-module Sequentials, bias-free)
    for tname, fname in (("m_head.0", "m_head"), ("m_res.0", "m_res"),
                         ("m_tail.0", "m_tail")):
        if f"{tname}.weight" in sd:
            _put_conv(out, fname, "weight", sd[f"{tname}.weight"])
    layer_ids = sorted({int(k.split(".")[1]) for k in sd if k.startswith("m_layers.")})
    for li in layer_ids:
        tpre, fpre = f"m_layers.{li}", f"m_layers_{li}"
        for tname, fname in ((f"{tpre}.m_head.0", f"{fpre}.m_head"),
                             (f"{tpre}.m_res.0", f"{fpre}.m_res"),
                             (f"{tpre}.m_tail.0", f"{fpre}.m_tail")):
            if f"{tname}.weight" in sd:
                _put_conv(out, fname, "weight", sd[f"{tname}.weight"])
        for j in range(nb):
            _put_scunet_block(out, sd, f"{tpre}.m_body.{j}", f"{fpre}.body_{j}")
        for stage in ("down1", "down2", "down3"):
            for j in range(nb):
                _put_scunet_block(
                    out, sd, f"{tpre}.m_{stage}.{j}", f"{fpre}.{stage}_{j}"
                )
            # strided 2x2 downsample conv at Sequential index nb
            _put_conv(out, f"{fpre}.{stage}_conv", "weight",
                      sd[f"{tpre}.m_{stage}.{nb}.weight"])
        for stage in ("up1", "up2", "up3"):
            # Upconv at index 0 (up.1 and up.3 convs), blocks at 1..nb
            _put_conv(out, f"{fpre}.{stage}_conv_c0", "weight",
                      sd[f"{tpre}.m_{stage}.0.up.1.weight"])
            _put_conv(out, f"{fpre}.{stage}_conv_c0", "bias",
                      sd[f"{tpre}.m_{stage}.0.up.1.bias"])
            _put_conv(out, f"{fpre}.{stage}_conv_c1", "weight",
                      sd[f"{tpre}.m_{stage}.0.up.3.weight"])
            _put_conv(out, f"{fpre}.{stage}_conv_c1", "bias",
                      sd[f"{tpre}.m_{stage}.0.up.3.bias"])
            for j in range(nb):
                _put_scunet_block(
                    out, sd, f"{tpre}.m_{stage}.{j + 1}", f"{fpre}.{stage}_{j}"
                )
    # RRDB upsample tail: m_upsample.0.up = [rdb x n_rrdb, (Upsample, conv,
    # lrelu) x log2(scale), conv, lrelu]
    rrdb_ids = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.match(r"m_upsample\.0\.up\.(\d+)\.rdb1\.", k))
    })
    for fi, ti in enumerate(rrdb_ids):
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for conv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
                t = f"m_upsample.0.up.{ti}.{rdb}.{conv}"
                f = f"up_rrdb_{fi}.{rdb}.{conv}"
                _put_conv(out, f, "weight", sd[f"{t}.weight"])
                _put_conv(out, f, "bias", sd[f"{t}.bias"])
    plain_convs = sorted({
        int(m.group(1))
        for k in sd
        if (m := re.fullmatch(r"m_upsample\.0\.up\.(\d+)\.weight", k))
    })
    for fi, ti in enumerate(plain_convs):
        fname = "up_final" if fi == len(plain_convs) - 1 else f"up_conv_{fi}"
        _put_conv(out, fname, "weight", sd[f"m_upsample.0.up.{ti}.weight"])
        _put_conv(out, fname, "bias", sd[f"m_upsample.0.up.{ti}.bias"])
    return out


# ---------------------------------------------------------------------------
# Swin2SR (upstream mv-lab/swin2sr checkpoint layout; structural validation —
# the reference loads this family via the external spandrel package)
# ---------------------------------------------------------------------------


@register_converter("Swin2SR")
def _convert_swin2sr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    # swinv2 attention stores q_bias/v_bias separately (k bias fixed at 0);
    # our flax packs them into a single qkv bias
    qb = {k: v for k, v in sd.items() if k.endswith("attn.q_bias")}
    for k, v in qb.items():
        pre = k[: -len(".q_bias")]
        vb = sd[f"{pre}.v_bias"]
        m = re.fullmatch(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.attn", pre)
        if m:
            fpre = f"layers_{m.group(1)}_blocks_{m.group(2)}.attn"
            out[f"{fpre}.qkv.bias"] = np.concatenate([v, np.zeros_like(v), vb])
    for k, v in sd.items():
        if k.endswith((
            "relative_position_index", "attn_mask", "relative_coords_table",
            "q_bias", "v_bias",
        )) or k.startswith(("absolute_pos_embed", "mean")):
            continue
        m = re.fullmatch(r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)", k)
        if m:
            i, j, rest = m.groups()
            fpre = f"layers_{i}_blocks_{j}"
            if rest == "attn.logit_scale":
                out[f"{fpre}.attn.logit_scale"] = v
                continue
            rm = re.fullmatch(r"attn\.cpb_mlp\.([02])\.(weight|bias)", rest)
            if rm:
                idx = "cpb_fc1" if rm.group(1) == "0" else "cpb_fc2"
                _put_linear(out, f"{fpre}.attn.{idx}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"(norm1|norm2)\.(weight|bias)", rest)
            if rm:
                _put_ln(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"(attn\.qkv|attn\.proj)\.(weight|bias)", rest)
            if rm:
                _put_linear(out, f"{fpre}.{rm.group(1)}", rm.group(2), v)
                continue
            rm = re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest)
            if rm:
                _put_linear(out, f"{fpre}.fc{rm.group(1)}", rm.group(2), v)
                continue
            raise KeyError(f"unmapped Swin2SR block key: {k}")
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, f"layers_{m.group(1)}_conv", m.group(2), v)
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            _put_ln(out, "patch_norm", m.group(1), v)
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            _put_ln(out, "norm", m.group(1), v)
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_before_upsample", m.group(1), v)
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            _put_conv(out, f"upsample_{int(m.group(1)) // 2}", m.group(2), v)
            continue
        m = re.fullmatch(
            r"(conv_first|conv_after_body|conv_last|conv_up1|conv_up2|conv_hr"
            r"|conv_bicubic|conv_aux|conv_after_aux\.0)\.(weight|bias)", k,
        )
        if m:
            name = m.group(1).replace(".0", "")
            _put_conv(out, name, m.group(2), v)
            continue
        raise KeyError(f"unmapped Swin2SR key: {k}")
    return out


# ---------------------------------------------------------------------------
# SpanPlus (reference spanplus_arch.py; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("SpanPlus")
def _convert_spanplus(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _convert_conv3xc(sd, "feats.0", "feats_0", out)
    # stage indices >= 1 are SPAB groups
    stages = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r"feats\.(\d+)\.", k)) and int(m.group(1)) >= 1
    })
    for si in stages:
        tpre, fpre = f"feats.{si}", f"feats_{si}"
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_conv3xc(sd, f"{tpre}.block_1.{c}", f"{fpre}.block_1.{c}", out)
            _convert_conv3xc(sd, f"{tpre}.block_end.{c}", f"{fpre}.block_end.{c}", out)
        n_mid = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"{re.escape(tpre)}\.block_n\.(\d+)\.", k))
        })
        for j in n_mid:
            for c in ("c1_r", "c2_r", "c3_r"):
                _convert_conv3xc(
                    sd, f"{tpre}.block_n.{j}.{c}", f"{fpre}.block_n_{j}.{c}", out
                )
        _convert_conv3xc(sd, f"{tpre}.conv_2", f"{fpre}.conv_2", out)
        _put_conv(out, f"{fpre}.conv_cat", "weight", sd[f"{tpre}.conv_cat.weight"])
        _put_conv(out, f"{fpre}.conv_cat", "bias", sd[f"{tpre}.conv_cat.bias"])
    # upsampler: ps (Sequential conv+PixelShuffle) or dys (DySample)
    if "upsampler.0.weight" in sd:
        _put_conv(out, "up_conv", "weight", sd["upsampler.0.weight"])
        _put_conv(out, "up_conv", "bias", sd["upsampler.0.bias"])
    elif "upsampler.offset.weight" in sd:
        _put_conv(out, "dysample.offset", "weight", sd["upsampler.offset.weight"])
        _put_conv(out, "dysample.offset", "bias", sd["upsampler.offset.bias"])
        _put_conv(out, "dysample.scope", "weight", sd["upsampler.scope.weight"])
        _put_conv(out, "dysample.end_conv", "weight", sd["upsampler.end_conv.weight"])
        _put_conv(out, "dysample.end_conv", "bias", sd["upsampler.end_conv.bias"])
    elif "upsampler.weight" in sd:  # conv-only 1x variant
        _put_conv(out, "up_conv", "weight", sd["upsampler.weight"])
        _put_conv(out, "up_conv", "bias", sd["upsampler.bias"])
    return out


# ---------------------------------------------------------------------------
# RCAN (reference rcan_arch.py; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("RCAN")
def _convert_rcan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.fullmatch(
            r"body\.(\d+)\.body\.(\d+)\.body\.([02])\.(weight|bias)", k
        )
        if m:  # RCAB convs at Sequential indices 0, 2
            g, blk, idx, kind = m.groups()
            _put_conv(out, f"group_{g}.block_{blk}.conv{int(idx) // 2}", kind, v)
            continue
        m = re.fullmatch(
            r"body\.(\d+)\.body\.(\d+)\.body\.3\.conv_du\.([02])\.(weight|bias)", k
        )
        if m:  # channel attention convs
            g, blk, idx, kind = m.groups()
            _put_conv(out, f"group_{g}.block_{blk}.ca.conv_du_{int(idx) // 2}", kind, v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.body\.(\d+)\.(weight|bias)", k)
        if m:  # group tail conv (index n_resblocks)
            g, _idx, kind = m.groups()
            _put_conv(out, f"group_{g}.conv_tail", kind, v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.(weight|bias)", k)
        if m:  # trunk tail conv
            _put_conv(out, "body_tail", m.group(2), v)
            continue
        m = re.fullmatch(r"head\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(r"tail\.0\.(\d+)\.(weight|bias)", k)
        if m:
            _put_conv(out, f"up_{int(m.group(1)) // 2}", m.group(2), v)
            continue
        m = re.fullmatch(r"tail\.1\.(weight|bias)", k)
        if m:
            _put_conv(out, "tail_conv", m.group(1), v)
            continue
        if k.startswith(("sub_mean", "add_mean")):
            continue  # MeanShift: fixed constants, recomputed in flax
        raise KeyError(f"unmapped RCAN key: {k}")
    return out


# ---------------------------------------------------------------------------
# ArtCNN (reference artcnn_arch.py:47-70; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("ArtCNN")
def _convert_artcnn(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    n_block = module.n_block
    for k, v in sd.items():
        m = re.fullmatch(r"conv0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv0", m.group(1), v)
            continue
        m = re.fullmatch(r"res_block\.(\d+)\.conv\.([01])\.0\.(weight|bias)", k)
        if m:  # ActConv = Sequential(conv, act)
            i, idx, kind = m.groups()
            _put_conv(out, f"block_{i}.conv{idx}", kind, v)
            continue
        m = re.fullmatch(r"res_block\.(\d+)\.conv\.2\.(weight|bias)", k)
        if m:
            _put_conv(out, f"block_{m.group(1)}.conv2", m.group(2), v)
            continue
        m = re.fullmatch(rf"res_block\.{n_block}\.(weight|bias)", k)
        if m:  # trailing conv at Sequential index n_block
            _put_conv(out, "res_conv", m.group(1), v)
            continue
        m = re.fullmatch(r"depth_to_space\.upscale\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "up_conv", m.group(1), v)
            continue
        raise KeyError(f"unmapped ArtCNN key: {k}")
    return out


# ---------------------------------------------------------------------------
# MoESR2 / MoSRv2 (reference moesr_arch.py / mosrv2_arch.py; golden-validated)
# ---------------------------------------------------------------------------


def _convert_gated_block(sd: dict, tpre: str, fpre: str, out: dict) -> None:
    """MambaOut GatedCNNBlock: norm (channel LN or RMS), fc1/fc2 convs,
    Inception depthwise mixer, per-channel gamma."""
    if f"{tpre}.norm.scale" in sd:  # MoSRv2 RMSNorm: (dim,1,1) params
        out[f"{fpre}.norm.scale"] = sd[f"{tpre}.norm.scale"].reshape(-1)
        out[f"{fpre}.norm.offset"] = sd[f"{tpre}.norm.offset"].reshape(-1)
    else:
        out[f"{fpre}.norm.scale"] = sd[f"{tpre}.norm.weight"]
        out[f"{fpre}.norm.bias"] = sd[f"{tpre}.norm.bias"]
    for c in ("fc1", "fc2"):
        _put_conv(out, f"{fpre}.{c}", "weight", sd[f"{tpre}.{c}.weight"])
        _put_conv(out, f"{fpre}.{c}", "bias", sd[f"{tpre}.{c}.bias"])
    for c in ("dwconv_hw", "dwconv_w", "dwconv_h"):
        _put_conv(out, f"{fpre}.conv.{c}", "weight", sd[f"{tpre}.conv.{c}.weight"])
        _put_conv(out, f"{fpre}.conv.{c}", "bias", sd[f"{tpre}.conv.{c}.bias"])
    out[f"{fpre}.gamma"] = sd[f"{tpre}.gamma"].reshape(-1)


@register_converter("MoESR2")
def _convert_moesr2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.weight"])
    _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.bias"])
    for bi in range(module.n_blocks):
        for k in range(module.n_block):
            _convert_gated_block(
                sd, f"blocks.{bi}.blocks.{k}", f"blocks_{bi}_g{k}", out
            )
        mpre, fpre = f"blocks.{bi}.msg", f"blocks_{bi}_msg"
        _put_conv(out, f"{fpre}.down_conv", "weight", sd[f"{mpre}.down.0.weight"])
        _put_conv(out, f"{fpre}.down_conv", "bias", sd[f"{mpre}.down.0.bias"])
        for k in range(3):
            _convert_gated_block(sd, f"{mpre}.gated.{k}", f"{fpre}.gated_{k}", out)
        _put_conv(out, f"{fpre}.up_conv", "weight", sd[f"{mpre}.up.0.weight"])
        _put_conv(out, f"{fpre}.up_conv", "bias", sd[f"{mpre}.up.0.bias"])
    mode, meta_scale = uni_upsample_mode(sd, "upscale", module.upsampler)
    _convert_uni_upsample(
        sd, "upscale", "upscale", mode, meta_scale or module.scale, out
    )
    return out


@register_converter("MoSRv2")
def _convert_mosrv2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    # gblocks Sequential: plain convs (in_to_dim + 3 refine convs) carry
    # bare gblocks.{i}.weight keys; GatedCNNBlocks carry nested keys
    plain = sorted({
        int(m.group(1)) for k in sd
        if (m := re.fullmatch(r"gblocks\.(\d+)\.(weight|bias)", k))
    })
    blocks = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r"gblocks\.(\d+)\.norm\.", k))
    })
    names = ["in_to_dim", "refine_0", "refine_1", "refine_2"]
    assert len(plain) == 4, f"MoSRv2: expected 4 plain convs, got {plain}"
    for idx, name in zip(plain, names):
        _put_conv(out, name, "weight", sd[f"gblocks.{idx}.weight"])
        _put_conv(out, name, "bias", sd[f"gblocks.{idx}.bias"])
    for j, idx in enumerate(blocks):
        _convert_gated_block(sd, f"gblocks.{idx}", f"gblocks_{j}", out)
    inner_scale = module.scale
    if module.unshuffle_mod and module.scale < 3:
        inner_scale = 4
    mode, meta_scale = uni_upsample_mode(sd, "to_img", module.upsampler)
    _convert_uni_upsample(
        sd, "to_img", "to_img", mode, meta_scale or inner_scale, out
    )
    return out


# ---------------------------------------------------------------------------
# Sebica (reference sebica_arch.py:122-176; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("Sebica")
def _convert_sebica(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "head", "weight", sd["head.0.weight"])
    _put_conv(out, "head", "bias", sd["head.0.bias"])
    _bn_to_flax(out, sd, "head.1", "head_bn")
    n_body = len({
        m.group(1) for k in sd if (m := re.match(r"body\.(\d+)\.", k))
    })
    for i in range(n_body):
        t, f = f"body.{i}", f"body_{i}"
        _put_conv(out, f"{f}.pre_0", "weight", sd[f"{t}.pre_mixer.conv.0.weight"])
        _put_conv(out, f"{f}.pre_0", "bias", sd[f"{t}.pre_mixer.conv.0.bias"])
        _bn_to_flax(out, sd, f"{t}.pre_mixer.conv.1", f"{f}.pre_bn0")
        _put_conv(out, f"{f}.pre_1", "weight", sd[f"{t}.pre_mixer.conv.3.weight"])
        _put_conv(out, f"{f}.pre_1", "bias", sd[f"{t}.pre_mixer.conv.3.bias"])
        _bn_to_flax(out, sd, f"{t}.pre_mixer.conv.4", f"{f}.pre_bn1")
        _bn_to_flax(out, sd, f"{t}.norm1", f"{f}.norm1")
        _put_conv(
            out, f"{f}.attn.spatial", "weight",
            sd[f"{t}.attn.spatial_attention.0.weight"],
        )
        # ECA 1D convs: torch (1, 1, k) -> flax (k, 1)
        out[f"{f}.attn.ca_forward"] = (
            sd[f"{t}.attn.channel_attention_forward.1.weight"].reshape(-1, 1)
        )
        out[f"{f}.attn.ca_backward"] = (
            sd[f"{t}.attn.channel_attention_backward.1.weight"].reshape(-1, 1)
        )
        _put_conv(out, f"{f}.ffn_0", "weight", sd[f"{t}.post_mixer.ffn.0.weight"])
        _put_conv(out, f"{f}.ffn_0", "bias", sd[f"{t}.post_mixer.ffn.0.bias"])
        _bn_to_flax(out, sd, f"{t}.post_mixer.ffn.1", f"{f}.ffn_bn0")
        _put_conv(out, f"{f}.ffn_1", "weight", sd[f"{t}.post_mixer.ffn.3.weight"])
        _put_conv(out, f"{f}.ffn_1", "bias", sd[f"{t}.post_mixer.ffn.3.bias"])
        _bn_to_flax(out, sd, f"{t}.post_mixer.ffn.4", f"{f}.ffn_bn1")
        _bn_to_flax(out, sd, f"{t}.norm2", f"{f}.norm2")
    _put_conv(out, "tail", "weight", sd["tail.0.weight"])
    _put_conv(out, "tail", "bias", sd["tail.0.bias"])
    return out


# ---------------------------------------------------------------------------
# SPANF (reference spanf_arch.py:127-205; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("SPANF")
def _convert_spanf(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    out["conv_near_kernel"] = conv_w(sd["conv_near.weight"])
    for i in range(1, 6):
        for c in ("c1_r", "c2_r", "c3_r"):
            _put_conv(
                out, f"block_{i}.{c}", "weight", sd[f"block_{i}.{c}.eval_conv.weight"]
            )
            _put_conv(
                out, f"block_{i}.{c}", "bias", sd[f"block_{i}.{c}.eval_conv.bias"]
            )
    _put_conv(out, "conv_cat", "weight", sd["conv_cat.weight"])
    _put_conv(out, "conv_cat", "bias", sd["conv_cat.bias"])
    _put_conv(out, "conv_2", "weight", sd["conv_2.eval_conv.weight"])
    _put_conv(out, "conv_2", "bias", sd["conv_2.eval_conv.bias"])
    return out


# ---------------------------------------------------------------------------
# ELAN (reference elan_arch.py:310-424; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("ELAN")
def _convert_elan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked") or k.startswith(("sub_mean", "add_mean")):
            continue
        m = re.fullmatch(r"head\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(r"tail\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "tail", m.group(1), v)
            continue
        m = re.fullmatch(
            r"body\.(\d+)\.modules_lfe\.lfe_(\d+)\.conv([01])\.shift_conv"
            r"\.conv1x1\.(weight|bias)", k,
        )
        if m:
            i, j, c, kind = m.groups()
            _put_conv(out, f"body_{i}.lfe_{j}.conv{c}.conv1x1", kind, v)
            continue
        if re.fullmatch(r"body\.\d+\.modules_lfe\.lfe_\d+\.conv[01]\.shift_conv\.weight", k):
            continue  # fixed shift mask, synthesized in flax
        m = re.fullmatch(
            r"body\.(\d+)\.modules_gmsa\.gmsa_(\d+)\.project_inp\.0\.(weight|bias)", k
        )
        if m:
            _put_conv(out, f"body_{m.group(1)}.gmsa_{m.group(2)}.project_inp", m.group(3), v)
            continue
        m = re.fullmatch(
            r"body\.(\d+)\.modules_gmsa\.gmsa_(\d+)\.project_inp\.1\."
            r"(weight|bias|running_mean|running_var)", k,
        )
        if m:
            i, j, kind = m.groups()
            fp = f"body_{i}.gmsa_{j}.bn"
            tgt = {"weight": "scale", "bias": "bias", "running_mean": "mean",
                   "running_var": "var"}[kind]
            out[f"{fp}.{tgt}"] = v
            continue
        m = re.fullmatch(
            r"body\.(\d+)\.modules_gmsa\.gmsa_(\d+)\.project_out\.(weight|bias)", k
        )
        if m:
            _put_conv(out, f"body_{m.group(1)}.gmsa_{m.group(2)}.project_out", m.group(3), v)
            continue
        raise KeyError(f"unmapped ELAN key: {k}")
    return out


# ---------------------------------------------------------------------------
# EIMN (reference eimn_arch.py:199-300; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("EIMN")
def _convert_eimn(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    conv_map = {
        "attn.proj_value.0": "attn.proj_value", "attn.proj_query.0": "attn.proj_query",
        "attn.region": "attn.region", "attn.spatial_1": "attn.spatial_1",
        "attn.spatial_2": "attn.spatial_2", "attn.fusion": "attn.fusion",
        "attn.out": "attn.out", "mlp.linear_in": "mlp.linear_in",
        "mlp.SAL": "mlp.sal", "mlp.linear_out": "mlp.linear_out",
        "mlp.DFFM.global_reduce": "mlp.dffm.global_reduce",
        "mlp.DFFM.local_reduce": "mlp.dffm.local_reduce",
        "mlp.DFFM.channel_expand": "mlp.dffm.channel_expand",
        "mlp.DFFM.spatial_expand": "mlp.dffm.spatial_expand",
    }
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        m = re.fullmatch(r"head\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(r"tail\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "tail", m.group(1), v)
            continue
        m = re.fullmatch(r"norm(\d+)\.(weight|bias)", k)
        if m:  # per-stage nn.LayerNorm
            _put_ln(out, f"norm{m.group(1)}", m.group(2), v)
            continue
        m = re.fullmatch(r"block(\d+)\.(\d+)\.(.+)", k)
        if m:
            st, j, rest = m.groups()
            fp = f"block{st}_{j}"
            m2 = re.fullmatch(r"norm([12])\.(weight|bias|running_mean|running_var)", rest)
            if m2:
                tgt = {"weight": "scale", "bias": "bias", "running_mean": "mean",
                       "running_var": "var"}[m2.group(2)]
                out[f"{fp}.norm{m2.group(1)}.{tgt}"] = v
                continue
            if rest in ("layer_scale_1", "layer_scale_2"):
                out[f"{fp}.{rest}"] = v
                continue
            m2 = re.fullmatch(r"mlp\.DFFM\.norm\.(weight|bias)", rest)
            if m2:
                _put_ln(out, f"{fp}.mlp.dffm.norm", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"(.+)\.(weight|bias)", rest)
            if m2 and m2.group(1) in conv_map:
                _put_conv(out, f"{fp}.{conv_map[m2.group(1)]}", m2.group(2), v)
                continue
        raise KeyError(f"unmapped EIMN key: {k}")
    return out


# ---------------------------------------------------------------------------
# EMT (reference emt_arch.py:567-633; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("EMT")
def _convert_emt(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    bn_map = {"weight": "scale", "bias": "bias", "running_mean": "mean",
              "running_var": "var"}
    tail_idx: list[int] = sorted({
        int(m.group(1)) for k in sd
        if (m := re.fullmatch(r"tail\.(\d+)\.(weight|bias)", k))
    })
    for k, v in sd.items():
        if k.endswith(("num_batches_tracked", ".mask")) or k.startswith(
            ("sub_mean", "add_mean")
        ):
            continue
        m = re.fullmatch(r"head\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(r"tail\.(\d+)\.(weight|bias)", k)
        if m:
            idx, kind = int(m.group(1)), m.group(2)
            if module.upsampler == "pixelshuffledirect":
                _put_conv(out, "tail", kind, v)
            else:
                pos = tail_idx.index(idx)
                name = f"tail_{pos}" if pos < len(tail_idx) - 1 else "tail_last"
                _put_conv(out, name, kind, v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.sa_list\.(\d+)\.(.+)", k)
        if m:
            b, l, rest = m.groups()
            fp = f"body_{b}_sa{l}"
            m2 = re.fullmatch(r"attn\.0\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.attn_conv", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"attn\.1\.(weight|bias|running_mean|running_var)", rest)
            if m2:
                out[f"{fp}.attn_bn.{bn_map[m2.group(1)]}"] = v
                continue
            m2 = re.fullmatch(r"proj\.0\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.proj", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"norm\.(weight|bias|running_mean|running_var)", rest)
            if m2:  # TokenMixer BatchNorm
                out[f"{fp}.norm.{bn_map[m2.group(1)]}"] = v
                continue
        m = re.fullmatch(r"body\.(\d+)\.mlp_list\.(\d+)\.(fc[12])\.(weight|bias)", k)
        if m:
            b, l, fc, kind = m.groups()
            _put_conv(out, f"body_{b}_mlp{l}.{fc}", kind, v)
            continue
        raise KeyError(f"unmapped EMT key: {k}")
    return out


# ---------------------------------------------------------------------------
# LMLT (reference lmlt_arch.py:362-489; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("LMLT")
def _convert_lmlt(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.fullmatch(r"to_feat\.(weight|bias)", k)
        if m:
            _put_conv(out, "to_feat", m.group(1), v)
            continue
        m = re.fullmatch(r"to_img\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "to_img", m.group(1), v)
            continue
        m = re.fullmatch(r"feats\.(\d+)\.(.+)", k)
        if m:
            i, rest = m.groups()
            fp = f"feats_{i}"
            m2 = re.fullmatch(r"norm([12])\.(weight|bias)", rest)
            if m2:
                _put_ln(out, f"{fp}.norm{m2.group(1)}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"lhsb\.aggr\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.lhsb.aggr", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"lhsb\.mfr\.(\d+)\.(qkv|proj)\.(weight|bias)", rest)
            if m2:
                j, lin, kind = m2.groups()
                _put_linear(out, f"{fp}.lhsb.mfr_{j}.{lin}", kind, v)
                continue
            m2 = re.fullmatch(r"lhsb\.mfr\.(\d+)\.get_v\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.lhsb.mfr_{m2.group(1)}.get_v", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"ccm\.ccm\.([02])\.(weight|bias)", rest)
            if m2:
                idx = "ccm_0" if m2.group(1) == "0" else "ccm_1"
                _put_conv(out, f"{fp}.{idx}", m2.group(2), v)
                continue
        raise KeyError(f"unmapped LMLT key: {k}")
    return out


# ---------------------------------------------------------------------------
# MAN (reference man_arch.py:398-489; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("MAN")
def _convert_man(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}

    def put_cln(fpre: str, kind: str, v) -> None:
        # ChannelLayerNorm wraps an auto-named inner nn.LayerNorm
        _put_ln(out, f"{fpre}.LayerNorm_0", kind, v)

    lka_seq = {"LKA3": "lka3", "LKA5": "lka5", "LKA7": "lka7"}
    for k, v in sd.items():
        if k.startswith(("sub_mean", "add_mean")):
            continue
        m = re.fullmatch(r"head\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(r"tail\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "tail", m.group(1), v)
            continue
        m = re.fullmatch(r"body_t\.(weight|bias)", k)
        if m:  # trunk conv when n_resgroups > 1
            _put_conv(out, "body_t", m.group(1), v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.body\.(\d+)\.(LKA|LFE)\.(.+)", k)
        if m:
            g, b, part, rest = m.groups()
            fp = f"g{g}_lka_{b}" if part == "LKA" else f"g{g}_sgab_{b}"
            if part == "LKA":
                m2 = re.fullmatch(r"norm\.(weight|bias)", rest)
                if m2:
                    put_cln(f"{fp}.norm", m2.group(1), v)
                    continue
                if rest == "scale":
                    out[f"{fp}.scale"] = v.reshape(-1)
                    continue
                m2 = re.fullmatch(r"proj_(first|last)\.0\.(weight|bias)", rest)
                if m2:
                    _put_conv(out, f"{fp}.proj_{m2.group(1)}", m2.group(2), v)
                    continue
                m2 = re.fullmatch(r"(LKA[357])\.([012])\.(weight|bias)", rest)
                if m2:
                    _put_conv(out, f"{fp}.{lka_seq[m2.group(1)]}_{m2.group(2)}", m2.group(3), v)
                    continue
                m2 = re.fullmatch(r"(X[357])\.(weight|bias)", rest)
                if m2:
                    _put_conv(out, f"{fp}.{m2.group(1).lower()}", m2.group(2), v)
                    continue
            else:  # LFE == SGAB
                m2 = re.fullmatch(r"norm\.(weight|bias)", rest)
                if m2:
                    put_cln(f"{fp}.norm", m2.group(1), v)
                    continue
                if rest == "scale":
                    out[f"{fp}.scale"] = v.reshape(-1)
                    continue
                m2 = re.fullmatch(r"(Conv1|Conv2|DWConv1)\.(weight|bias)", rest)
                if m2:
                    name = {"Conv1": "conv1", "Conv2": "conv2", "DWConv1": "dwconv"}[m2.group(1)]
                    _put_conv(out, f"{fp}.{name}", m2.group(2), v)
                    continue
        m = re.fullmatch(r"body\.(\d+)\.body_t\.(.+)", k)
        if m:  # LKAT group tail
            g, rest = m.groups()
            fp = f"g{g}_tail"
            m2 = re.fullmatch(r"conv0\.0\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.conv0", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"att\.([012])\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.att_{m2.group(1)}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"conv1\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.conv1", m2.group(1), v)
                continue
        raise KeyError(f"unmapped MAN key: {k}")
    return out


# ---------------------------------------------------------------------------
# RealPLKSR (reference realplksr_arch.py:125-186; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("RealPLKSR")
def _convert_realplksr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    plain = sorted({
        int(m.group(1)) for k in sd
        if (m := re.fullmatch(r"feats\.(\d+)\.(weight|bias)", k))
    })
    assert len(plain) == 2, f"RealPLKSR: expected head+tail convs, got {plain}"
    for k, v in sd.items():
        if k == "to_img.init_pos":
            continue  # fixed subpixel anchors, synthesized in flax
        m = re.fullmatch(rf"feats\.{plain[0]}\.(weight|bias)", k)
        if m:
            _put_conv(out, "head", m.group(1), v)
            continue
        m = re.fullmatch(rf"feats\.{plain[1]}\.(weight|bias)", k)
        if m:
            _put_conv(out, "tail", m.group(1), v)
            continue
        m = re.fullmatch(r"feats\.(\d+)\.(.+)", k)
        if m:
            fp = f"blocks_{int(m.group(1)) - 1}"
            rest = m.group(2)
            m2 = re.fullmatch(r"layer_norm\.(weight|bias)", rest)
            if m2:
                _put_ln(out, f"{fp}.norm", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"norm\.(weight|bias)", rest)
            if m2:  # GroupNorm path (layer_norm=False)
                _put_ln(out, f"{fp}.gnorm", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"channel_mixer\.([02])\.(weight|bias)", rest)
            if m2:
                name = "mixer_0" if m2.group(1) == "0" else "mixer_1"
                _put_conv(out, f"{fp}.{name}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"lk\.conv\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.lk_conv", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"attn\.f\.0\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.ea_conv", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"refine\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.refine", m2.group(1), v)
                continue
        m = re.fullmatch(r"to_img\.(offset|scope|end_conv)\.(weight|bias)", k)
        if m:
            _put_conv(out, f"to_img.{m.group(1)}", m.group(2), v)
            continue
        raise KeyError(f"unmapped RealPLKSR key: {k}")
    return out


# ---------------------------------------------------------------------------
# RTMoSR (reference rtmosr_arch.py:389-492; golden-validated)
# ---------------------------------------------------------------------------


def _convert_repconv(sd: dict, tpre: str, fpre: str, out: dict) -> None:
    """RepConv: SeqConv3x3 raw params + plain 3x3 + Conv3XC + alpha blend.
    The fused conv_3x3_rep / eval_conv copies are derivable and skipped."""
    out[f"{fpre}.alpha"] = sd[f"{tpre}.alpha"]
    out[f"{fpre}.conv1.k0"] = conv_w(sd[f"{tpre}.conv1.k0"])
    out[f"{fpre}.conv1.b0"] = sd[f"{tpre}.conv1.b0"]
    out[f"{fpre}.conv1.k1"] = conv_w(sd[f"{tpre}.conv1.k1"])
    out[f"{fpre}.conv1.b1"] = sd[f"{tpre}.conv1.b1"]
    _put_conv(out, f"{fpre}.conv2", "weight", sd[f"{tpre}.conv2.weight"])
    _put_conv(out, f"{fpre}.conv2", "bias", sd[f"{tpre}.conv2.bias"])
    _convert_conv3xc(sd, f"{tpre}.conv3", f"{fpre}.conv3", out)


@register_converter("RTMoSR")
def _convert_rtmosr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    tf = "to_feat.1" if "to_feat.1.alpha" in sd else "to_feat"
    _convert_repconv(sd, tf, "to_feat", out)
    _convert_repconv(sd, "to_img.0", "to_img", out)
    n_blocks = len({
        m.group(1) for k in sd if (m := re.match(r"body\.(\d+)\.", k))
    })
    for i in range(n_blocks):
        t, f = f"body.{i}", f"body_{i}"
        out[f"{f}.norm.scale"] = sd[f"{t}.norm.scale"].reshape(-1)
        out[f"{f}.norm.offset"] = sd[f"{t}.norm.offset"].reshape(-1)
        _convert_repconv(sd, f"{t}.fc1", f"{f}.fc1", out)
        if f"{t}.fc2.alpha" in sd:  # dccm=True -> RepConv
            _convert_repconv(sd, f"{t}.fc2", f"{f}.fc2", out)
        else:  # plain 1x1 conv
            _put_conv(out, f"{f}.fc2", "weight", sd[f"{t}.fc2.weight"])
            _put_conv(out, f"{f}.fc2", "bias", sd[f"{t}.fc2.bias"])
        _convert_repconv(sd, f"{t}.conv.0.poll.1", f"{f}.conv_pu.poll", out)
        # OmniShift
        o = f"{t}.conv.1"
        fo = f"{f}.conv_shift"
        out[f"{fo}.k1"] = conv_w(sd[f"{o}.conv1x1.weight"])
        out[f"{fo}.b1"] = sd[f"{o}.conv1x1.bias"]
        out[f"{fo}.k3"] = conv_w(sd[f"{o}.conv3x3.weight"])
        out[f"{fo}.b3"] = sd[f"{o}.conv3x3.bias"]
        out[f"{fo}.k5"] = conv_w(sd[f"{o}.conv5x5.weight"])
        out[f"{fo}.b5"] = sd[f"{o}.conv5x5.bias"]
        for a in ("alpha1", "alpha2", "alpha3", "alpha4"):
            out[f"{fo}.{a}"] = sd[f"{o}.{a}"].reshape(-1)
        # CSE (se=True)
        if f"{t}.conv.2.squeezing.0.weight" in sd:
            _put_conv(out, f"{f}.conv_se.fc1", "weight", sd[f"{t}.conv.2.squeezing.0.weight"])
            _put_conv(out, f"{f}.conv_se.fc1", "bias", sd[f"{t}.conv.2.squeezing.0.bias"])
            _put_conv(out, f"{f}.conv_se.fc2", "weight", sd[f"{t}.conv.2.squeezing.2.weight"])
            _put_conv(out, f"{f}.conv_se.fc2", "bias", sd[f"{t}.conv.2.squeezing.2.bias"])
    return out


# ---------------------------------------------------------------------------
# LKFMixer (reference lkfmixer_arch.py:249-352; golden-validated)
# ---------------------------------------------------------------------------


def _convert_plkb(sd: dict, t: str, f: str, out: dict) -> None:
    _put_conv(out, f"{f}.dw_1xk", "weight", sd[f"{t}.DWConv_1xK.weight"])
    _put_conv(out, f"{f}.dw_1xk", "bias", sd[f"{t}.DWConv_1xK.bias"])
    _put_conv(out, f"{f}.dw_kx1", "weight", sd[f"{t}.DWConv_Kx1.weight"])
    _put_conv(out, f"{f}.dw_kx1", "bias", sd[f"{t}.DWConv_Kx1.bias"])
    _put_conv(out, f"{f}.conv1", "weight", sd[f"{t}.conv1.weight"])
    _put_conv(out, f"{f}.conv1", "bias", sd[f"{t}.conv1.bias"])


def _convert_ffb(sd: dict, t: str, f: str, out: dict) -> None:
    _convert_plkb(sd, f"{t}.PLKB", f"{f}.plkb", out)
    _put_conv(out, f"{f}.dw3", "weight", sd[f"{t}.DWConv3.weight"])
    _put_conv(out, f"{f}.dw3", "bias", sd[f"{t}.DWConv3.bias"])
    _put_conv(out, f"{f}.conv1", "weight", sd[f"{t}.conv1.weight"])
    _put_conv(out, f"{f}.conv1", "bias", sd[f"{t}.conv1.bias"])


@register_converter("LKFMixer")
def _convert_lkfmixer(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for name in ("conv_first", "conv"):
        _put_conv(out, name, "weight", sd[f"{name}.weight"])
        _put_conv(out, name, "bias", sd[f"{name}.bias"])
    _put_conv(out, "upsampler", "weight", sd["upsampler.upsampleOneStep.0.weight"])
    _put_conv(out, "upsampler", "bias", sd["upsampler.upsampleOneStep.0.bias"])
    n_blocks = len({
        m.group(1) for k in sd if (m := re.match(r"layers\.layers\.(\d+)\.", k))
    })
    for i in range(n_blocks):
        t, f = f"layers.layers.{i}", f"layers_{i}"
        # FDB
        for c in ("c1_d", "c2_d", "c3_d", "c4", "c5"):
            _put_conv(out, f"{f}.fdb.{c}", "weight", sd[f"{t}.FDB.{c}.weight"])
            _put_conv(out, f"{f}.fdb.{c}", "bias", sd[f"{t}.FDB.{c}.bias"])
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_ffb(sd, f"{t}.FDB.{c}", f"{f}.fdb.{c}", out)
        # SFMB
        _convert_plkb(sd, f"{t}.SFMB.PLKB", f"{f}.sfmb.plkb", out)
        _put_conv(out, f"{f}.sfmb.dw3", "weight", sd[f"{t}.SFMB.DWConv_3.weight"])
        _put_conv(out, f"{f}.sfmb.dw3", "bias", sd[f"{t}.SFMB.DWConv_3.bias"])
        _put_conv(out, f"{f}.sfmb.conv1_1", "weight", sd[f"{t}.SFMB.conv1_1.weight"])
        _put_conv(out, f"{f}.sfmb.conv1_1", "bias", sd[f"{t}.SFMB.conv1_1.bias"])
        _put_conv(out, f"{f}.sfmb.conv1_2", "weight", sd[f"{t}.SFMB.conv1_2.weight"])
        _put_conv(out, f"{f}.sfmb.conv1_2", "bias", sd[f"{t}.SFMB.conv1_2.bias"])
        # FSB
        _convert_plkb(sd, f"{t}.FSB.PLKB", f"{f}.fsb.plkb", out)
        _put_conv(out, f"{f}.fsb.dw3", "weight", sd[f"{t}.FSB.DWConv_3.weight"])
        _put_conv(out, f"{f}.fsb.dw3", "bias", sd[f"{t}.FSB.DWConv_3.bias"])
        _put_conv(out, f"{f}.fsb.conv1_1", "weight", sd[f"{t}.FSB.conv1_1.weight"])
        _put_conv(out, f"{f}.fsb.conv1_1", "bias", sd[f"{t}.FSB.conv1_1.bias"])
    return out


# ---------------------------------------------------------------------------
# CascadedGaze / CGNet (reference cgnet_arch.py:361-469; golden-validated)
# ---------------------------------------------------------------------------


def _convert_cg_block(sd: dict, t: str, f: str, out: dict, gce: bool) -> None:
    for n in ("norm1", "norm2"):
        out[f"{f}.{n}.scale"] = sd[f"{t}.{n}.weight"]
        out[f"{f}.{n}.bias"] = sd[f"{t}.{n}.bias"]
    convs = ["conv1", "conv2", "conv4", "conv5"] + (
        ["project_out"] if gce else ["conv3"]
    )
    for c in convs:
        _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
        _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
    _put_conv(out, f"{f}.sca", "weight", sd[f"{t}.sca.1.weight"])
    _put_conv(out, f"{f}.sca", "bias", sd[f"{t}.sca.1.bias"])
    out[f"{f}.beta"] = sd[f"{t}.beta"].reshape(-1)
    out[f"{f}.gamma"] = sd[f"{t}.gamma"].reshape(-1)
    if gce:
        k = 0
        while f"{t}.GCE.depthwise_separable_convs.{k}.depthwise.weight" in sd:
            gt = f"{t}.GCE.depthwise_separable_convs.{k}"
            _put_conv(out, f"{f}.gce_{k}.depthwise", "weight", sd[f"{gt}.depthwise.weight"])
            _put_conv(out, f"{f}.gce_{k}.pointwise", "weight", sd[f"{gt}.pointwise.weight"])
            k += 1


@register_converter("CascadedGaze")
def _convert_cgnet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for n in ("intro", "ending"):
        _put_conv(out, n, "weight", sd[f"{n}.weight"])
        _put_conv(out, n, "bias", sd[f"{n}.bias"])
    for li in range(len(module.enc_blk_nums)):
        nb = module.enc_blk_nums[li]
        for bi in range(nb):
            _convert_cg_block(
                sd, f"encoders.{li}.{bi}", f"enc_{li}_b{bi}", out, gce=True
            )
        _put_conv(out, f"down_{li}", "weight", sd[f"downs.{li}.weight"])
        _put_conv(out, f"down_{li}", "bias", sd[f"downs.{li}.bias"])
    mi = 0
    while f"middle_blks.{mi}.conv1.weight" in sd:
        _convert_cg_block(sd, f"middle_blks.{mi}", f"middle_{mi}", out, gce=False)
        mi += 1
    for li in range(len(module.dec_blk_nums)):
        _put_conv(out, f"up_{li}", "weight", sd[f"ups.{li}.0.weight"])
        for bi in range(module.dec_blk_nums[li]):
            _convert_cg_block(
                sd, f"decoders.{li}.{bi}", f"dec_{li}_b{bi}", out, gce=False
            )
    return out


# ---------------------------------------------------------------------------
# DetailRefinerNet (reference detailrefinernet_arch.py:45-105; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("DetailRefinerNet")
def _convert_detailrefiner(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.fullmatch(r"(initial_conv|fusion_conv|final_conv)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        m = re.fullmatch(r"groups\.(\d+)\.(\d+)\.(conv[12])\.(weight|bias)", k)
        if m:
            g, b, c, kind = m.groups()
            _put_conv(out, f"groups_{g}_b{b}.{c}", kind, v)
            continue
        m = re.fullmatch(r"groups\.(\d+)\.(\d+)\.se\.fc\.([02])\.weight", k)
        if m:
            g, b, idx = m.groups()
            name = "fc1" if idx == "0" else "fc2"
            _put_linear(out, f"groups_{g}_b{b}.se.{name}", "weight", v)
            continue
        raise KeyError(f"unmapped DetailRefinerNet key: {k}")
    return out


# ---------------------------------------------------------------------------
# SpanC / SPAN++ (reference spanpp_arch.py:367-433; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("SpanC")
def _convert_spanc(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _convert_repconv(sd, "conv0", "conv0", out)
    _convert_repconv(sd, "conv_2", "conv_2", out)
    for i in range(1, 7):
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_repconv(sd, f"block_{i}.{c}", f"block_{i}.{c}", out)
    _put_conv(out, "conv_cat", "weight", sd["conv_cat.weight"])
    _put_conv(out, "conv_cat", "bias", sd["conv_cat.bias"])
    # IGConv implicit upsampler
    out["upsampler.freq"] = sd["upsampler.freq"].reshape(sd["upsampler.freq"].shape[:2])
    out["upsampler.amplitude"] = sd["upsampler.amplitude"].reshape(
        sd["upsampler.amplitude"].shape[:2]
    )
    out["upsampler.phase_w"] = sd["upsampler.phase.weight"].reshape(-1, 1).T
    out["upsampler.phase_b"] = sd["upsampler.phase.bias"]
    qk = sorted({
        int(m.group(1)) for k in sd
        if (m := re.fullmatch(r"upsampler\.query_kernel\.(\d+)\.weight", k))
    })
    for pos, idx in enumerate(qk):
        name = f"qk_{pos}" if pos < len(qk) - 1 else "qk_out"
        w = sd[f"upsampler.query_kernel.{idx}.weight"]
        out[f"upsampler.{name}.kernel"] = linear_w(w.reshape(w.shape[:2]))
        out[f"upsampler.{name}.bias"] = sd[f"upsampler.query_kernel.{idx}.bias"]
    return out


# ---------------------------------------------------------------------------
# TemporalSPAN / TSPANv2 (reference temporal_span_arch.py:269-412,
# temporal_span_v2_arch.py:333-518; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("TemporalSPAN")
def _convert_temporalspan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _convert_conv3xc(sd, "center_conv", "center_conv", out)
    hi = 0
    while f"history_convs.{hi}.sk.weight" in sd:
        _convert_conv3xc(sd, f"history_convs.{hi}", f"history_convs_{hi}", out)
        hi += 1
    _convert_conv3xc(sd, "fusion_conv.0", "fusion_conv_0", out)
    _convert_conv3xc(sd, "fusion_conv.1", "fusion_conv_1", out)
    _convert_conv3xc(sd, "conv_2", "conv_2", out)
    for i in range(1, 7):
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_conv3xc(sd, f"block_{i}.{c}", f"block_{i}.{c}", out)
        for n in ("norm1", "norm2", "norm3"):
            out[f"block_{i}.{n}.scale"] = sd[f"block_{i}.{n}.weight"]
            out[f"block_{i}.{n}.bias"] = sd[f"block_{i}.{n}.bias"]
    _put_conv(out, "conv_cat", "weight", sd["conv_cat.weight"])
    _put_conv(out, "conv_cat", "bias", sd["conv_cat.bias"])
    _put_conv(out, "upsampler_conv", "weight", sd["upsampler.0.weight"])
    _put_conv(out, "upsampler_conv", "bias", sd["upsampler.0.bias"])
    return out


@register_converter("TSPANv2")
def _convert_tspanv2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "m_head", "weight", sd["m_head.weight"])
    if "m_res.weight" in sd:
        _put_conv(out, "m_res", "weight", sd["m_res.weight"])
    _put_conv(out, "m_upsample", "weight", sd["m_upsample.0.weight"])
    _put_conv(out, "m_upsample", "bias", sd["m_upsample.0.bias"])
    _put_conv(out, "m_tail", "weight", sd["m_tail.weight"])
    li = 0
    while f"m_layers.{li}.conv_cat.weight" in sd:
        t, f = f"m_layers.{li}", f"m_layers_{li}"
        _convert_conv3xc(sd, f"{t}.m_head", f"{f}.m_head", out)
        _convert_conv3xc(sd, f"{t}.conv_post", f"{f}.conv_post", out)
        bi = 0
        while f"{t}.blocks.{bi}.c1_r.sk.weight" in sd:
            for c in ("c1_r", "c2_r", "c3_r"):
                _convert_conv3xc(sd, f"{t}.blocks.{bi}.{c}", f"{f}.blocks_{bi}.{c}", out)
            bi += 1
        _put_conv(out, f"{f}.conv_cat", "weight", sd[f"{t}.conv_cat.weight"])
        _put_conv(out, f"{f}.conv_cat", "bias", sd[f"{t}.conv_cat.bias"])
        _put_conv(out, f"{f}.m_tail", "weight", sd[f"{t}.m_tail.0.weight"])
        li += 1
    return out


# ---------------------------------------------------------------------------
# DIS (reference dis_arch.py:74-214; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("DIS")
def _convert_dis(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        m = re.fullmatch(r"(head|fusion|tail)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        if k == "head_act.weight":
            out["head_act.weight"] = v
            continue
        m = re.fullmatch(r"body\.(\d+)\.(conv1|conv2)\.weight", k)
        if m:
            _put_conv(out, f"body_{m.group(1)}.{m.group(2)}", "weight", v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.dw_conv\.(depthwise|pointwise)\.weight", k)
        if m:
            _put_conv(out, f"body_{m.group(1)}.{m.group(2)}", "weight", v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.act\.weight", k)
        if m:
            out[f"body_{m.group(1)}.act.weight"] = v
            continue
        # upsampler: single stage (conv/act) or Sequential of two stages
        m = re.fullmatch(r"upsampler\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, "up_0", m.group(1), v)
            continue
        if k == "upsampler.act.weight":
            out["up_act_0.weight"] = v
            continue
        m = re.fullmatch(r"upsampler\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, f"up_{m.group(1)}", m.group(2), v)
            continue
        m = re.fullmatch(r"upsampler\.(\d+)\.act\.weight", k)
        if m:
            out[f"up_act_{m.group(1)}.weight"] = v
            continue
        raise KeyError(f"unmapped DIS key: {k}")
    return out


# ---------------------------------------------------------------------------
# SCUNet_aaf6aa (reference scunet_aaf6aa_arch.py:388-666; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("SCUNetAAF")
def _convert_scunet_aaf(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "m_head", "weight", sd["m_head.0.weight"])
    _put_conv(out, "m_tail", "weight", sd["m_tail.0.weight"])
    if "m_res.0.weight" in sd:
        _put_conv(out, "m_res", "weight", sd["m_res.0.weight"])

    def stage_blocks(tpre: str) -> list[int]:
        return sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"{re.escape(tpre)}\.(\d+)\.conv1_1\.", k))
        })

    for si, stage in enumerate(("m_down1", "m_down2", "m_down3"), start=1):
        blocks = stage_blocks(stage)
        for j in blocks:
            _put_scunet_block(out, sd, f"{stage}.{j}", f"down{si}_{j}")
        dj = len(blocks)  # strided 2x2 conv at the end of the Sequential
        _put_conv(out, f"down{si}_conv", "weight", sd[f"{stage}.{dj}.weight"])
    for j in stage_blocks("m_body"):
        _put_scunet_block(out, sd, f"m_body.{j}", f"body_{j}")
    for si in (3, 2, 1):
        stage = f"m_up{si}"
        if f"{stage}.0.up.1.weight" in sd:  # Upconv (scale > 1)
            _put_conv(out, f"up{si}_conv_c0", "weight", sd[f"{stage}.0.up.1.weight"])
            _put_conv(out, f"up{si}_conv_c0", "bias", sd[f"{stage}.0.up.1.bias"])
            _put_conv(out, f"up{si}_conv_c1", "weight", sd[f"{stage}.0.up.3.weight"])
            _put_conv(out, f"up{si}_conv_c1", "bias", sd[f"{stage}.0.up.3.bias"])
        else:  # ConvTranspose2d(k=2, s=2) == 1x1 conv + pixel shuffle
            w = sd[f"{stage}.0.weight"]  # (I, O, 2, 2)
            i_ch, o_ch = w.shape[0], w.shape[1]
            out[f"up{si}_conv_deconv.conv.kernel"] = (
                w.reshape(i_ch, o_ch * 4)[None, None]
            )
        for j in stage_blocks(stage):
            _put_scunet_block(out, sd, f"{stage}.{j}", f"up{si}_{j - 1}")
    # RRDBUpsample tail (scale > 1)
    if "m_upsample.0.up.0.rdb1.conv1.weight" in sd:
        bi = 0
        while f"m_upsample.0.up.{bi}.rdb1.conv1.weight" in sd:
            for rdb in ("rdb1", "rdb2", "rdb3"):
                for cv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
                    t = f"m_upsample.0.up.{bi}.{rdb}.{cv}"
                    _put_conv(out, f"m_upsample_rrdb{bi}.{rdb}.{cv}", "weight",
                              sd[f"{t}.weight"])
                    _put_conv(out, f"m_upsample_rrdb{bi}.{rdb}.{cv}", "bias",
                              sd[f"{t}.bias"])
            bi += 1
        # conv indices: Upsample at bi + 3k, conv at bi + 3k + 1
        conv_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.fullmatch(r"m_upsample\.0\.up\.(\d+)\.weight", k))
        })
        s = module.scale
        for pos, idx in enumerate(conv_ids):
            if pos < len(conv_ids) - 1:
                name = f"m_upsample_c{s >> pos}"
            else:
                name = "m_upsample_out"
            _put_conv(out, name, "weight", sd[f"m_upsample.0.up.{idx}.weight"])
            _put_conv(out, name, "bias", sd[f"m_upsample.0.up.{idx}.bias"])
    return out


# ---------------------------------------------------------------------------
# Spectral-norm conv helper + discriminators
# (reference discriminator_arch.py, patchgan_arch.py, dunet_arch.py;
# golden-validated)
# ---------------------------------------------------------------------------


def _put_snconv(out: dict, sd: dict, tpre: str, fpre: str) -> None:
    """Map a torch spectral_norm-wrapped Conv2d to flax SNConv2d.

    Handles both torch APIs: legacy utils.spectral_norm (weight_orig /
    weight_u / weight_v) and parametrizations.spectral_norm
    (parametrizations.weight.original / ._u / ._v). The stored v is indexed
    over torch's (in, kh, kw) flattening; SNConv2d flattens (kh, kw, in).
    """
    if f"{tpre}.parametrizations.weight.original" in sd:
        w = sd[f"{tpre}.parametrizations.weight.original"]
        # the _SpectralNorm submodule sits at parametrizations.weight.0
        pu = f"{tpre}.parametrizations.weight.0._u"
        u = sd.get(pu, sd.get(f"{tpre}.parametrizations.weight._u"))
        v = sd.get(
            f"{tpre}.parametrizations.weight.0._v",
            sd.get(f"{tpre}.parametrizations.weight._v"),
        )
    elif f"{tpre}.weight_orig" in sd:
        w = sd[f"{tpre}.weight_orig"]
        u = sd[f"{tpre}.weight_u"]
        v = sd[f"{tpre}.weight_v"]
    else:  # plain conv (spectral norm absent)
        w, u, v = sd[f"{tpre}.weight"], None, None
    o, i, kh, kw = w.shape
    out[f"{fpre}.kernel"] = conv_w(w)
    if u is not None:
        out[f"__spectral__.{fpre}.u"] = u
        out[f"__spectral__.{fpre}.v"] = np.ascontiguousarray(
            v.reshape(i, kh, kw).transpose(1, 2, 0).reshape(-1)
        )
    if f"{tpre}.bias" in sd:
        out[f"{fpre}.bias"] = sd[f"{tpre}.bias"]


def _put_bn_stats(out: dict, sd: dict, tpre: str, fpre: str) -> None:
    """torch BatchNorm2d -> flax nn.BatchNorm (params + batch_stats)."""
    out[f"{fpre}.scale"] = sd[f"{tpre}.weight"]
    out[f"{fpre}.bias"] = sd[f"{tpre}.bias"]
    out[f"__batch_stats__.{fpre}.mean"] = sd[f"{tpre}.running_mean"]
    out[f"__batch_stats__.{fpre}.var"] = sd[f"{tpre}.running_var"]


@register_converter("VGGStyleDiscriminator")
def _convert_vggdisc(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k in list(sd):
        m = re.fullmatch(r"(conv\d_\d)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), sd[k])
    stages = ["bn0_1"] + [
        f"bn{i}_{j}" for i in range(1, 6) for j in (0, 1)
    ]
    for bn in stages:
        if f"{bn}.weight" in sd:
            _put_bn_stats(out, sd, bn, bn)
    # linear1 consumes the FLATTENED 4x4 feature map: torch flattens
    # (C, H, W) C-major, flax flattens NHWC (H, W, C) — permute the input
    # axis accordingly (impulse-tested; a plain transpose scrambles inputs)
    w1 = sd["linear1.weight"]  # (100, C*4*4), torch input index c*16+h*4+w
    c = w1.shape[1] // 16
    out["linear1.kernel"] = np.ascontiguousarray(
        w1.reshape(w1.shape[0], c, 4, 4).transpose(2, 3, 1, 0).reshape(-1, w1.shape[0])
    )
    out["linear1.bias"] = sd["linear1.bias"]
    _put_linear(out, "linear2", "weight", sd["linear2.weight"])
    _put_linear(out, "linear2", "bias", sd["linear2.bias"])
    return out


@register_converter("UNetDiscriminatorSN")
def _convert_unetdisc(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "conv0", "weight", sd["conv0.weight"])
    _put_conv(out, "conv0", "bias", sd["conv0.bias"])
    for i in range(1, 9):
        _put_snconv(out, sd, f"conv{i}", f"conv{i}")
    _put_conv(out, "conv9", "weight", sd["conv9.weight"])
    _put_conv(out, "conv9", "bias", sd["conv9.bias"])
    return out


@register_converter("PatchGANDiscriminatorSN")
def _convert_patchgan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    conv_ids = sorted({
        int(m.group(1)) for k in sd
        if (m := re.match(r"model\.(\d+)\.weight", k))
    })
    for pos, idx in enumerate(conv_ids):
        _put_snconv(out, sd, f"model.{idx}", f"conv{pos}")
    return out


@register_converter("MultiscalePatchGANDiscriminatorSN")
def _convert_ms_patchgan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    scales = sorted({
        int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))
    })
    for si in scales:
        conv_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"layers\.{si}\.(\d+)\.weight", k))
        })
        for pos, idx in enumerate(conv_ids):
            _put_snconv(out, sd, f"layers.{si}.{idx}", f"layers_{si}.conv{pos}")
    return out


@register_converter("DUnet")
def _convert_dunet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.weight"])
    _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.bias"])
    for i in (1, 2, 3):
        _put_snconv(out, sd, f"e_x{i}.0", f"e_x{i}.conv")
        t, f = f"up{i}.0", f"up{i}.dysample"
        _put_conv(out, f"{f}.offset", "weight", sd[f"{t}.offset.weight"])
        _put_conv(out, f"{f}.offset", "bias", sd[f"{t}.offset.bias"])
        _put_conv(out, f"{f}.scope", "weight", sd[f"{t}.scope.weight"])
        _put_snconv(out, sd, f"up{i}.1", f"up{i}.conv")
    _put_snconv(out, sd, "end_conv.0", "end_conv0")
    _put_snconv(out, sd, "end_conv.2", "end_conv1")
    _put_conv(out, "end_conv2", "weight", sd["end_conv.4.weight"])
    _put_conv(out, "end_conv2", "bias", sd["end_conv.4.bias"])
    return out


# ---------------------------------------------------------------------------
# HyperionSR / ElysiumSR (reference hyperionsr_arch.py:173-202,
# elysiumsr_arch.py:162-206; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("HyperionSR")
def _convert_hyperionsr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    # registered size variants wrap the net under a `model.` prefix
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    for k, v in sd.items():
        m = re.fullmatch(r"(conv_in|fusion|conv_out)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        m = re.fullmatch(r"upsampler\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "upsampler", m.group(1), v)
            continue
        m = re.fullmatch(r"body\.(\d+)\.blocks\.(\d+)\.(.+)", k)
        if m:
            g, b, rest = m.groups()
            fp = f"body_{g}_b{b}"
            m2 = re.fullmatch(r"(norm[12])\.(weight|bias)", rest)
            if m2:
                _put_ln(out, f"{fp}.{m2.group(1)}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"attn\.spatial_gate\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.spatial_gate", m2.group(1), v)
                continue
            m2 = re.fullmatch(r"ca\.conv_du\.([02])\.(weight|bias)", rest)
            if m2:
                name = "du_0" if m2.group(1) == "0" else "du_1"
                _put_conv(out, f"{fp}.ca.{name}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"ffn\.(project_in|project_out)\.(weight|bias)", rest)
            if m2:
                _put_conv(out, f"{fp}.{m2.group(1)}", m2.group(2), v)
                continue
        raise KeyError(f"unmapped HyperionSR key: {k}")
    return out


@register_converter("ElysiumSR")
def _convert_elysiumsr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    sd = {k.removeprefix("model."): v for k, v in sd.items()}
    for k, v in sd.items():
        m = re.fullmatch(r"(conv_in|conv_fuse|conv_out)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        m = re.fullmatch(r"upsampler\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "upsampler", m.group(1), v)
            continue
        m = re.fullmatch(r"blocks\.(\d+)\.(conv[12])\.(weight|bias)", k)
        if m:
            _put_conv(out, f"blocks_{m.group(1)}.{m.group(2)}", m.group(3), v)
            continue
        raise KeyError(f"unmapped ElysiumSR key: {k}")
    return out


# ---------------------------------------------------------------------------
# MetaGan2 / MetaGAN3 (reference metagan2_arch.py:186-260,
# metagan3_arch.py:164-193; golden-validated)
# ---------------------------------------------------------------------------


def _put_snlinear(out: dict, sd: dict, tpre: str, fpre: str) -> None:
    """spectral_norm(nn.Linear) -> SNConv2d 1x1 (same W_mat, v is (in,))."""
    if f"{tpre}.parametrizations.weight.original" in sd:
        w = sd[f"{tpre}.parametrizations.weight.original"]
        u = sd.get(f"{tpre}.parametrizations.weight.0._u",
                   sd.get(f"{tpre}.parametrizations.weight._u"))
        v = sd.get(f"{tpre}.parametrizations.weight.0._v",
                   sd.get(f"{tpre}.parametrizations.weight._v"))
    else:
        w = sd[f"{tpre}.weight_orig"]
        u = sd[f"{tpre}.weight_u"]
        v = sd[f"{tpre}.weight_v"]
    out[f"{fpre}.kernel"] = w.T[None, None]  # (1, 1, in, out)
    out[f"__spectral__.{fpre}.u"] = u
    out[f"__spectral__.{fpre}.v"] = v
    if f"{tpre}.bias" in sd:
        out[f"{fpre}.bias"] = sd[f"{tpre}.bias"]


def _put_inception_dw(out: dict, sd: dict, tpre: str, fpre: str,
                      names=("dwconv_hw", "dwconv_w", "dwconv_h")) -> None:
    for n in names:
        _put_conv(out, f"{fpre}.{n}", "weight", sd[f"{tpre}.{n}.weight"])
        _put_conv(out, f"{fpre}.{n}", "bias", sd[f"{tpre}.{n}.bias"])


@register_converter("MetaGan2")
def _convert_metagan2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for i, down in enumerate(module.downs):
        t, f = f"stages.{i}", f"stages_{i}"
        if down == 4:  # Stem
            _put_snconv(out, sd, f"{t}.down.conv1", f"{f}.stem1")
            _put_snconv(out, sd, f"{t}.down.conv2", f"{f}.stem2")
            out[f"{f}.stem_norm.scale"] = sd[f"{t}.down.norm2.weight"]
        else:
            out[f"{f}.down_norm.scale"] = sd[f"{t}.down.norm.weight"]
            _put_snconv(out, sd, f"{t}.down.conv", f"{f}.down")
        j = 0
        while f"{t}.blocks.{j}.gamma" in sd:
            b, fb = f"{t}.blocks.{j}", f"{f}.block_{j}"
            out[f"{fb}.norm.scale"] = sd[f"{b}.norm.weight"]
            _put_snlinear(out, sd, f"{b}.fc1", f"{fb}.fc1")
            _put_snlinear(out, sd, f"{b}.fc2", f"{fb}.fc2")
            # DConv wraps InceptionDWConv2d with flax names dw_hw/dw_w/dw_h
            for tn, fn in (("dwconv_hw", "dw_hw"), ("dwconv_w", "dw_w"),
                           ("dwconv_h", "dw_h")):
                _put_conv(out, f"{fb}.conv.{fn}", "weight",
                          sd[f"{b}.conv.conv.{tn}.weight"])
                _put_conv(out, f"{fb}.conv.{fn}", "bias",
                          sd[f"{b}.conv.conv.{tn}.bias"])
            out[f"{fb}.gamma"] = sd[f"{b}.gamma"]
            j += 1
    _put_snlinear(out, sd, "head.0", "head_fc1")
    _put_linear(out, "head_fc2", "weight", sd["head.2.weight"])
    _put_linear(out, "head_fc2", "bias", sd["head.2.bias"])
    return out


@register_converter("MetaGAN3")
def _convert_metagan3(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_snconv(out, sd, "stem.conv1", "stem_conv1")
    _put_snconv(out, sd, "stem.conv2", "stem_conv2")
    _put_ln(out, "stem_norm", "weight", sd["stem.norm.weight"])
    _put_ln(out, "stem_norm", "bias", sd["stem.norm.bias"])
    for si in range(len(module.blocks) - 1):
        t, f = f"stages.{si}", f"stage{si}"
        _put_snconv(out, sd, f"{t}.down", f"{f}_down")
        bi = 0
        while f"{t}.blocks.{bi}.fusion.weight" in sd:
            b, fb = f"{t}.blocks.{bi}", f"{f}_b{bi}"
            _put_ln(out, f"{fb}.local.norm", "weight", sd[f"{b}.local.norm.weight"])
            _put_ln(out, f"{fb}.local.norm", "bias", sd[f"{b}.local.norm.bias"])
            _put_snconv(out, sd, f"{b}.local.conv1", f"{fb}.local.conv1")
            _put_snconv(out, sd, f"{b}.local.conv2", f"{fb}.local.conv2")
            _put_inception_dw(out, sd, f"{b}.local.depthwise",
                              f"{fb}.local.depthwise")
            for c in ("conv2", "conv4", "conv8", "fuse"):
                _put_conv(out, f"{fb}.global_context.{c}", "weight",
                          sd[f"{b}.global_context.{c}.weight"])
                _put_conv(out, f"{fb}.global_context.{c}", "bias",
                          sd[f"{b}.global_context.{c}.bias"])
            _put_conv(out, f"{fb}.shift.fuse", "weight", sd[f"{b}.shift.fuse.weight"])
            _put_conv(out, f"{fb}.shift.fuse", "bias", sd[f"{b}.shift.fuse.bias"])
            _put_conv(out, f"{fb}.fusion", "weight", sd[f"{b}.fusion.weight"])
            _put_conv(out, f"{fb}.fusion", "bias", sd[f"{b}.fusion.bias"])
            bi += 1
    return out


# ---------------------------------------------------------------------------
# MUNet (reference munet_arch.py:253-404; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("MUNet")
def _convert_munet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_snconv(out, sd, "in_conv", "in_conv")
    for i in range(len(module.ch_mult)):
        _put_snconv(out, sd, f"down_blocks.{i}.0", f"down_{i}")
    _put_snconv(out, sd, "mid_conv.0", "mid_0")
    _put_snconv(out, sd, "mid_conv.2", "mid_1")
    for n in ("query", "key", "value"):
        _put_snconv(out, sd, f"self_attn.{n}", f"self_attn.{n}")
    out["self_attn.gamma"] = sd["self_attn.gamma"]
    for i in range(len(module.ch_mult)):
        # the reference's init pass overwrote the "fixed" magic kernels with
        # kaiming noise, so checkpoints carry real values here — load them
        mu = f"up_blocks.{i}.magic_upsample"
        fu = f"up_{i}.magic_upsample"
        # torch conv_h weight (C,1,1,k) -> (1,k,1,C); conv_v (C,1,k,1) -> (k,1,1,C)
        out[f"{fu}.sharpen_h"] = conv_w(sd[f"{mu}.sharpen.conv_h.weight"])
        out[f"{fu}.sharpen_v"] = conv_w(sd[f"{mu}.sharpen.conv_v.weight"])
        out[f"{fu}.resample_h"] = conv_w(sd[f"{mu}.resample_conv.conv_h.weight"])
        out[f"{fu}.resample_v"] = conv_w(sd[f"{mu}.resample_conv.conv_v.weight"])
        _put_snconv(out, sd, f"up_blocks.{i}.post_upsample_conv",
                    f"up_{i}.post_upsample_conv")
        _put_snconv(out, sd, f"up_blocks.{i}.fusion_conv.0", f"up_{i}.fusion_conv")
    _put_snconv(out, sd, "grad_conv.0", "grad_0")
    _put_snconv(out, sd, "grad_conv.2", "grad_1")
    _put_snconv(out, sd, "freq_proc.0", "freq_0")
    _put_snconv(out, sd, "freq_proc.2", "freq_1")
    _put_snconv(out, sd, "patch_reduce.0", "patch_reduce")
    _put_snconv(out, sd, "patch_upsample.0", "patch_upsample")
    _put_snconv(out, sd, "attention_fusion.attention_conv.0",
                "attention_fusion.attn_0")
    _put_snconv(out, sd, "attention_fusion.attention_conv.2",
                "attention_fusion.attn_1")
    _put_snconv(out, sd, "attention_fusion.fusion_conv.0",
                "attention_fusion.fusion_0")
    _put_snconv(out, sd, "attention_fusion.fusion_conv.2",
                "attention_fusion.fusion_1")
    _put_snconv(out, sd, "out_conv", "out_conv")
    return out


# ---------------------------------------------------------------------------
# GateRV3 (reference gaterv3_arch.py:391-503; golden-validated)
# ---------------------------------------------------------------------------


def _convert_gater_gcnn(sd: dict, t: str, f: str, out: dict) -> None:
    """GateRV3 GatedCNNBlock: RMSNorm + 1x1 fc1/fc2 + token mixer
    (InceptionDW or flash Attention; the Attention `temperature` only feeds
    the non-flash path and has no flax counterpart)."""
    out[f"{f}.norm.scale"] = sd[f"{t}.norm.scale"].reshape(-1)
    out[f"{f}.norm.offset"] = sd[f"{t}.norm.offset"].reshape(-1)
    for c in ("fc1", "fc2"):
        _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
        _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
    if f"{t}.token_mix.dwconv_hw.weight" in sd:
        _put_inception_dw(out, sd, f"{t}.token_mix", f"{f}.token_mix")
    else:  # Attention
        _put_conv(out, f"{f}.token_mix.qkv", "weight", sd[f"{t}.token_mix.qkv.weight"])
        _put_conv(out, f"{f}.token_mix.qkv_dwconv", "weight",
                  sd[f"{t}.token_mix.qkv_dwconv.weight"])
        _put_conv(out, f"{f}.token_mix.qkv_dwconv", "bias",
                  sd[f"{t}.token_mix.qkv_dwconv.bias"])
        _put_conv(out, f"{f}.token_mix.project_out", "weight",
                  sd[f"{t}.token_mix.project_out.weight"])


def _convert_metagated(sd: dict, t: str, f: str, out: dict) -> None:
    out[f"{f}.local_norm.scale"] = sd[f"{t}.local.0.scale"].reshape(-1)
    out[f"{f}.local_norm.offset"] = sd[f"{t}.local.0.offset"].reshape(-1)
    _put_conv(out, f"{f}.local_fc", "weight", sd[f"{t}.local.1.weight"])
    _put_conv(out, f"{f}.local_fc", "bias", sd[f"{t}.local.1.bias"])
    _put_conv(out, f"{f}.local_dw", "weight", sd[f"{t}.local.2.weight"])
    _put_conv(out, f"{f}.local_dw", "bias", sd[f"{t}.local.2.bias"])
    _put_conv(out, f"{f}.sca", "weight", sd[f"{t}.sca.1.weight"])
    _put_conv(out, f"{f}.sca", "bias", sd[f"{t}.sca.1.bias"])
    out[f"{f}.gamma0"] = sd[f"{t}.gamma0"].reshape(-1)
    out[f"{f}.gamma1"] = sd[f"{t}.gamma1"].reshape(-1)
    _convert_gater_gcnn(sd, f"{t}.glob", f"{f}.glob", out)


@register_converter("GateRV3")
def _convert_gaterv3(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.weight"])
    _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.bias"])
    _convert_conv3xc(sd, "span_block0.c1_r", "span_block0.c1_r", out)
    _convert_conv3xc(sd, "span_block0.c2_r", "span_block0.c2_r", out)
    _convert_conv3xc(sd, "span_block0.c3_r", "span_block0.c3_r", out)
    i = 0
    while f"span_n_b.{i}.c1_r.sk.weight" in sd:
        for c in ("c1_r", "c2_r", "c3_r"):
            _convert_conv3xc(sd, f"span_n_b.{i}.{c}", f"span_n_b_{i}.{c}", out)
        i += 1
    for c in ("c1_r", "c2_r", "c3_r"):
        _convert_conv3xc(sd, f"span_end.{c}", f"span_end.{c}", out)
    _convert_conv3xc(sd, "sisr_end_conv", "sisr_end_conv", out)
    _put_conv(out, "sisr_cat_conv", "weight", sd["sisr_cat_conv.weight"])
    _put_conv(out, "sisr_cat_conv", "bias", sd["sisr_cat_conv.bias"])
    for li in range(len(module.enc_blocks)):
        j = 0
        while f"gater_encode.{li}.gated.{j}.gamma0" in sd:
            _convert_metagated(
                sd, f"gater_encode.{li}.gated.{j}", f"enc_{li}_g{j}", out
            )
            j += 1
        _put_conv(out, f"enc_{li}_down", "weight",
                  sd[f"gater_encode.{li}.scale.0.weight"])
    i = 0
    while f"latent.{i}.norm.scale" in sd:
        _convert_gater_gcnn(sd, f"latent.{i}", f"latent_{i}", out)
        i += 1
    for li in range(len(module.dec_blocks)):
        _put_conv(out, f"dec_{li}_up", "weight", sd[f"decode.{li}.scale.0.weight"])
        _put_conv(out, f"dec_{li}_shor", "weight", sd[f"decode.{li}.shor.weight"])
        _put_conv(out, f"dec_{li}_shor", "bias", sd[f"decode.{li}.shor.bias"])
        j = 0
        while f"decode.{li}.gated.{j}.gamma0" in sd:
            _convert_metagated(sd, f"decode.{li}.gated.{j}", f"dec_{li}_g{j}", out)
            j += 1
    out["gamma"] = sd["gamma"].reshape(-1)
    if module.scale != 1:
        mode, meta_scale = uni_upsample_mode(sd, "dim_to_in", module.upsample)
        _convert_uni_upsample(
            sd, "dim_to_in", "dim_to_in", mode, meta_scale or module.scale, out
        )
    else:
        _put_conv(out, "dim_to_in", "weight", sd["dim_to_in.weight"])
        _put_conv(out, "dim_to_in", "bias", sd["dim_to_in.bias"])
    return out


# ---------------------------------------------------------------------------
# LAWFFT (reference lawfft_arch.py:229-301; golden-validated)
# ---------------------------------------------------------------------------


def _put_dynamic_local(out: dict, sd: dict, t: str, f: str) -> None:
    _put_conv(out, f"{f}.gen1", "weight", sd[f"{t}.kernel_gen.1.weight"])
    _put_conv(out, f"{f}.gen1", "bias", sd[f"{t}.kernel_gen.1.bias"])
    _put_conv(out, f"{f}.gen2", "weight", sd[f"{t}.kernel_gen.3.weight"])
    _put_conv(out, f"{f}.gen2", "bias", sd[f"{t}.kernel_gen.3.bias"])


@register_converter("LAWFFT")
def _convert_lawfft(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if "in_to_dim.1.weight" in sd:  # unshuffle Sequential
        _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.1.weight"])
        _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.1.bias"])
    else:
        _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.weight"])
        _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.bias"])
    ri = 0
    while f"body.{ri}.residual.0.token_mix.0.weight" in sd:
        mi = 0
        while f"body.{ri}.residual.{mi}.token_mix.0.weight" in sd:
            t = f"body.{ri}.residual.{mi}"
            f = f"body_{ri}_m{mi}"
            _put_ln(out, f"{f}.tm_norm", "weight", sd[f"{t}.token_mix.0.weight"])
            _put_ln(out, f"{f}.tm_norm", "bias", sd[f"{t}.token_mix.0.bias"])
            sf = f"{t}.token_mix.1"
            _put_dynamic_local(out, sd, f"{sf}.local.0", f"{f}.local_0")
            _put_dynamic_local(out, sd, f"{sf}.local.1", f"{f}.local_1")
            for c in ("to_hidden", "to_hidden_dw", "project_out"):
                _put_conv(out, f"{f}.att.{c}", "weight", sd[f"{sf}.att.{c}.weight"])
                _put_conv(out, f"{f}.att.{c}", "bias", sd[f"{sf}.att.{c}.bias"])
            _put_ln(out, f"{f}.att.norm", "weight", sd[f"{sf}.att.norm.weight"])
            _put_ln(out, f"{f}.att.norm", "bias", sd[f"{sf}.att.norm.bias"])
            _put_conv(out, f"{f}.tm_last", "weight", sd[f"{sf}.last.weight"])
            _put_conv(out, f"{f}.tm_last", "bias", sd[f"{sf}.last.bias"])
            _put_ln(out, f"{f}.cm_norm", "weight", sd[f"{t}.channel_mix1.0.weight"])
            _put_ln(out, f"{f}.cm_norm", "bias", sd[f"{t}.channel_mix1.0.bias"])
            for tn, fn in (("project_in", "ffn_in"), ("dwconv", "ffn_dw"),
                           ("project_out", "ffn_out")):
                _put_conv(out, f"{f}.{fn}", "weight",
                          sd[f"{t}.channel_mix1.1.{tn}.weight"])
                _put_conv(out, f"{f}.{fn}", "bias",
                          sd[f"{t}.channel_mix1.1.{tn}.bias"])
            mi += 1
        _put_dynamic_local(out, sd, f"body.{ri}.residual.{mi}", f"body_{ri}_dl")
        ri += 1
    inner_scale = module.scale
    if module.unshuffle_mod and module.scale < 3:
        inner_scale = 4
    mode, meta_scale = uni_upsample_mode(sd, "upscale", module.upsampler)
    _convert_uni_upsample(
        sd, "upscale", "upscale", mode, meta_scale or inner_scale, out
    )
    return out


# ---------------------------------------------------------------------------
# ESCRealM (reference escreal_arch.py:421-570; golden-validated)
# ---------------------------------------------------------------------------


def _put_convffn(out: dict, sd: dict, t: str, f: str) -> None:
    for c in ("proj", "dwc", "aggr"):
        _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
        _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])


@register_converter("ESCRealM")
def _convert_escreal(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if "proj.1.weight" in sd:  # unshuffle Sequential
        _put_conv(out, "proj", "weight", sd["proj.1.weight"])
        _put_conv(out, "proj", "bias", sd["proj.1.bias"])
        skip_idx = (1, 2, 4)
    else:
        _put_conv(out, "proj", "weight", sd["proj.weight"])
        _put_conv(out, "proj", "bias", sd["proj.bias"])
        skip_idx = (0, 1, 3)
    for idx, name in zip(skip_idx, ("skip_0", "skip_dw", "skip_1")):
        _put_conv(out, name, "weight", sd[f"skip.{idx}.weight"])
        _put_conv(out, name, "bias", sd[f"skip.{idx}.bias"])
    out["plk_filter"] = conv_w(sd["plk_filter"])
    bi = 0
    while f"blocks.{bi}.ln_proj.weight" in sd:
        t, f = f"blocks.{bi}", f"blocks_{bi}"
        for ln in ("ln_proj", "ln_attn", "ln_out"):
            _put_ln(out, f"{f}.{ln}", "weight", sd[f"{t}.{ln}.weight"])
            _put_ln(out, f"{f}.{ln}", "bias", sd[f"{t}.{ln}.bias"])
        _put_convffn(out, sd, f"{t}.proj", f"{f}.proj")
        for c in ("to_qkv", "to_out"):
            _put_conv(out, f"{f}.attn.{c}", "weight", sd[f"{t}.attn.{c}.weight"])
            _put_conv(out, f"{f}.attn.{c}", "bias", sd[f"{t}.attn.{c}.bias"])
        out[f"{f}.attn.relative_position_bias"] = sd[
            f"{t}.attn.relative_position_bias"
        ]
        ci = 0
        while f"{t}.lns.{ci}.weight" in sd:
            _put_ln(out, f"{f}.lns_{ci}", "weight", sd[f"{t}.lns.{ci}.weight"])
            _put_ln(out, f"{f}.lns_{ci}", "bias", sd[f"{t}.lns.{ci}.bias"])
            _put_convffn(out, sd, f"{t}.convffns.{ci}", f"{f}.convffns_{ci}")
            pc = f"{t}.pconvs.{ci}"
            fp = f"{f}.pconvs_{ci}"
            _put_conv(out, f"{fp}_plk.dwc_proj_0", "weight",
                      sd[f"{pc}.plk.dwc_proj.1.weight"])
            _put_conv(out, f"{fp}_plk.dwc_proj_0", "bias",
                      sd[f"{pc}.plk.dwc_proj.1.bias"])
            w3 = sd[f"{pc}.plk.dwc_proj.3.weight"]
            out[f"{fp}_plk.dwc_proj_w"] = w3[:, :, 0, 0].T
            out[f"{fp}_plk.dwc_proj_b"] = sd[f"{pc}.plk.dwc_proj.3.bias"]
            _put_conv(out, f"{fp}_aggr", "weight", sd[f"{pc}.aggr.weight"])
            _put_conv(out, f"{fp}_aggr", "bias", sd[f"{pc}.aggr.bias"])
            ci += 1
        _put_conv(out, f"{f}.conv_out", "weight", sd[f"{t}.conv_out.weight"])
        _put_conv(out, f"{f}.conv_out", "bias", sd[f"{t}.conv_out.bias"])
        bi += 1
    _put_conv(out, "last", "weight", sd["last.weight"])
    _put_conv(out, "last", "bias", sd["last.bias"])
    inner_scale = module.scale
    if module.unshuffle_mod and module.scale < 3:
        inner_scale = 4
    mode, meta_scale = uni_upsample_mode(sd, "to_img", module.upsampler)
    _convert_uni_upsample(
        sd, "to_img", "to_img", mode, meta_scale or inner_scale, out
    )
    return out


# ---------------------------------------------------------------------------
# GFISRV2 (reference gfisrv2_arch.py:689-745; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("GFISRV2")
def _convert_gfisrv2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if "in_to_dim.1.weight" in sd:
        _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.1.weight"])
        _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.1.bias"])
    else:
        _put_conv(out, "in_to_dim", "weight", sd["in_to_dim.weight"])
        _put_conv(out, "in_to_dim", "bias", sd["in_to_dim.bias"])
    n_blocks = module.n_blocks
    # branch key names in torch follow the rotated ROLE (pconv/dwconv_*),
    # flax names follow the physical SLOT (branch_0..3); slot j holds role j
    role_names = ("pconv", "dwconv_hw", "dwconv_w", "dwconv_h")
    for bi in range(n_blocks):
        t, f = f"gfisr_body.{bi}", f"body_{bi}"
        out[f"{f}.norm.scale"] = sd[f"{t}.norm.scale"].reshape(-1)
        out[f"{f}.norm.offset"] = sd[f"{t}.norm.offset"].reshape(-1)
        out[f"{f}.gamma"] = sd[f"{t}.gamma"].reshape(-1)
        for c in ("fc1", "fc2"):
            _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
            _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
        for slot in range(4):
            kind = (bi + slot) % 4
            trole = role_names[slot]
            fp = f"{f}.conv.branch_{slot}"
            if kind == 0:  # FourierUnit
                tp = f"{t}.conv.{trole}"
                out[f"{fp}.rn.scale"] = sd[f"{tp}.rn.scale"].reshape(-1)
                out[f"{fp}.rn.offset"] = sd[f"{tp}.rn.offset"].reshape(-1)
                out[f"{fp}.post_norm.scale"] = sd[f"{tp}.post_norm.scale"].reshape(-1)
                out[f"{fp}.post_norm.offset"] = sd[f"{tp}.post_norm.offset"].reshape(-1)
                for c in ("fdc", "fpe"):
                    _put_conv(out, f"{fp}.{c}", "weight", sd[f"{tp}.{c}.weight"])
                    _put_conv(out, f"{fp}.{c}", "bias", sd[f"{tp}.{c}.bias"])
            else:
                _put_conv(out, fp, "weight", sd[f"{t}.conv.{trole}.weight"])
                _put_conv(out, fp, "bias", sd[f"{t}.conv.{trole}.bias"])
        # (the convs list registers each branch under its role name only)
    # refinement tail convs at Sequential indices n_blocks, n_blocks+2
    _put_conv(out, "refine_0", "weight", sd[f"gfisr_body.{n_blocks}.weight"])
    _put_conv(out, "refine_0", "bias", sd[f"gfisr_body.{n_blocks}.bias"])
    _put_conv(out, "refine_1", "weight", sd[f"gfisr_body.{n_blocks + 2}.weight"])
    _put_conv(out, "refine_1", "bias", sd[f"gfisr_body.{n_blocks + 2}.bias"])
    inner_scale = module.scale
    if module.pixel_unshuffle_mod and module.scale in (1, 2):
        inner_scale = 4
    mode, meta_scale = uni_upsample_mode(sd, "upscale", module.upsampler)
    _convert_uni_upsample(
        sd, "upscale", "upscale", mode, meta_scale or inner_scale, out
    )
    return out


# ---------------------------------------------------------------------------
# ParagonSR (reference paragonsr_arch.py:245-421; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("ParagonSR")
def _convert_paragonsr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for n in ("conv_in", "conv_fuse", "conv_out"):
        _put_conv(out, n, "weight", sd[f"{n}.weight"])
        _put_conv(out, n, "bias", sd[f"{n}.bias"])
    _put_conv(out, "upsampler", "weight", sd["upsampler.0.weight"])
    _put_conv(out, "upsampler", "bias", sd["upsampler.0.bias"])
    for gi in range(module.num_groups):
        for bi in range(module.num_blocks):
            t = f"body.{gi}.blocks.{bi}"
            f = f"body_{gi}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            out[f"{f}.ls1_gamma"] = sd[f"{t}.ls1.gamma"]
            out[f"{f}.ls2_gamma"] = sd[f"{t}.ls2.gamma"]
            _put_inception_dw(out, sd, f"{t}.context", f"{f}.context")
            tr, fr = f"{t}.transformer", f"{f}.transformer"
            for c in ("project_in_g", "project_in_i", "project_out"):
                _put_conv(out, f"{fr}.{c}", "weight", sd[f"{tr}.{c}.weight"])
                _put_conv(out, f"{fr}.{c}", "bias", sd[f"{tr}.{c}.bias"])
            sm = f"{tr}.spatial_mixer"
            fm = f"{fr}.spatial_mixer"
            out[f"{fm}.conv3x3_kernel"] = conv_w(sd[f"{sm}.conv3x3.weight"])
            out[f"{fm}.conv3x3_bias"] = sd[f"{sm}.conv3x3.bias"]
            out[f"{fm}.conv1x1_kernel"] = conv_w(sd[f"{sm}.conv1x1.weight"])
            out[f"{fm}.conv1x1_bias"] = sd[f"{sm}.conv1x1.bias"]
            out[f"{fm}.dw_conv3x3_kernel"] = conv_w(sd[f"{sm}.dw_conv3x3.weight"])
            out[f"{fm}.dw_conv3x3_bias"] = sd[f"{sm}.dw_conv3x3.bias"]
    # magic_upsampler kernels are genuinely fixed constants here (no init
    # pass touches them in ParagonSR) — synthesized in flax
    return out


# ---------------------------------------------------------------------------
# FlexNet / MetaFlexNet (reference flexnet_arch.py:612-743; golden-validated)
# ---------------------------------------------------------------------------


def _put_convblock(out: dict, sd: dict, t: str, f: str) -> None:
    _put_conv(out, f"{f}.b0", "weight", sd[f"{t}.block.0.weight"])
    _put_conv(out, f"{f}.b0", "bias", sd[f"{t}.block.0.bias"])
    _put_conv(out, f"{f}.b1", "weight", sd[f"{t}.block.2.weight"])
    _put_conv(out, f"{f}.b1", "bias", sd[f"{t}.block.2.bias"])
    _put_conv(out, f"{f}.conv11", "weight", sd[f"{t}.conv11.weight"])
    _put_conv(out, f"{f}.conv11", "bias", sd[f"{t}.conv11.bias"])


def _put_omnishift_flex(out: dict, sd: dict, t: str, f: str) -> None:
    out[f"{f}.k1"] = conv_w(sd[f"{t}.conv1x1.weight"])
    out[f"{f}.k3"] = conv_w(sd[f"{t}.conv3x3.weight"])
    out[f"{f}.k5"] = conv_w(sd[f"{t}.conv5x5.weight"])
    out[f"{f}.alpha"] = sd[f"{t}.alpha"]
    # conv5x5_reparam is derivable and skipped


def _put_flex_tblock(out: dict, sd: dict, t: str, f: str) -> None:
    _put_ln(out, f"{f}.rn1", "weight", sd[f"{t}.rn1.weight"])
    _put_ln(out, f"{f}.rn2", "weight", sd[f"{t}.rn2.weight"])
    out[f"{f}.gamma1"] = sd[f"{t}.gamma1"]
    out[f"{f}.gamma2"] = sd[f"{t}.gamma2"]
    _put_omnishift_flex(out, sd, f"{t}.att.omni_shift", f"{f}.att.omni_shift")
    _put_linear(out, f"{f}.att.vit.qkv", "weight", sd[f"{t}.att.qkv.weight"])
    _put_linear(out, f"{f}.att.vit.qkv", "bias", sd[f"{t}.att.qkv.bias"])
    _put_linear(out, f"{f}.att.vit.proj", "weight", sd[f"{t}.att.proj.weight"])
    _put_linear(out, f"{f}.att.vit.proj", "bias", sd[f"{t}.att.proj.bias"])
    _put_conv(out, f"{f}.att.vit.get_v", "weight", sd[f"{t}.att.get_v.weight"])
    _put_conv(out, f"{f}.att.vit.get_v", "bias", sd[f"{t}.att.get_v.bias"])
    _put_omnishift_flex(out, sd, f"{t}.ffn.omni_shift", f"{f}.ffn.omni_shift")
    for lin in ("key", "value", "receptance"):
        _put_linear(out, f"{f}.ffn.{lin}", "weight", sd[f"{t}.ffn.{lin}.weight"])
    if f"{t}.ffn.key_norm.weight" in sd:
        _put_ln(out, f"{f}.ffn.key_norm", "weight", sd[f"{t}.ffn.key_norm.weight"])


def _put_flex_stage(out: dict, sd: dict, t: str, f: str) -> None:
    j = 0
    while f"{t}.t_blocks.{j}.gamma1" in sd:
        _put_flex_tblock(out, sd, f"{t}.t_blocks.{j}", f"{f}.t_{j}")
        j += 1
    _put_convblock(out, sd, f"{t}.conv", f"{f}.conv")


@register_converter("FlexNet")
def _convert_flexnet(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_convblock(out, sd, "short_cut", "short_cut")
    _put_conv(out, "in_to_feat", "weight", sd["in_to_feat.weight"])
    _put_conv(out, "in_to_feat", "bias", sd["in_to_feat.bias"])
    if module.pipeline_type == "linear":
        si = 0
        while f"pipeline.att.{si}.conv.conv11.weight" in sd:
            _put_flex_stage(out, sd, f"pipeline.att.{si}", f"att_{si}")
            si += 1
    else:
        for tn, fn in (("enc0.0", "enc0"), ("enc1.0", "enc1"), ("enc2.0", "enc2"),
                       ("enc3.0", "enc3"), ("dec0.0", "dec0"), ("dec1.0", "dec1"),
                       ("dec2.0", "dec2")):
            _put_flex_stage(out, sd, f"pipeline.{tn}", fn)
        for i in (1, 2, 3):
            _put_conv(out, f"down{i}", "weight",
                      sd[f"pipeline.down{i}.body.0.weight"])
            _put_conv(out, f"up{i}", "weight", sd[f"pipeline.up{i}.body.0.weight"])
    if module.upsampler == "pixelshuffle":
        _put_conv(out, "to_img", "weight", sd["to_img.0.weight"])
        _put_conv(out, "to_img", "bias", sd["to_img.0.bias"])
    elif module.upsampler == "dysample":
        for c in ("offset", "end_conv"):
            _put_conv(out, f"to_img.{c}", "weight", sd[f"to_img.{c}.weight"])
            _put_conv(out, f"to_img.{c}", "bias", sd[f"to_img.{c}.bias"])
        _put_conv(out, "to_img.scope", "weight", sd["to_img.scope.weight"])
    else:  # nearest+conv
        _put_conv(out, "to_img_pre", "weight", sd["to_img.0.weight"])
        _put_conv(out, "to_img_pre", "bias", sd["to_img.0.bias"])
        conv_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.fullmatch(r"to_img\.1\.(\d+)\.weight", k))
        })
        for pos, idx in enumerate(conv_ids):
            if pos < len(conv_ids) - 2:
                name = f"to_img_up{pos}"
            elif pos == len(conv_ids) - 2:
                name = "to_img_hr"
            else:
                name = "to_img_last"
            _put_conv(out, name, "weight", sd[f"to_img.1.{idx}.weight"])
            _put_conv(out, name, "bias", sd[f"to_img.1.{idx}.bias"])
    return out


# ---------------------------------------------------------------------------
# HiT family (reference hit_sir/sng/srf_arch.py; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("HiT")
def _convert_hit(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "conv_first", "weight", sd["conv_first.weight"])
    _put_conv(out, "conv_first", "bias", sd["conv_first.bias"])
    _put_ln(out, "patch_norm", "weight", sd["patch_embed.norm.weight"])
    _put_ln(out, "patch_norm", "bias", sd["patch_embed.norm.bias"])
    _put_ln(out, "norm", "weight", sd["norm.weight"])
    _put_ln(out, "norm", "bias", sd["norm.bias"])
    _put_conv(out, "conv_after_body", "weight", sd["conv_after_body.weight"])
    _put_conv(out, "conv_after_body", "bias", sd["conv_after_body.bias"])
    for li in range(len(module.depths)):
        _put_conv(out, f"layers_{li}_conv", "weight", sd[f"layers.{li}.conv.weight"])
        _put_conv(out, f"layers_{li}_conv", "bias", sd[f"layers.{li}.conv.bias"])
        bi = 0
        while f"layers.{li}.residual_group.blocks.{bi}.norm1.weight" in sd:
            t = f"layers.{li}.residual_group.blocks.{bi}"
            f = f"layers_{li}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            c = f"{t}.correlation"
            fc = f"{f}.correlation"
            for idx, name in ((0, "conv0"), (2, "conv1"), (4, "conv2")):
                _put_conv(out, f"{fc}.qv.{name}", "weight", sd[f"{c}.qv.conv.{idx}.weight"])
                _put_conv(out, f"{fc}.qv.{name}", "bias", sd[f"{c}.qv.conv.{idx}.bias"])
            _put_conv(out, f"{fc}.qv.linear", "weight", sd[f"{c}.qv.linear.weight"])
            _put_conv(out, f"{fc}.qv.linear", "bias", sd[f"{c}.qv.linear.bias"])
            _put_linear(out, f"{fc}.spatial_linear", "weight", sd[f"{c}.spatial_linear.weight"])
            _put_linear(out, f"{fc}.spatial_linear", "bias", sd[f"{c}.spatial_linear.bias"])
            _put_linear(out, f"{fc}.proj", "weight", sd[f"{c}.proj.weight"])
            _put_linear(out, f"{fc}.proj", "bias", sd[f"{c}.proj.bias"])
            _put_linear(out, f"{fc}.pos.pos_proj", "weight", sd[f"{c}.pos.pos_proj.weight"])
            _put_linear(out, f"{fc}.pos.pos_proj", "bias", sd[f"{c}.pos.pos_proj.bias"])
            for pn, (ln_name, fc_name) in (
                ("pos1", ("pos1_ln", "pos1_fc")),
                ("pos2", ("pos2_ln", "pos2_fc")),
                ("pos3", ("pos3_ln", "pos3_fc")),
            ):
                _put_ln(out, f"{fc}.pos.{ln_name}", "weight", sd[f"{c}.pos.{pn}.0.weight"])
                _put_ln(out, f"{fc}.pos.{ln_name}", "bias", sd[f"{c}.pos.{pn}.0.bias"])
                _put_linear(out, f"{fc}.pos.{fc_name}", "weight", sd[f"{c}.pos.{pn}.2.weight"])
                _put_linear(out, f"{fc}.pos.{fc_name}", "bias", sd[f"{c}.pos.{pn}.2.bias"])
            if f"{c}.ngram_window_partition.ngram_context.merge.weight" in sd:
                ng = f"{c}.ngram_window_partition.ngram_context"
                fg = f"{fc}.ngram_context"
                out[f"{fg}.unigram_kernel"] = conv_w(sd[f"{ng}.unigram_embed.weight"])
                out[f"{fg}.unigram_bias"] = sd[f"{ng}.unigram_embed.bias"]
                _put_conv(out, f"{fg}.merge", "weight", sd[f"{ng}.merge.weight"])
                _put_conv(out, f"{fg}.merge", "bias", sd[f"{ng}.merge.bias"])
                na = f"{ng}.ngram_attn"
                fa = f"{fg}.ngram_attn"
                _put_linear(out, f"{fa}.qkv", "weight", sd[f"{na}.qkv.weight"])
                _put_linear(out, f"{fa}.qkv", "bias", sd[f"{na}.qkv.bias"])
                _put_linear(out, f"{fa}.proj", "weight", sd[f"{na}.proj.weight"])
                _put_linear(out, f"{fa}.proj", "bias", sd[f"{na}.proj.bias"])
                out[f"{fa}.relative_position_bias_table"] = sd[
                    f"{na}.relative_position_bias_table"
                ]
            _put_linear(out, f"{f}.mlp_fc1", "weight", sd[f"{t}.mlp.fc1.weight"])
            _put_linear(out, f"{f}.mlp_fc1", "bias", sd[f"{t}.mlp.fc1.bias"])
            _put_linear(out, f"{f}.mlp_fc2", "weight", sd[f"{t}.mlp.fc2.weight"])
            _put_linear(out, f"{f}.mlp_fc2", "bias", sd[f"{t}.mlp.fc2.bias"])
            if f"{t}.mlp.dwconv.depthwise_conv.0.weight" in sd:  # SRF ConvFFN
                _put_conv(out, f"{f}.mlp_dw", "weight",
                          sd[f"{t}.mlp.dwconv.depthwise_conv.0.weight"])
                _put_conv(out, f"{f}.mlp_dw", "bias",
                          sd[f"{t}.mlp.dwconv.depthwise_conv.0.bias"])
            bi += 1
    if module.upsampler == "pixelshuffledirect":
        _put_conv(out, "upsample", "weight", sd["upsample.0.weight"])
        _put_conv(out, "upsample", "bias", sd["upsample.0.bias"])
    elif module.upsampler == "pixelshuffle":
        _put_conv(out, "conv_before_upsample", "weight",
                  sd["conv_before_upsample.0.weight"])
        _put_conv(out, "conv_before_upsample", "bias",
                  sd["conv_before_upsample.0.bias"])
        up_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", k))
        })
        for pos, idx in enumerate(up_ids):
            _put_conv(out, f"upsample_{pos}", "weight", sd[f"upsample.{idx}.weight"])
            _put_conv(out, f"upsample_{pos}", "bias", sd[f"upsample.{idx}.bias"])
        _put_conv(out, "conv_last", "weight", sd["conv_last.weight"])
        _put_conv(out, "conv_last", "bias", sd["conv_last.bias"])
    else:
        _put_conv(out, "conv_last", "weight", sd["conv_last.weight"])
        _put_conv(out, "conv_last", "bias", sd["conv_last.bias"])
    return out


# ---------------------------------------------------------------------------
# SRFormerV2 (reference srformerv2_arch.py:1325-1638; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("SRFormerV2")
def _convert_srformerv2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "conv_first", "weight", sd["conv_first.weight"])
    _put_conv(out, "conv_first", "bias", sd["conv_first.bias"])
    _put_ln(out, "patch_norm", "weight", sd["patch_embed.norm.weight"])
    _put_ln(out, "patch_norm", "bias", sd["patch_embed.norm.bias"])
    _put_ln(out, "norm", "weight", sd["norm.weight"])
    _put_ln(out, "norm", "bias", sd["norm.bias"])
    _put_conv(out, "conv_after_body", "weight", sd["conv_after_body.weight"])
    _put_conv(out, "conv_after_body", "bias", sd["conv_after_body.bias"])
    for li in range(len(module.depths)):
        _put_conv(out, f"layers_{li}_conv", "weight", sd[f"layers.{li}.conv.weight"])
        _put_conv(out, f"layers_{li}_conv", "bias", sd[f"layers.{li}.conv.bias"])
        bi = 0
        while f"layers.{li}.residual_group.blocks.{bi}.norm1.weight" in sd:
            t = f"layers.{li}.residual_group.blocks.{bi}"
            f = f"layers_{li}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            _put_linear(out, f"{f}.mlp_fc1", "weight", sd[f"{t}.mlp.fc1.weight"])
            _put_linear(out, f"{f}.mlp_fc1", "bias", sd[f"{t}.mlp.fc1.bias"])
            _put_linear(out, f"{f}.mlp_fc2", "weight", sd[f"{t}.mlp.fc2.weight"])
            _put_linear(out, f"{f}.mlp_fc2", "bias", sd[f"{t}.mlp.fc2.bias"])
            out[f"{f}.relative_position_bias_table"] = sd[
                f"{t}.attn.relative_position_bias_table"
            ]
            if f"{t}.attn.q.weight" in sd:  # PSA block
                for lin in ("q", "kv", "proj"):
                    _put_linear(out, f"{f}.attn.{lin}", "weight",
                                sd[f"{t}.attn.{lin}.weight"])
                    _put_linear(out, f"{f}.attn.{lin}", "bias",
                                sd[f"{t}.attn.{lin}.bias"])
                # the table lives inside the attn submodule for PSA
                out.pop(f"{f}.relative_position_bias_table")
                out[f"{f}.attn.relative_position_bias_table"] = sd[
                    f"{t}.attn.relative_position_bias_table"
                ]
                _put_conv(out, f"{f}.mlp_dw", "weight",
                          sd[f"{t}.mlp.dwconv.depthwise_conv.0.weight"])
                _put_conv(out, f"{f}.mlp_dw", "bias",
                          sd[f"{t}.mlp.dwconv.depthwise_conv.0.bias"])
            else:  # plain Swin block
                _put_linear(out, f"{f}.qkv", "weight", sd[f"{t}.attn.qkv.weight"])
                _put_linear(out, f"{f}.qkv", "bias", sd[f"{t}.attn.qkv.bias"])
                _put_linear(out, f"{f}.proj", "weight", sd[f"{t}.attn.proj.weight"])
                _put_linear(out, f"{f}.proj", "bias", sd[f"{t}.attn.proj.bias"])
            bi += 1
    if module.upsampler == "pixelshuffledirect":
        _put_conv(out, "upsample", "weight", sd["upsample.0.weight"])
        _put_conv(out, "upsample", "bias", sd["upsample.0.bias"])
    else:
        _put_conv(out, "conv_before_upsample", "weight",
                  sd["conv_before_upsample.0.weight"])
        _put_conv(out, "conv_before_upsample", "bias",
                  sd["conv_before_upsample.0.bias"])
        up_ids = sorted({
            int(m.group(1)) for k in sd
            if (m := re.fullmatch(r"upsample\.(\d+)\.weight", k))
        })
        for pos, idx in enumerate(up_ids):
            _put_conv(out, f"upsample_{pos}", "weight", sd[f"upsample.{idx}.weight"])
            _put_conv(out, f"upsample_{pos}", "bias", sd[f"upsample.{idx}.bias"])
        _put_conv(out, "conv_last", "weight", sd["conv_last.weight"])
        _put_conv(out, "conv_last", "bias", sd["conv_last.bias"])
    return out


# ---------------------------------------------------------------------------
# DWT (reference dwt_arch.py:937-1324; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("DWT")
def _convert_dwt(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "conv_first", "weight", sd["conv_first.weight"])
    _put_conv(out, "conv_first", "bias", sd["conv_first.bias"])
    _put_ln(out, "patch_norm", "weight", sd["patch_embed.norm.weight"])
    _put_ln(out, "patch_norm", "bias", sd["patch_embed.norm.bias"])
    _put_ln(out, "norm", "weight", sd["norm.weight"])
    _put_ln(out, "norm", "bias", sd["norm.bias"])
    _put_conv(out, "conv_after_body", "weight", sd["conv_after_body.weight"])
    _put_conv(out, "conv_after_body", "bias", sd["conv_after_body.bias"])
    for li in range(len(module.depths)):
        _put_conv(out, f"layers_{li}_conv", "weight", sd[f"layers.{li}.conv.weight"])
        _put_conv(out, f"layers_{li}_conv", "bias", sd[f"layers.{li}.conv.bias"])
        bi = 0
        while f"layers.{li}.residual_group.blocks.{bi}.norm1.weight" in sd:
            t = f"layers.{li}.residual_group.blocks.{bi}"
            f = f"layers_{li}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            _put_linear(out, f"{f}.attn.qkv", "weight", sd[f"{t}.attn.qkv.weight"])
            _put_linear(out, f"{f}.attn.qkv", "bias", sd[f"{t}.attn.qkv.bias"])
            _put_linear(out, f"{f}.attn.proj", "weight", sd[f"{t}.attn.proj.weight"])
            _put_linear(out, f"{f}.attn.proj", "bias", sd[f"{t}.attn.proj.bias"])
            out[f"{f}.attn.relative_position_bias_table"] = sd[
                f"{t}.attn.relative_position_bias_table"
            ]
            _put_linear(out, f"{f}.mlp_fc1", "weight", sd[f"{t}.mlp.fc1.weight"])
            _put_linear(out, f"{f}.mlp_fc1", "bias", sd[f"{t}.mlp.fc1.bias"])
            _put_linear(out, f"{f}.mlp_fc2", "weight", sd[f"{t}.mlp.fc2.weight"])
            _put_linear(out, f"{f}.mlp_fc2", "bias", sd[f"{t}.mlp.fc2.bias"])
            bi += 1
    _put_conv(out, "conv_before_upsample", "weight",
              sd["conv_before_upsample.0.weight"])
    _put_conv(out, "conv_before_upsample", "bias",
              sd["conv_before_upsample.0.bias"])
    up_ids = sorted({
        int(m.group(1)) for k in sd
        if (m := re.fullmatch(r"upsample\.(\d+)\.weight", k))
    })
    for pos, idx in enumerate(up_ids):
        _put_conv(out, f"upsample_{pos}", "weight", sd[f"upsample.{idx}.weight"])
        _put_conv(out, f"upsample_{pos}", "bias", sd[f"upsample.{idx}.bias"])
    _put_conv(out, "conv_last", "weight", sd["conv_last.weight"])
    _put_conv(out, "conv_last", "bias", sd["conv_last.bias"])
    return out


# ---------------------------------------------------------------------------
# ParagonSR2 (reference paragonsr2_arch.py:1171-1423; golden-validated)
# ---------------------------------------------------------------------------


@register_converter("ParagonSR2")
def _convert_paragonsr2(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for n in ("conv_in", "conv_mid", "conv_out"):
        _put_conv(out, n, "weight", sd[f"{n}.weight"])
        _put_conv(out, n, "bias", sd[f"{n}.bias"])
    _put_conv(out, "up", "weight", sd["up.0.weight"])
    _put_conv(out, "up", "bias", sd["up.0.bias"])
    out["detail_gain_p"] = sd["detail_gain"].reshape(())
    # base magic kernels are fixed constants (never trained) — synthesized

    def rms(t, f):
        out[f"{f}.scale"] = sd[f"{t}.scale"].reshape(-1)
        out[f"{f}.bias"] = sd[f"{t}.bias"].reshape(-1)

    for g in range(module.num_groups):
        for i in range(module.num_blocks):
            t = f"body.{g}.blocks.{i}"
            f = f"body_{g}_b{i}"
            if module.variant == "realtime":
                for c in ("conv1", "dw", "conv2"):
                    _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
                    _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
                out[f"{f}.scale_gamma"] = sd[f"{t}.scale.gamma"].reshape(-1)
            elif module.variant == "stream":
                for c in ("dw1", "dw3", "fuse", "proj", "gate", "out"):
                    _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
                    _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
                out[f"{f}.scale_gamma"] = sd[f"{t}.scale.gamma"].reshape(-1)
            elif module.variant == "photo":
                rms(f"{t}.norm", f"{f}.norm")
                for c in ("conv1", "dw", "conv2"):
                    _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
                    _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
                out[f"{f}.scale_gamma"] = sd[f"{t}.scale.gamma"].reshape(-1)
                if f"{t}.attn.qkv.weight" in sd:
                    rms(f"{t}.attn_norm", f"{f}.attn_norm")
                    for lin in ("qkv", "proj"):
                        _put_linear(out, f"{f}.attn.{lin}", "weight",
                                    sd[f"{t}.attn.{lin}.weight"])
                        _put_linear(out, f"{f}.attn.{lin}", "bias",
                                    sd[f"{t}.attn.{lin}.bias"])
            else:  # pro
                rms(f"{t}.norm1", f"{f}.norm1")
                for c in ("conv1", "dw", "conv2"):
                    _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
                    _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
                for k in (1, 2, 3, 4):
                    key = f"{t}.scale{k}.gamma"
                    if key in sd:
                        out[f"{f}.scale{k}_gamma"] = sd[key].reshape(-1)
                _put_linear(out, f"{f}.ca_fc1", "weight",
                            sd[f"{t}.channel_attn.fc.0.weight"])
                _put_linear(out, f"{f}.ca_fc2", "weight",
                            sd[f"{t}.channel_attn.fc.2.weight"])
                if f"{t}.window_attn.qkv.weight" in sd:
                    rms(f"{t}.norm3", f"{f}.norm3")
                    for lin in ("qkv", "proj"):
                        _put_linear(out, f"{f}.window_attn.{lin}", "weight",
                                    sd[f"{t}.window_attn.{lin}.weight"])
                        _put_linear(out, f"{f}.window_attn.{lin}", "bias",
                                    sd[f"{t}.window_attn.{lin}.bias"])
                rms(f"{t}.norm4", f"{f}.norm4")
                tc, fc = f"{t}.token_ca", f"{f}.token_ca"
                out[f"{fc}.token_dict"] = sd[f"{tc}.token_dict"][0]
                for lin in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    _put_linear(out, f"{fc}.{lin}", "weight", sd[f"{tc}.{lin}.weight"])
                    _put_linear(out, f"{fc}.{lin}", "bias", sd[f"{tc}.{lin}.bias"])
    return out


# ===========================================================================
# Spandrel-ecosystem families (round-2, VERDICT #4)
#
# The reference loads these checkpoints through the external `spandrel`
# package (reference archs/__init__.py:36-56). The torch-side key layouts
# below follow the upstream repos spandrel wraps (each converter cites its
# origin). Cross-framework goldens are oracle-blocked until a checkpoint or
# the spandrel package is on disk; each pair is validated structurally
# (export -> convert round-trips the full flax tree, see
# tests/test_utils/test_spandrel_converters.py) and shape-complete against
# the flax arch.
# ===========================================================================


@register_converter("SAFMN")
def _convert_safmn(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """SAFMN (sunny2109/SAFMN safmn_arch.py; spandrel SAFMN)."""
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "to_feat", "weight", sd["to_feat.weight"])
    _put_conv(out, "to_feat", "bias", sd["to_feat.bias"])
    n_blocks = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"feats\.(\d+)\.", k))
    )
    for i in range(n_blocks):
        t, f = f"feats.{i}", f"feats_{i}"
        for n in ("norm1", "norm2"):
            _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
            _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
        n_levels = sum(1 for k in sd if k.startswith(f"{t}.safm.mfr.") and k.endswith(".weight"))
        for j in range(n_levels):
            _put_conv(out, f"{f}.safm.mfr_{j}", "weight", sd[f"{t}.safm.mfr.{j}.weight"])
            _put_conv(out, f"{f}.safm.mfr_{j}", "bias", sd[f"{t}.safm.mfr.{j}.bias"])
        _put_conv(out, f"{f}.safm.aggr", "weight", sd[f"{t}.safm.aggr.weight"])
        _put_conv(out, f"{f}.safm.aggr", "bias", sd[f"{t}.safm.aggr.bias"])
        _put_conv(out, f"{f}.ccm.conv0", "weight", sd[f"{t}.ccm.ccm.0.weight"])
        _put_conv(out, f"{f}.ccm.conv0", "bias", sd[f"{t}.ccm.ccm.0.bias"])
        _put_conv(out, f"{f}.ccm.conv1", "weight", sd[f"{t}.ccm.ccm.2.weight"])
        _put_conv(out, f"{f}.ccm.conv1", "bias", sd[f"{t}.ccm.ccm.2.bias"])
    _put_conv(out, "to_img", "weight", sd["to_img.0.weight"])
    _put_conv(out, "to_img", "bias", sd["to_img.0.bias"])
    return out


@register_exporter("SAFMN")
def _export_safmn(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if k == "to_feat.conv.kernel":
            out["to_feat.weight"] = conv_w_inv(v)
        elif k == "to_feat.conv.bias":
            out["to_feat.bias"] = v
        elif k == "to_img.conv.kernel":
            out["to_img.0.weight"] = conv_w_inv(v)
        elif k == "to_img.conv.bias":
            out["to_img.0.bias"] = v
        elif m := re.fullmatch(r"feats_(\d+)\.(norm[12])\.(scale|bias)", k):
            i, n, kind = m.groups()
            out[f"feats.{i}.{n}.{'weight' if kind == 'scale' else 'bias'}"] = v
        elif m := re.fullmatch(r"feats_(\d+)\.safm\.mfr_(\d+)\.conv\.(kernel|bias)", k):
            i, j, kind = m.groups()
            out[f"feats.{i}.safm.mfr.{j}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
        elif m := re.fullmatch(r"feats_(\d+)\.safm\.aggr\.conv\.(kernel|bias)", k):
            i, kind = m.groups()
            out[f"feats.{i}.safm.aggr.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
        elif m := re.fullmatch(r"feats_(\d+)\.ccm\.conv([01])\.conv\.(kernel|bias)", k):
            i, c, kind = m.groups()
            tc = "0" if c == "0" else "2"
            out[f"feats.{i}.ccm.ccm.{tc}.{'weight' if kind == 'kernel' else 'bias'}"] = (
                conv_w_inv(v) if kind == "kernel" else v
            )
        else:
            raise KeyError(f"unmapped SAFMN param {k}")
    return out


@register_converter("PLKSR")
def _convert_plksr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """PLKSR v1 (dslisleedh/PLKSR plksr.py; spandrel PLKSR): one
    `feats` Sequential = [head conv, n_blocks PLKBlocks, tail conv];
    block submodules channel_mixer(DCCM Sequential 0/2), lk.conv,
    attn.f.0 (EA), refine."""
    out: dict[str, np.ndarray] = {}
    idxs = sorted(
        {int(m.group(1)) for k in sd if (m := re.match(r"feats\.(\d+)\.", k))}
    )
    last = idxs[-1]
    for kind in ("weight", "bias"):
        _put_conv(out, "head", kind, sd[f"feats.0.{kind}"])
        _put_conv(out, "tail", kind, sd[f"feats.{last}.{kind}"])
    for i in range(1, last):
        t, f = f"feats.{i}", f"blocks_{i - 1}"
        for kind in ("weight", "bias"):
            _put_conv(out, f"{f}.channel_mixer.conv0", kind, sd[f"{t}.channel_mixer.0.{kind}"])
            _put_conv(out, f"{f}.channel_mixer.conv1", kind, sd[f"{t}.channel_mixer.2.{kind}"])
            _put_conv(out, f"{f}.lk_conv", kind, sd[f"{t}.lk.conv.{kind}"])
            _put_conv(out, f"{f}.refine", kind, sd[f"{t}.refine.{kind}"])
            if f"{t}.attn.f.0.{kind}" in sd:
                _put_conv(out, f"{f}.ea_conv", kind, sd[f"{t}.attn.f.0.{kind}"])
    return out


@register_exporter("PLKSR")
def _export_plksr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    n_blocks = 1 + max(
        int(m.group(1)) for k in flat if (m := re.match(r"blocks_(\d+)\.", k))
    )
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        w = "weight" if k.endswith("kernel") else "bias"
        val = conv_w_inv(v) if k.endswith("kernel") else v
        if k.startswith("head.conv."):
            out[f"feats.0.{w}"] = val
        elif k.startswith("tail.conv."):
            out[f"feats.{n_blocks + 1}.{w}"] = val
        elif m := re.fullmatch(r"blocks_(\d+)\.(\w+)(?:\.(\w+))?\.conv\.(kernel|bias)", k):
            i = int(m.group(1)) + 1
            sub, sub2 = m.group(2), m.group(3)
            if sub == "channel_mixer":
                t = "0" if sub2 == "conv0" else "2"
                out[f"feats.{i}.channel_mixer.{t}.{w}"] = val
            elif sub == "lk_conv":
                out[f"feats.{i}.lk.conv.{w}"] = val
            elif sub == "ea_conv":
                out[f"feats.{i}.attn.f.0.{w}"] = val
            elif sub == "refine":
                out[f"feats.{i}.refine.{w}"] = val
            else:
                raise KeyError(f"unmapped PLKSR param {k}")
        else:
            raise KeyError(f"unmapped PLKSR param {k}")
    return out


def _deconv2x2_to_1x1(out: dict, fpre: str, w: np.ndarray, b: np.ndarray | None) -> None:
    """torch ConvTranspose2d(k=2, s=2) == 1x1 conv + pixel_shuffle(2):
    W (I,O,2,2) -> kernel (1,1,I,O*4) with torch PixelShuffle channel order
    q = o*4 + i*2 + j; bias tiles per output channel."""
    i_ch, o_ch = w.shape[0], w.shape[1]
    out[f"{fpre}.conv.kernel"] = np.ascontiguousarray(w.reshape(i_ch, o_ch * 4)[None, None])
    if b is not None:
        out[f"{fpre}.conv.bias"] = np.repeat(b, 4)


def _deconv2x2_from_1x1(kernel: np.ndarray, bias: np.ndarray | None):
    """Inverse of _deconv2x2_to_1x1."""
    _, _, i_ch, oc4 = kernel.shape
    w = np.ascontiguousarray(kernel.reshape(i_ch, oc4 // 4, 2, 2))
    b = None if bias is None else np.ascontiguousarray(bias[::4])
    return w, b


@register_converter("UpCunet")
def _convert_realcugan(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """Real-CUGAN UpCunet2x/3x/4x (bilibili ailab upcunet_v3.py; spandrel
    RealCUGAN). UNetConv Sequential 0/2 -> conv0/conv1; 2x2 stride-2
    deconvs -> 1x1 conv + pixel shuffle; conv_bottom deconv -> dilated-conv
    gradient view (TorchDeconv)."""
    out: dict[str, np.ndarray] = {}

    def unet_conv(t: str, f: str) -> None:
        _put_conv(out, f"{f}.conv0", "weight", sd[f"{t}.conv.0.weight"])
        _put_conv(out, f"{f}.conv0", "bias", sd[f"{t}.conv.0.bias"])
        _put_conv(out, f"{f}.conv1", "weight", sd[f"{t}.conv.2.weight"])
        _put_conv(out, f"{f}.conv1", "bias", sd[f"{t}.conv.2.bias"])
        if f"{t}.seblock.conv1.weight" in sd:
            for c in ("conv1", "conv2"):
                _put_conv(out, f"{f}.seblock.{c}", "weight", sd[f"{t}.seblock.{c}.weight"])
                _put_conv(out, f"{f}.seblock.{c}", "bias", sd[f"{t}.seblock.{c}.bias"])

    for u in ("unet1", "unet2"):
        unet_conv(f"{u}.conv1", f"{u}.conv1")
        _put_conv(out, f"{u}.conv1_down", "weight", sd[f"{u}.conv1_down.weight"])
        _put_conv(out, f"{u}.conv1_down", "bias", sd[f"{u}.conv1_down.bias"])
        unet_conv(f"{u}.conv2", f"{u}.conv2")

    # UNet1: conv2_up deconv, conv3 plain, conv_bottom big deconv
    _deconv2x2_to_1x1(out, "unet1.conv2_up", sd["unet1.conv2_up.weight"],
                      sd.get("unet1.conv2_up.bias"))
    _put_conv(out, "unet1.conv3", "weight", sd["unet1.conv3.weight"])
    _put_conv(out, "unet1.conv3", "bias", sd["unet1.conv3.bias"])
    out["unet1.conv_bottom.conv.kernel"] = convT_w(sd["unet1.conv_bottom.weight"])
    out["unet1.conv_bottom.conv.bias"] = sd["unet1.conv_bottom.bias"]

    # UNet2: conv2_down, conv3/conv4 UNetConvs, conv3_up/conv4_up deconvs,
    # conv5 + conv_bottom plain convs
    _put_conv(out, "unet2.conv2_down", "weight", sd["unet2.conv2_down.weight"])
    _put_conv(out, "unet2.conv2_down", "bias", sd["unet2.conv2_down.bias"])
    unet_conv("unet2.conv3", "unet2.conv3")
    _deconv2x2_to_1x1(out, "unet2.conv3_up", sd["unet2.conv3_up.weight"],
                      sd.get("unet2.conv3_up.bias"))
    unet_conv("unet2.conv4", "unet2.conv4")
    _deconv2x2_to_1x1(out, "unet2.conv4_up", sd["unet2.conv4_up.weight"],
                      sd.get("unet2.conv4_up.bias"))
    for c in ("conv5", "conv_bottom"):
        _put_conv(out, f"unet2.{c}", "weight", sd[f"unet2.{c}.weight"])
        _put_conv(out, f"unet2.{c}", "bias", sd[f"unet2.{c}.bias"])

    if "conv_final.weight" in sd:  # 4x tail
        _put_conv(out, "conv_final", "weight", sd["conv_final.weight"])
        _put_conv(out, "conv_final", "bias", sd["conv_final.bias"])
    return out


def convT_w_inv(w: np.ndarray) -> np.ndarray:
    """Inverse of convT_w: flipped HWIO -> torch ConvTranspose2d (I,O,kh,kw)."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])


# linear_w is a plain transpose, i.e. its own inverse
linear_w_inv = linear_w


@register_exporter("UpCunet")
def _export_realcugan(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    deconv1x1 = {"unet1.conv2_up", "unet2.conv3_up", "unet2.conv4_up"}
    pending: dict[str, dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        m = re.fullmatch(r"(.+)\.conv\.(kernel|bias)", k)
        if not m:
            raise KeyError(f"unmapped UpCunet param {k}")
        path, kind = m.groups()
        if path in deconv1x1:
            pending.setdefault(path, {})[kind] = v
            continue
        if path == "unet1.conv_bottom":
            if kind == "kernel":
                out["unet1.conv_bottom.weight"] = convT_w_inv(v)
            else:
                out["unet1.conv_bottom.bias"] = v
            continue
        # UNetConv inner convs: <unet>.<block>.conv0/1 -> .conv.0/.conv.2
        m2 = re.fullmatch(r"(unet[12]\.conv\d)\.conv([01])", path)
        if m2:
            t = f"{m2.group(1)}.conv.{'0' if m2.group(2) == '0' else '2'}"
        elif re.fullmatch(r"unet[12]\.conv\d\.seblock\.conv[12]", path):
            t = path
        else:
            t = path  # conv1_down, conv2_down, conv3(unet1), conv5, conv_bottom(unet2), conv_final
        if kind == "kernel":
            out[f"{t}.weight"] = conv_w_inv(v)
        else:
            out[f"{t}.bias"] = v
    for path, kv in pending.items():
        w, b = _deconv2x2_from_1x1(kv["kernel"], kv.get("bias"))
        out[f"{path}.weight"] = w
        if b is not None:
            out[f"{path}.bias"] = b
    return out


@register_converter("SRFormer")
def _convert_srformer(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """SRFormer v1 (HVision-NKU/SRFormer srformer_arch.py; spandrel
    SRFormer): SwinIR skeleton with PSA attention (q / halved kv /
    aligned relative-position table)."""
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.endswith(("relative_position_index", "aligned_relative_position_index",
                       "attn_mask")) or k.startswith(("absolute_pos_embed", "mean")):
            continue
        m = re.fullmatch(
            r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)", k
        )
        if m:
            i, j, rest = m.groups()
            prefix = f"layers_{i}_blocks_{j}"
            if rest == "attn.relative_position_bias_table":
                out[f"{prefix}.attn.relative_position_bias_table"] = v
                continue
            m2 = re.fullmatch(r"(norm1|norm2)\.(weight|bias)", rest)
            if m2:
                out[f"{prefix}.{m2.group(1)}.{_norm_key(m2.group(2))}"] = v
                continue
            m2 = re.fullmatch(r"attn\.(q|kv|proj)\.(weight|bias)", rest)
            if m2:
                _put_linear(out, f"{prefix}.attn.{m2.group(1)}", m2.group(2), v)
                continue
            m2 = re.fullmatch(r"mlp\.fc([12])\.(weight|bias)", rest)
            if m2:
                _put_linear(out, f"{prefix}.fc{m2.group(1)}", m2.group(2), v)
                continue
            raise KeyError(f"unmapped SRFormer block param {k}")
        m = re.fullmatch(r"layers\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            _put_conv(out, f"layers_{m.group(1)}_conv", m.group(2), v)
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            out[f"patch_norm.{_norm_key(m.group(1))}"] = v
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            out[f"norm.{_norm_key(m.group(1))}"] = v
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_before_upsample", m.group(1), v)
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            si = int(m.group(1)) // 2
            name = (
                "up_direct"
                if getattr(module, "upsampler", "") == "pixelshuffledirect"
                else f"upsample_{si}"
            )
            _put_conv(out, name, m.group(2), v)
            continue
        m = re.fullmatch(r"(conv_first|conv_after_body|conv_last)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        raise KeyError(f"unmapped SRFormer param {k}")
    return out


@register_exporter("SRFormer")
def _export_srformer(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if m := re.fullmatch(r"layers_(\d+)_blocks_(\d+)\.(.+)", k):
            i, j, rest = m.groups()
            t = f"layers.{i}.residual_group.blocks.{j}"
            if rest == "attn.relative_position_bias_table":
                out[f"{t}.attn.relative_position_bias_table"] = v
            elif m2 := re.fullmatch(r"(norm1|norm2)\.(scale|bias)", rest):
                w = "weight" if m2.group(2) == "scale" else "bias"
                out[f"{t}.{m2.group(1)}.{w}"] = v
            elif m2 := re.fullmatch(r"attn\.(q|kv|proj)\.(kernel|bias)", rest):
                w = "weight" if m2.group(2) == "kernel" else "bias"
                out[f"{t}.attn.{m2.group(1)}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif m2 := re.fullmatch(r"fc([12])\.(kernel|bias)", rest):
                w = "weight" if m2.group(2) == "kernel" else "bias"
                out[f"{t}.mlp.fc{m2.group(1)}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            else:
                raise KeyError(f"unmapped SRFormer flax param {k}")
        elif m := re.fullmatch(r"layers_(\d+)_conv\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"layers.{m.group(1)}.conv.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"patch_norm\.(scale|bias)", k):
            out[f"patch_embed.norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
        elif m := re.fullmatch(r"norm\.(scale|bias)", k):
            out[f"norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
        elif m := re.fullmatch(r"conv_before_upsample\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(1) == "kernel" else "bias"
            out[f"conv_before_upsample.0.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"upsample.{2 * int(m.group(1))}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"up_direct\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(1) == "kernel" else "bias"
            out[f"upsample.0.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"(conv_first|conv_after_body|conv_last)\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"{m.group(1)}.{w}"] = conv_w_inv(v) if w == "weight" else v
        else:
            raise KeyError(f"unmapped SRFormer flax param {k}")
    return out


@register_converter("MoSR")
def _convert_mosr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """MoSR v1 (umzi2/MoSR mosr_arch.py; spandrel MoSR): one `gblocks`
    Sequential = [head conv, n_block GatedCNNBlocks]; blocks carry
    norm/fc1/conv/fc2; tail under `upsampler`."""
    out: dict[str, np.ndarray] = {}
    _put_conv(out, "head", "weight", sd["gblocks.0.weight"])
    _put_conv(out, "head", "bias", sd["gblocks.0.bias"])
    blocks = sorted({
        int(m.group(1)) for k in sd if (m := re.match(r"gblocks\.(\d+)\.norm\.", k))
    })
    for j, idx in enumerate(blocks):
        t, f = f"gblocks.{idx}", f"blocks_{j}"
        out[f"{f}.norm.scale"] = sd[f"{t}.norm.weight"]
        out[f"{f}.norm.bias"] = sd[f"{t}.norm.bias"]
        for c in ("fc1", "conv", "fc2"):
            _put_conv(out, f"{f}.{c}", "weight", sd[f"{t}.{c}.weight"])
            if f"{t}.{c}.bias" in sd:
                _put_conv(out, f"{f}.{c}", "bias", sd[f"{t}.{c}.bias"])
    if "upsampler.0.weight" in sd:  # "ps" / "gps" conv + PixelShuffle
        _put_conv(out, "tail", "weight", sd["upsampler.0.weight"])
        _put_conv(out, "tail", "bias", sd["upsampler.0.bias"])
    elif "upsampler.offset.weight" in sd:  # DySample
        _put_conv(out, "dysample.offset", "weight", sd["upsampler.offset.weight"])
        _put_conv(out, "dysample.offset", "bias", sd["upsampler.offset.bias"])
        if "upsampler.scope.weight" in sd:
            _put_conv(out, "dysample.scope", "weight", sd["upsampler.scope.weight"])
        if "upsampler.end_conv.weight" in sd:
            _put_conv(out, "dysample.end_conv", "weight", sd["upsampler.end_conv.weight"])
            _put_conv(out, "dysample.end_conv", "bias", sd["upsampler.end_conv.bias"])
    else:
        raise KeyError("MoSR: unrecognized upsampler keys")
    return out


@register_exporter("MoSR")
def _export_mosr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        w = "weight" if k.endswith((".kernel",)) else "bias"
        val = conv_w_inv(v) if k.endswith(".kernel") else v
        if k.startswith("head.conv."):
            out[f"gblocks.0.{w}"] = val
        elif m := re.fullmatch(r"blocks_(\d+)\.norm\.(scale|bias)", k):
            t = "weight" if m.group(2) == "scale" else "bias"
            out[f"gblocks.{int(m.group(1)) + 1}.norm.{t}"] = v
        elif m := re.fullmatch(r"blocks_(\d+)\.(fc1|conv|fc2)\.conv\.(kernel|bias)", k):
            out[f"gblocks.{int(m.group(1)) + 1}.{m.group(2)}.{w}"] = val
        elif k.startswith("tail.conv."):
            out[f"upsampler.0.{w}"] = val
        elif m := re.fullmatch(r"dysample\.(offset|scope|end_conv)\.conv\.(kernel|bias)", k):
            out[f"upsampler.{m.group(1)}.{w}"] = val
        else:
            raise KeyError(f"unmapped MoSR flax param {k}")
    return out


@register_converter("ATD")
def _convert_atd(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    """ATD / ATD-light (LabShuHangGU/Adaptive-Token-Dictionary atd_arch.py;
    spandrel ATD). Variant-detecting map:
      - layer container: layers.{g}.residual_group.layers.{j} or
        layers.{g}.layers.{j};
      - shared `wqkv` Linear (upstream computes one QKV consumed by both the
        window attention and the adaptive-category MSA) duplicates into the
        flax attn_win.qkv / attn_aca.qkv, which see the same norm1 input —
        numerically identical;
      - group token dictionary accepted as `td` or `token_dict`.
    Unknown structure fails loudly rather than misloading."""
    out: dict[str, np.ndarray] = {}
    handled: set[str] = set()

    def put_lin(fpre: str, t: str) -> None:
        _put_linear(out, fpre, "weight", sd[f"{t}.weight"])
        handled.add(f"{t}.weight")
        if f"{t}.bias" in sd:
            _put_linear(out, fpre, "bias", sd[f"{t}.bias"])
            handled.add(f"{t}.bias")

    groups = sorted({
        int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))
    })
    for g in groups:
        gt, gf = f"layers.{g}", f"groups_{g}"
        inner = (
            f"{gt}.residual_group.layers"
            if any(k.startswith(f"{gt}.residual_group.layers.") for k in sd)
            else f"{gt}.layers"
        )
        # token dictionary
        for td_name in ("td", "token_dict"):
            cand = [f"{gt}.{td_name}", f"{gt}.residual_group.{td_name}"]
            for c in cand:
                if c in sd:
                    out[f"{gf}.token_dict"] = sd[c]
                    handled.add(c)
        # group conv (1conv)
        for kind in ("weight", "bias"):
            for c in (f"{gt}.conv.{kind}", f"{gt}.residual_group.conv.{kind}"):
                if c in sd:
                    _put_conv(out, f"{gf}.conv", kind, sd[c])
                    handled.add(c)
        js = sorted({
            int(m.group(1)) for k in sd
            if (m := re.match(rf"{re.escape(inner)}\.(\d+)\.", k))
        })
        for j in js:
            t, f = f"{inner}.{j}", f"{gf}.layers_{j}"
            for n in ("norm1", "norm2", "norm3"):
                if f"{t}.{n}.weight" in sd:
                    if n == "norm3":
                        raise NotImplementedError(
                            "ATD checkpoint carries norm3 (separate norm for the "
                            "dictionary-attention path); the flax ATDLayer "
                            "normalizes all three branches with norm1 — extend "
                            "atd_arch.ATDLayer before converting this checkpoint"
                        )
                    out[f"{f}.{n}.scale"] = sd[f"{t}.{n}.weight"]
                    out[f"{f}.{n}.bias"] = sd[f"{t}.{n}.bias"]
                    handled.update({f"{t}.{n}.weight", f"{t}.{n}.bias"})
            if f"{t}.wqkv.weight" in sd:  # shared QKV -> duplicate
                for tgt in ("attn_win.qkv", "attn_aca.qkv"):
                    _put_linear(out, f"{f}.{tgt}", "weight", sd[f"{t}.wqkv.weight"])
                    if f"{t}.wqkv.bias" in sd:
                        _put_linear(out, f"{f}.{tgt}", "bias", sd[f"{t}.wqkv.bias"])
                handled.update({f"{t}.wqkv.weight", f"{t}.wqkv.bias"} & set(sd))
            else:
                put_lin(f"{f}.attn_win.qkv", f"{t}.attn_win.qkv")
                put_lin(f"{f}.attn_aca.qkv", f"{t}.attn_aca.qkv")
            out[f"{f}.attn_win.relative_position_bias_table"] = sd[
                f"{t}.attn_win.relative_position_bias_table"
            ]
            handled.add(f"{t}.attn_win.relative_position_bias_table")
            put_lin(f"{f}.attn_win.proj", f"{t}.attn_win.proj")
            for lin in ("wq", "wk", "wv"):
                put_lin(f"{f}.attn_atd.{lin}", f"{t}.attn_atd.{lin}")
            out[f"{f}.attn_atd.scale"] = sd[f"{t}.attn_atd.scale"].reshape(-1)[:1]
            handled.add(f"{t}.attn_atd.scale")
            put_lin(f"{f}.attn_aca.proj", f"{t}.attn_aca.proj")
            put_lin(f"{f}.convffn.fc1", f"{t}.convffn.fc1")
            put_lin(f"{f}.convffn.fc2", f"{t}.convffn.fc2")
            _put_conv(out, f"{f}.convffn.dwconv", "weight",
                      sd[f"{t}.convffn.dwconv.depthwise_conv.0.weight"]
                      if f"{t}.convffn.dwconv.depthwise_conv.0.weight" in sd
                      else sd[f"{t}.convffn.dwconv.weight"])
            bkey = (f"{t}.convffn.dwconv.depthwise_conv.0.bias"
                    if f"{t}.convffn.dwconv.depthwise_conv.0.bias" in sd
                    else f"{t}.convffn.dwconv.bias")
            if bkey in sd:
                _put_conv(out, f"{f}.convffn.dwconv", "bias", sd[bkey])
            out[f"{f}.sigma"] = sd[f"{t}.sigma"].reshape(-1, 1)
            handled.add(f"{t}.sigma")
    # shell
    for k, v in sd.items():
        if k in handled or k.startswith("layers."):
            continue
        if k.endswith(("relative_position_index", "attn_mask")) or k.startswith(
            ("mean", "absolute_pos_embed")
        ):
            continue
        m = re.fullmatch(r"(conv_first|conv_after_body|conv_last)\.(weight|bias)", k)
        if m:
            _put_conv(out, m.group(1), m.group(2), v)
            continue
        m = re.fullmatch(r"norm\.(weight|bias)", k)
        if m:
            out[f"norm.{_norm_key(m.group(1))}"] = v
            continue
        m = re.fullmatch(r"patch_embed\.norm\.(weight|bias)", k)
        if m:
            out[f"patch_norm.{_norm_key(m.group(1))}"] = v
            continue
        m = re.fullmatch(r"conv_before_upsample\.0\.(weight|bias)", k)
        if m:
            _put_conv(out, "conv_before_upsample", m.group(1), v)
            continue
        m = re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k)
        if m:
            si = int(m.group(1)) // 2
            name = (
                "up_direct"
                if getattr(module, "upsampler", "") == "pixelshuffledirect"
                else f"upsample_{si}"
            )
            _put_conv(out, name, m.group(2), v)
            continue
        raise KeyError(f"unmapped ATD param {k}")
    return out


@register_exporter("ATD")
def _export_atd(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Inverse of _convert_atd, emitting the shared-wqkv upstream layout.
    attn_win.qkv and attn_aca.qkv must be EQUAL (as they are after a
    convert) to export a valid shared wqkv; raises otherwise."""
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if m := re.fullmatch(r"groups_(\d+)\.token_dict", k):
            out[f"layers.{m.group(1)}.td"] = v
        elif m := re.fullmatch(r"groups_(\d+)\.conv\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"layers.{m.group(1)}.conv.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"groups_(\d+)\.layers_(\d+)\.(.+)", k):
            g, j, rest = m.groups()
            t = f"layers.{g}.layers.{j}"
            if m2 := re.fullmatch(r"(norm[12])\.(scale|bias)", rest):
                w = "weight" if m2.group(2) == "scale" else "bias"
                out[f"{t}.{m2.group(1)}.{w}"] = v
            elif rest == "attn_win.relative_position_bias_table":
                out[f"{t}.attn_win.relative_position_bias_table"] = v
            elif m2 := re.fullmatch(r"attn_(win|aca)\.qkv\.(kernel|bias)", rest):
                which, kind = m2.groups()
                w = "weight" if kind == "kernel" else "bias"
                tk = f"{t}.wqkv.{w}"
                tv = linear_w(v) if w == "weight" else v
                if tk in out:
                    if not np.array_equal(out[tk], tv):
                        raise ValueError(
                            f"{t}: attn_win.qkv != attn_aca.qkv; cannot export a "
                            "shared wqkv (train kept them tied only if converted)"
                        )
                else:
                    out[tk] = tv
            elif m2 := re.fullmatch(r"attn_(win|aca)\.proj\.(kernel|bias)", rest):
                which, kind = m2.groups()
                w = "weight" if kind == "kernel" else "bias"
                out[f"{t}.attn_{which}.proj.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif m2 := re.fullmatch(r"attn_atd\.(wq|wk|wv)\.(kernel|bias)", rest):
                w = "weight" if m2.group(2) == "kernel" else "bias"
                out[f"{t}.attn_atd.{m2.group(1)}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif rest == "attn_atd.scale":
                out[f"{t}.attn_atd.scale"] = v
            elif m2 := re.fullmatch(r"convffn\.(fc[12])\.(kernel|bias)", rest):
                w = "weight" if m2.group(2) == "kernel" else "bias"
                out[f"{t}.convffn.{m2.group(1)}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif m2 := re.fullmatch(r"convffn\.dwconv\.conv\.(kernel|bias)", rest):
                w = "weight" if m2.group(1) == "kernel" else "bias"
                out[f"{t}.convffn.dwconv.{w}"] = conv_w_inv(v) if w == "weight" else v
            elif rest == "sigma":
                out[f"{t}.sigma"] = v
            else:
                raise KeyError(f"unmapped ATD flax param {k}")
        elif m := re.fullmatch(r"(conv_first|conv_after_body|conv_last)\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"{m.group(1)}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"norm\.(scale|bias)", k):
            out[f"norm.{'weight' if m.group(1) == 'scale' else 'bias'}"] = v
        elif m := re.fullmatch(r"conv_before_upsample\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(1) == "kernel" else "bias"
            out[f"conv_before_upsample.0.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(2) == "kernel" else "bias"
            out[f"upsample.{2 * int(m.group(1))}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"up_direct\.conv\.(kernel|bias)", k):
            w = "weight" if m.group(1) == "kernel" else "bias"
            out[f"upsample.0.{w}"] = conv_w_inv(v) if w == "weight" else v
        else:
            raise KeyError(f"unmapped ATD flax param {k}")
    return out


# ---------------------------------------------------------------------------
# OmniSR (Francis0625/Omni-SR components/{OSA,OSAG,esa}.py; spandrel OmniSR).
# OSA_Block.layer Sequential indices: 0 MBConv(fn.{0,2,4.gate.{1,3},5}),
# 2/6 PreNormResidual(window/grid Attention), 4/8/10/12 Conv_PreNormResidual
# (Gated_Conv_FeedForward), 9/11 Conv_PreNormResidual(Channel_Attention[_grid]).
# Conv_PreNormResidual norms store g/b shaped (1,C,1,1).
# ---------------------------------------------------------------------------

# (torch layer idx, flax norm name, flax fn name, fn kind)
_OMNISR_LAYER_MAP = [
    ("2", "block_norm", "block_attn", "attn"),
    ("4", "ffn1_norm", "ffn1", "ffn"),
    ("6", "grid_norm", "grid_attn", "attn"),
    ("8", "ffn2_norm", "ffn2", "ffn"),
    ("9", "ca_norm", "channel_attn", "chan"),
    ("10", "ffn3_norm", "ffn3", "ffn"),
    ("11", "cag_norm", "channel_attn_grid", "chan"),
    ("12", "ffn4_norm", "ffn4", "ffn"),
]


@register_converter("OmniSR")
def _convert_omnisr(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for t, f in (("input", "input_conv"), ("output", "output_conv")):
        for kind in ("weight", "bias"):
            _put_conv(out, f, kind, sd[f"{t}.{kind}"])
    for kind in ("weight", "bias"):
        _put_conv(out, "up_conv", kind, sd[f"up.0.{kind}"])

    n_groups = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"residual_layer\.(\d+)\.", k))
    )
    for gi in range(n_groups):
        tg, fg = f"residual_layer.{gi}", f"residual_layer_{gi}"
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"residual_layer\.{gi}\.residual_layer\.(\d+)\.layer\.", k))
            }
        )
        for bj in block_ids:
            tb = f"{tg}.residual_layer.{bj}.layer"
            fb = f"{fg}.blocks_{bj}"
            # [0] MBConv with residual wrapper
            for tm, fm in (("0", "expand"), ("2", "dw"), ("5", "proj")):
                for kind in ("weight", "bias"):
                    _put_conv(out, f"{fb}.mbconv.{fm}", kind, sd[f"{tb}.0.fn.{tm}.{kind}"])
            _put_linear(out, f"{fb}.mbconv.se_fc1", "weight", sd[f"{tb}.0.fn.4.gate.1.weight"])
            _put_linear(out, f"{fb}.mbconv.se_fc2", "weight", sd[f"{tb}.0.fn.4.gate.3.weight"])
            for ti, fnorm, ffn, kind in _OMNISR_LAYER_MAP:
                if kind == "attn":
                    _put_ln(out, f"{fb}.{fnorm}", "weight", sd[f"{tb}.{ti}.norm.weight"])
                    _put_ln(out, f"{fb}.{fnorm}", "bias", sd[f"{tb}.{ti}.norm.bias"])
                    _put_linear(out, f"{fb}.{ffn}.to_qkv", "weight", sd[f"{tb}.{ti}.fn.to_qkv.weight"])
                    _put_linear(out, f"{fb}.{ffn}.to_out", "weight", sd[f"{tb}.{ti}.fn.to_out.0.weight"])
                    pe_key = f"{tb}.{ti}.fn.rel_pos_bias.weight"
                    if pe_key in sd:
                        out[f"{fb}.{ffn}.rel_pos_bias"] = sd[pe_key]
                    continue
                # Conv_PreNormResidual channel LN with g/b (1,C,1,1)
                out[f"{fb}.{fnorm}.g"] = sd[f"{tb}.{ti}.norm.g"].reshape(-1)
                out[f"{fb}.{fnorm}.b"] = sd[f"{tb}.{ti}.norm.b"].reshape(-1)
                if kind == "ffn":
                    for name in ("project_in", "dwconv", "project_out"):
                        _put_conv(out, f"{fb}.{ffn}.{name}", "weight", sd[f"{tb}.{ti}.fn.{name}.weight"])
                else:  # channel attention
                    out[f"{fb}.{ffn}.temperature"] = sd[f"{tb}.{ti}.fn.temperature"]
                    for name in ("qkv", "qkv_dwconv", "project_out"):
                        _put_conv(out, f"{fb}.{ffn}.{name}", "weight", sd[f"{tb}.{ti}.fn.{name}.weight"])
        # trailing 1x1 conv of the OSAG Sequential
        tail = max(block_ids) + 1 if block_ids else 0
        for kind in ("weight", "bias"):
            _put_conv(out, f"{fg}.conv", kind, sd[f"{tg}.residual_layer.{tail}.{kind}"])
        for name in ("conv1", "conv_f", "conv2", "conv3", "conv4"):
            for kind in ("weight", "bias"):
                _put_conv(out, f"{fg}.esa.{name}", kind, sd[f"{tg}.esa.{name}.{kind}"])
    return out


@register_exporter("OmniSR")
def _export_omnisr(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    ln_map = {fnorm: ti for ti, fnorm, _f, _k in _OMNISR_LAYER_MAP}
    fn_map = {ffn: (ti, kind) for ti, _n, ffn, kind in _OMNISR_LAYER_MAP}
    for k, v in flat.items():
        w = "weight" if k.endswith((".kernel",)) else "bias"
        if m := re.fullmatch(r"(input_conv|output_conv|up_conv)\.conv\.(kernel|bias)", k):
            t = {"input_conv": "input", "output_conv": "output", "up_conv": "up.0"}[m.group(1)]
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"residual_layer_(\d+)\.conv\.conv\.(kernel|bias)", k):
            gi = m.group(1)
            n_blocks = 1 + max(
                int(mm.group(1))
                for kk in flat
                if (mm := re.match(rf"residual_layer_{gi}\.blocks_(\d+)\.", kk))
            )
            out[f"residual_layer.{gi}.residual_layer.{n_blocks}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"residual_layer_(\d+)\.esa\.(conv\w+)\.conv\.(kernel|bias)", k):
            out[f"residual_layer.{m.group(1)}.esa.{m.group(2)}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"residual_layer_(\d+)\.blocks_(\d+)\.(\w+)\.(.+)", k):
            gi, bj, mod, rest = m.groups()
            tb = f"residual_layer.{gi}.residual_layer.{bj}.layer"
            if mod == "mbconv":
                conv_map = {"expand": "0", "dw": "2", "proj": "5"}
                if mm := re.fullmatch(r"(expand|dw|proj)\.conv\.(kernel|bias)", rest):
                    out[f"{tb}.0.fn.{conv_map[mm.group(1)]}.{w}"] = (
                        conv_w_inv(v) if w == "weight" else v
                    )
                elif mm := re.fullmatch(r"se_fc([12])\.kernel", rest):
                    gate = "1" if mm.group(1) == "1" else "3"
                    out[f"{tb}.0.fn.4.gate.{gate}.weight"] = linear_w(v)
                else:
                    raise KeyError(f"unmapped OmniSR flax param {k}")
            elif mod in ln_map:
                ti = ln_map[mod]
                if mod.endswith(("block_norm", "grid_norm")):
                    out[f"{tb}.{ti}.norm.{'weight' if k.endswith('scale') else 'bias'}"] = v
                else:
                    gb = "g" if rest == "g" else "b"
                    out[f"{tb}.{ti}.norm.{gb}"] = v.reshape(1, -1, 1, 1)
            elif mod in fn_map:
                ti, kind = fn_map[mod]
                if kind == "attn":
                    if rest == "rel_pos_bias":
                        out[f"{tb}.{ti}.fn.rel_pos_bias.weight"] = v
                    elif rest == "to_qkv.kernel":
                        out[f"{tb}.{ti}.fn.to_qkv.weight"] = linear_w(v)
                    elif rest == "to_out.kernel":
                        out[f"{tb}.{ti}.fn.to_out.0.weight"] = linear_w(v)
                    else:
                        raise KeyError(f"unmapped OmniSR flax param {k}")
                elif kind == "ffn":
                    mm = re.fullmatch(r"(project_in|dwconv|project_out)\.conv\.kernel", rest)
                    if not mm:
                        raise KeyError(f"unmapped OmniSR flax param {k}")
                    out[f"{tb}.{ti}.fn.{mm.group(1)}.weight"] = conv_w_inv(v)
                else:  # channel attention
                    if rest == "temperature":
                        out[f"{tb}.{ti}.fn.temperature"] = v
                    else:
                        mm = re.fullmatch(r"(qkv|qkv_dwconv|project_out)\.conv\.kernel", rest)
                        if not mm:
                            raise KeyError(f"unmapped OmniSR flax param {k}")
                        out[f"{tb}.{ti}.fn.{mm.group(1)}.weight"] = conv_w_inv(v)
            else:
                raise KeyError(f"unmapped OmniSR flax param {k}")
        else:
            raise KeyError(f"unmapped OmniSR flax param {k}")
    return out


# ---------------------------------------------------------------------------
# DITN (yongliuy/DITN DITN_Real.py; spandrel DITN). Module tree: sft conv,
# UFONE.{u}.ITLs.{i} (Restormer-style norm1/norm2 LayerNorm with .body,
# ISA attn with temperature + qkv/project_out, gated-dwconv FeedForward) and
# UFONE.{u}.SALs.{i} (SDA attn: dual dilated depthwise branches + gate/fuse),
# conv_after_body, upsample.0 + PixelShuffle. Attention projection weights
# are accepted in either Linear (out,in) or 1x1-Conv (out,in,1,1) form.
# ---------------------------------------------------------------------------


def _conv_or_lin(v: np.ndarray) -> np.ndarray:
    """Torch Linear (out,in) or convNxN (O,I,H,W) -> flax conv HWIO."""
    if v.ndim == 2:
        return np.ascontiguousarray(v.T[None, None])
    return conv_w(v)


def _put_restormer_block(out, sd, t, f, attn_names):
    """Shared ITL/SAL mapping: norm1/norm2 (.body LN), attn subkeys, ffn."""
    for n in ("norm1", "norm2"):
        _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.body.weight"])
        _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.body.bias"])
    for name in attn_names:
        if name == "temperature":
            out[f"{f}.attn.temperature"] = sd[f"{t}.attn.temperature"].reshape(1, 1, 1)
            continue
        out[f"{f}.attn.{name}.conv.kernel"] = _conv_or_lin(sd[f"{t}.attn.{name}.weight"])
        if f"{t}.attn.{name}.bias" in sd:
            out[f"{f}.attn.{name}.conv.bias"] = sd[f"{t}.attn.{name}.bias"]
    for name in ("project_in", "dwconv", "project_out"):
        out[f"{f}.ffn.{name}.conv.kernel"] = conv_w(sd[f"{t}.ffn.{name}.weight"])
        if f"{t}.ffn.{name}.bias" in sd:
            out[f"{f}.ffn.{name}.conv.bias"] = sd[f"{t}.ffn.{name}.bias"]


@register_converter("DITN")
def _convert_ditn(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for kind in ("weight", "bias"):
        _put_conv(out, "sft", kind, sd[f"sft.{kind}"])
        _put_conv(out, "conv_after_body", kind, sd[f"conv_after_body.{kind}"])
        _put_conv(out, "upsample", kind, sd[f"upsample.0.{kind}"])
    n_ufone = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"UFONE\.(\d+)\.", k))
    )
    for u in range(n_ufone):
        for seq, fmt in (("ITLs", "itl"), ("SALs", "sal")):
            ids = sorted(
                {
                    int(m.group(1))
                    for k in sd
                    if (m := re.match(rf"UFONE\.{u}\.{seq}\.(\d+)\.", k))
                }
            )
            attn_names = (
                ("temperature", "qkv", "project_out")
                if seq == "ITLs"
                else ("sade_d2", "sade_d3", "gate", "fuse")
            )
            for i in ids:
                _put_restormer_block(
                    out, sd, f"UFONE.{u}.{seq}.{i}", f"ufone_{u}_{fmt}{i}", attn_names
                )
    return out


@register_exporter("DITN")
def _export_ditn(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        w = "weight" if k.endswith(("kernel", "scale")) else "bias"
        if m := re.fullmatch(r"(sft|conv_after_body|upsample)\.conv\.(kernel|bias)", k):
            t = m.group(1) if m.group(1) != "upsample" else "upsample.0"
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"ufone_(\d+)_(itl|sal)(\d+)\.(.+)", k):
            u, kindf, i, rest = m.groups()
            t = f"UFONE.{u}.{'ITLs' if kindf == 'itl' else 'SALs'}.{i}"
            if mm := re.fullmatch(r"(norm[12])\.(scale|bias)", rest):
                out[f"{t}.{mm.group(1)}.body.{w}"] = v
            elif rest == "attn.temperature":
                out[f"{t}.attn.temperature"] = v
            elif mm := re.fullmatch(r"(attn|ffn)\.(\w+)\.conv\.(kernel|bias)", rest):
                grp, name, kk = mm.groups()
                if kk == "kernel" and grp == "attn" and name in ("qkv", "project_out"):
                    # ITL attention projections export as Linears
                    out[f"{t}.attn.{name}.weight"] = np.ascontiguousarray(v[0, 0].T)
                else:
                    out[f"{t}.{grp}.{name}.{w}"] = conv_w_inv(v) if kk == "kernel" else v
            else:
                raise KeyError(f"unmapped DITN flax param {k}")
        else:
            raise KeyError(f"unmapped DITN flax param {k}")
    return out


# ---------------------------------------------------------------------------
# SeemoRe (eduardzamfir/seemoredetails; spandrel SeemoRe). Top level:
# conv_1, body.{i}.global_block (RME: norm_1, expert block, norm_2, gated
# ffn) + body.{i}.local_block (SME: striped conv former), norm, conv_2,
# upsampler.0 + PixelShuffle. Interior key names follow the upstream naming
# conventions over the flax block structure; a real checkpoint that carries
# a different expert-block factorization fails loudly with the unmatched
# key list (fix the map against the actual file).
# ---------------------------------------------------------------------------

_SEEMORE_RME_CONVS = (("pre", "pre"), ("post", "proj"))
_SEEMORE_FFN = (("gate", "gate"), ("fn_1", "up"), ("fn_2", "down"))  # (torch, flax)
_SEEMORE_SME = (("stripe_w", "stripe_w"), ("stripe_h", "stripe_h"),
                ("value", "value"), ("proj", "proj"))


@register_converter("SeemoRe")
def _convert_seemore(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for kind in ("weight", "bias"):
        _put_conv(out, "conv_1", kind, sd[f"conv_1.{kind}"])
        _put_conv(out, "conv_2", kind, sd[f"conv_2.{kind}"])
        _put_conv(out, "upsampler", kind, sd[f"upsampler.0.{kind}"])
        _put_ln(out, "norm", kind, sd[f"norm.{kind}"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"body\.(\d+)\.", k))
    )
    for i in range(n_layers):
        for tb, fb in (
            (f"body.{i}.global_block", f"body_{i}_rme"),
            (f"body.{i}.local_block", f"body_{i}_sme"),
        ):
            for tn, fn in (("norm_1", "norm1"), ("norm_2", "norm2")):
                _put_ln(out, f"{fb}.{fn}", "weight", sd[f"{tb}.{tn}.weight"])
                _put_ln(out, f"{fb}.{fn}", "bias", sd[f"{tb}.{tn}.bias"])
            for tf_, ff in _SEEMORE_FFN:
                for kind in ("weight", "bias"):
                    if f"{tb}.ffn.{tf_}.{kind}" in sd:
                        _put_conv(out, f"{fb}.ffn.{ff}", kind, sd[f"{tb}.ffn.{tf_}.{kind}"])
            if fb.endswith("rme"):
                for ff, tf_ in _SEEMORE_RME_CONVS:
                    for kind in ("weight", "bias"):
                        _put_conv(out, f"{fb}.{ff}", kind, sd[f"{tb}.block.{tf_}.{kind}"])
                _put_linear(out, f"{fb}.moe.router", "weight",
                            sd[f"{tb}.block.moe_layer.gate.weight"])
                if f"{tb}.block.moe_layer.gate.bias" in sd:
                    _put_linear(out, f"{fb}.moe.router", "bias",
                                sd[f"{tb}.block.moe_layer.gate.bias"])
                e_ids = sorted(
                    {
                        int(m.group(1))
                        for k in sd
                        if (m := re.match(
                            rf"{re.escape(tb)}\.block\.moe_layer\.experts\.(\d+)\.", k
                        ))
                    }
                )
                for j in e_ids:
                    for name in ("down", "dw", "up"):
                        for kind in ("weight", "bias"):
                            _put_conv(
                                out, f"{fb}.moe.expert_{j}.{name}", kind,
                                sd[f"{tb}.block.moe_layer.experts.{j}.{name}.{kind}"],
                            )
            else:
                for ff, tf_ in _SEEMORE_SME:
                    for kind in ("weight", "bias"):
                        _put_conv(out, f"{fb}.{ff}", kind, sd[f"{tb}.block.{tf_}.{kind}"])
    return out


@register_exporter("SeemoRe")
def _export_seemore(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    ffn_inv = {ff: tf_ for tf_, ff in _SEEMORE_FFN}
    sme_inv = {ff: tf_ for ff, tf_ in _SEEMORE_SME}
    rme_inv = {ff: tf_ for ff, tf_ in _SEEMORE_RME_CONVS}
    for k, v in flat.items():
        w = "weight" if k.endswith(("kernel", "scale")) else "bias"
        if m := re.fullmatch(r"(conv_1|conv_2|upsampler)\.conv\.(kernel|bias)", k):
            t = m.group(1) if m.group(1) != "upsampler" else "upsampler.0"
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"norm\.(scale|bias)", k):
            out[f"norm.{w}"] = v
        elif m := re.fullmatch(r"body_(\d+)_(rme|sme)\.(.+)", k):
            i, kindf, rest = m.groups()
            tb = f"body.{i}.{'global_block' if kindf == 'rme' else 'local_block'}"
            if mm := re.fullmatch(r"norm([12])\.(scale|bias)", rest):
                out[f"{tb}.norm_{mm.group(1)}.{w}"] = v
            elif mm := re.fullmatch(r"ffn\.(\w+)\.conv\.(kernel|bias)", rest):
                out[f"{tb}.ffn.{ffn_inv[mm.group(1)]}.{w}"] = (
                    conv_w_inv(v) if mm.group(2) == "kernel" else v
                )
            elif mm := re.fullmatch(r"moe\.router\.(kernel|bias)", rest):
                out[f"{tb}.block.moe_layer.gate.{w}"] = (
                    linear_w(v) if mm.group(1) == "kernel" else v
                )
            elif mm := re.fullmatch(r"moe\.expert_(\d+)\.(down|dw|up)\.conv\.(kernel|bias)", rest):
                out[f"{tb}.block.moe_layer.experts.{mm.group(1)}.{mm.group(2)}.{w}"] = (
                    conv_w_inv(v) if mm.group(3) == "kernel" else v
                )
            elif kindf == "rme" and (mm := re.fullmatch(r"(pre|post)\.conv\.(kernel|bias)", rest)):
                out[f"{tb}.block.{rme_inv[mm.group(1)]}.{w}"] = (
                    conv_w_inv(v) if mm.group(2) == "kernel" else v
                )
            elif kindf == "sme" and (mm := re.fullmatch(r"(\w+)\.conv\.(kernel|bias)", rest)):
                out[f"{tb}.block.{sme_inv[mm.group(1)]}.{w}"] = (
                    conv_w_inv(v) if mm.group(2) == "kernel" else v
                )
            else:
                raise KeyError(f"unmapped SeemoRe flax param {k}")
        else:
            raise KeyError(f"unmapped SeemoRe flax param {k}")
    return out


# ---------------------------------------------------------------------------
# DCTLSA (zengkun301/DCTLSA; spandrel DCTLSA). IMDN-lineage shell:
# fea_conv, B1..Bn blocks, c (1x1 fuse over the dense concat), LR_conv,
# upsampler.0 + PixelShuffle. Block interior (conv1, local window attention
# qkv/proj Linears, DCT channel-SE fc Sequential, conv2) keyed by the
# upstream naming conventions over the flax structure; unmatched keys on a
# real checkpoint fail loudly.
# ---------------------------------------------------------------------------


@register_converter("DCTLSA")
def _convert_dctlsa(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for kind in ("weight", "bias"):
        _put_conv(out, "fea_conv", kind, sd[f"fea_conv.{kind}"])
        _put_conv(out, "c", kind, sd[f"c.{kind}"])
        _put_conv(out, "lr_conv", kind, sd[f"LR_conv.{kind}"])
        _put_conv(out, "upsampler", kind, sd[f"upsampler.0.{kind}"])
    ids = sorted(
        int(m.group(1)) for k in sd if (m := re.fullmatch(r"B(\d+)\.conv1\.weight", k))
    )
    for bi in ids:
        t, f = f"B{bi}", f"b{bi - 1}"
        for kind in ("weight", "bias"):
            _put_conv(out, f"{f}.conv1", kind, sd[f"{t}.conv1.{kind}"])
            _put_conv(out, f"{f}.conv2", kind, sd[f"{t}.conv2.{kind}"])
        for tn, fn in (("attn.qkv", "lsa.qkv"), ("attn.proj", "lsa.proj")):
            _put_linear(out, f"{f}.{fn}", "weight", sd[f"{t}.{tn}.weight"])
            if f"{t}.{tn}.bias" in sd:
                _put_linear(out, f"{f}.{fn}", "bias", sd[f"{t}.{tn}.bias"])
        for tn, fn in (("ca.fc.0", "dct_ca.fc1"), ("ca.fc.2", "dct_ca.fc2")):
            _put_linear(out, f"{f}.{fn}", "weight", sd[f"{t}.{tn}.weight"])
            if f"{t}.{tn}.bias" in sd:
                _put_linear(out, f"{f}.{fn}", "bias", sd[f"{t}.{tn}.bias"])
    return out


@register_exporter("DCTLSA")
def _export_dctlsa(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    lin_map = {"lsa.qkv": "attn.qkv", "lsa.proj": "attn.proj",
               "dct_ca.fc1": "ca.fc.0", "dct_ca.fc2": "ca.fc.2"}
    for k, v in flat.items():
        w = "weight" if k.endswith("kernel") else "bias"
        if m := re.fullmatch(r"(fea_conv|c|lr_conv|upsampler)\.conv\.(kernel|bias)", k):
            t = {"fea_conv": "fea_conv", "c": "c", "lr_conv": "LR_conv",
                 "upsampler": "upsampler.0"}[m.group(1)]
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"b(\d+)\.conv([12])\.conv\.(kernel|bias)", k):
            out[f"B{int(m.group(1)) + 1}.conv{m.group(2)}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"b(\d+)\.((?:lsa|dct_ca)\.\w+)\.(kernel|bias)", k):
            out[f"B{int(m.group(1)) + 1}.{lin_map[m.group(2)]}.{w}"] = (
                linear_w(v) if w == "weight" else v
            )
        else:
            raise KeyError(f"unmapped DCTLSA flax param {k}")
    return out


# ---------------------------------------------------------------------------
# Shared DAT-style dual rectangle-window attention mapping (CRAFT / RGT
# reuse DAT's window machinery incl. DynamicPosBias MLPs).
# torch: qkv, attns.{b}.pos.{pos_proj,pos{1,2,3}.{0,2}}, proj
# flax:  qkv, attns_{b}.pos.{pos_proj,norm{i},pos{i}}, proj
# ---------------------------------------------------------------------------


def _put_dual_rect_attn(out, sd, t, f):
    _put_linear(out, f"{f}.qkv", "weight", sd[f"{t}.qkv.weight"])
    if f"{t}.qkv.bias" in sd:
        _put_linear(out, f"{f}.qkv", "bias", sd[f"{t}.qkv.bias"])
    _put_linear(out, f"{f}.proj", "weight", sd[f"{t}.proj.weight"])
    if f"{t}.proj.bias" in sd:
        _put_linear(out, f"{f}.proj", "bias", sd[f"{t}.proj.bias"])
    for b in (0, 1):
        for kind in ("weight", "bias"):
            ppre_t, ppre_f = f"{t}.attns.{b}.pos", f"{f}.attns_{b}.pos"
            # tiny dims degenerate DynamicPosBias to bias-only (pos3 Linear
            # with 0-dim fan-in): map only the keys present
            if f"{ppre_t}.pos_proj.{kind}" in sd:
                _put_linear(out, f"{ppre_f}.pos_proj", kind, sd[f"{ppre_t}.pos_proj.{kind}"])
            for i in (1, 2, 3):
                if f"{ppre_t}.pos{i}.0.{kind}" in sd:
                    _put_ln(out, f"{ppre_f}.norm{i}", kind, sd[f"{ppre_t}.pos{i}.0.{kind}"])
                if f"{ppre_t}.pos{i}.2.{kind}" in sd:
                    _put_linear(out, f"{ppre_f}.pos{i}", kind, sd[f"{ppre_t}.pos{i}.2.{kind}"])


def _export_dual_rect_attn(out, flat_key, v, t):
    """Inverse of _put_dual_rect_attn for one flax key; returns True if
    handled. flat_key is the suffix after the block prefix."""
    w = "weight" if flat_key.endswith(("kernel", "scale")) else "bias"
    if m := re.fullmatch(r"(qkv|proj)\.(kernel|bias)", flat_key):
        out[f"{t}.{m.group(1)}.{w}"] = linear_w(v) if w == "weight" else v
    elif m := re.fullmatch(r"attns_([01])\.pos\.pos_proj\.(kernel|bias)", flat_key):
        out[f"{t}.attns.{m.group(1)}.pos.pos_proj.{w}"] = (
            linear_w(v) if w == "weight" else v
        )
    elif m := re.fullmatch(r"attns_([01])\.pos\.norm([123])\.(scale|bias)", flat_key):
        out[f"{t}.attns.{m.group(1)}.pos.pos{m.group(2)}.0.{w}"] = v
    elif m := re.fullmatch(r"attns_([01])\.pos\.pos([123])\.(kernel|bias)", flat_key):
        out[f"{t}.attns.{m.group(1)}.pos.pos{m.group(2)}.2.{w}"] = (
            linear_w(v) if w == "weight" else v
        )
    else:
        return False
    return True


# ---------------------------------------------------------------------------
# CRAFT (AVC2-UESTC/CRAFT-SR; spandrel CRAFT). SwinIR-style shell
# (conv_first / layers.{li} / conv_after_body / upsample.0+PixelShuffle);
# each group interleaves HFERB (channel-LN, local conv + max-pool
# high-frequency branches, 1x1 fuse) and SRWAB (DAT-style dual
# rectangle-window attention with DynamicPosBias, LN-MLP), closing with a
# fusion block (3x3 conv + channel attention). Interleaved blocks are keyed
# layers.{li}.blocks.{2*bi} (HFERB) / .{2*bi+1} (SRWAB); fusion keys follow
# the upstream naming conventions over the flax structure.
# ---------------------------------------------------------------------------


@register_converter("CRAFT")
def _convert_craft(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for kind in ("weight", "bias"):
        _put_conv(out, "conv_first", kind, sd[f"conv_first.{kind}"])
        _put_conv(out, "conv_after_body", kind, sd[f"conv_after_body.{kind}"])
        _put_conv(out, "upsample", kind, sd[f"upsample.0.{kind}"])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))
    )
    for li in range(n_layers):
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"layers\.{li}\.blocks\.(\d+)\.", k))
            }
        )
        for j in block_ids:
            t = f"layers.{li}.blocks.{j}"
            if j % 2 == 0:  # HFERB
                f = f"layers_{li}_hferb{j // 2}"
                _put_ln(out, f"{f}.norm", "weight", sd[f"{t}.norm.weight"])
                _put_ln(out, f"{f}.norm", "bias", sd[f"{t}.norm.bias"])
                for name in ("lfe", "hfe", "fuse"):
                    for kind in ("weight", "bias"):
                        _put_conv(out, f"{f}.{name}", kind, sd[f"{t}.{name}.{kind}"])
            else:  # SRWAB
                f = f"layers_{li}_srwab{j // 2}"
                for n in ("norm1", "norm2"):
                    _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                    _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
                _put_dual_rect_attn(out, sd, t, f)
                for tn, fn in (("mlp.fc1", "mlp_fc1"), ("mlp.fc2", "mlp_fc2")):
                    _put_linear(out, f"{f}.{fn}", "weight", sd[f"{t}.{tn}.weight"])
                    _put_linear(out, f"{f}.{fn}", "bias", sd[f"{t}.{tn}.bias"])
        f = f"layers_{li}_fusion"
        for kind in ("weight", "bias"):
            _put_conv(out, f"{f}.conv", kind, sd[f"layers.{li}.fusion.conv.{kind}"])
            _put_conv(out, f"{f}.ca_0", kind, sd[f"layers.{li}.fusion.ca.1.{kind}"])
            _put_conv(out, f"{f}.ca_1", kind, sd[f"layers.{li}.fusion.ca.3.{kind}"])
    return out


@register_exporter("CRAFT")
def _export_craft(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        w = "weight" if k.endswith(("kernel", "scale")) else "bias"
        if m := re.fullmatch(r"(conv_first|conv_after_body|upsample)\.conv\.(kernel|bias)", k):
            t = m.group(1) if m.group(1) != "upsample" else "upsample.0"
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"layers_(\d+)_hferb(\d+)\.(.+)", k):
            li, bi, rest = m.groups()
            t = f"layers.{li}.blocks.{2 * int(bi)}"
            if mm := re.fullmatch(r"norm\.(scale|bias)", rest):
                out[f"{t}.norm.{w}"] = v
            elif mm := re.fullmatch(r"(lfe|hfe|fuse)\.conv\.(kernel|bias)", rest):
                out[f"{t}.{mm.group(1)}.{w}"] = conv_w_inv(v) if w == "weight" else v
            else:
                raise KeyError(f"unmapped CRAFT flax param {k}")
        elif m := re.fullmatch(r"layers_(\d+)_srwab(\d+)\.(.+)", k):
            li, bi, rest = m.groups()
            t = f"layers.{li}.blocks.{2 * int(bi) + 1}"
            if mm := re.fullmatch(r"(norm[12])\.(scale|bias)", rest):
                out[f"{t}.{mm.group(1)}.{w}"] = v
            elif mm := re.fullmatch(r"mlp_fc([12])\.(kernel|bias)", rest):
                out[f"{t}.mlp.fc{mm.group(1)}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif _export_dual_rect_attn(out, rest, v, t):
                pass
            else:
                raise KeyError(f"unmapped CRAFT flax param {k}")
        elif m := re.fullmatch(r"layers_(\d+)_fusion\.(conv|ca_0|ca_1)\.conv\.(kernel|bias)", k):
            li, name = m.group(1), m.group(2)
            t = {"conv": "conv", "ca_0": "ca.1", "ca_1": "ca.3"}[name]
            out[f"layers.{li}.fusion.{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        else:
            raise KeyError(f"unmapped CRAFT flax param {k}")
    return out


# ---------------------------------------------------------------------------
# RGT / RGT-S (zhengchen1999/RGT; spandrel RGT). DAT-derived shell:
# conv_first, before_RG (Rearrange+LN at .1), layers.{li}.blocks.{bi} with
# alternating L-SA (dual rectangle-window attention: attn.qkv /
# attn.attns.{0,1}.pos DynamicPosBias / attn.proj) and RG-SA (recursive
# shared attn.reduction1, attn.conv 1x1->cr, attn.dwconv depthwise(cr),
# attn.norm_act.0 LN, attn.{q,k,v} Linears, attn.cpe depthwise, attn.proj),
# SGFN ffn (fc1 / sg.norm / sg.conv / fc2), layers.{li}.conv group conv,
# norm, conv_after_body, conv_before_upsample.0, upsample.{2s}, conv_last.
# ---------------------------------------------------------------------------


@register_converter("RGT")
def _convert_rgt(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for kind in ("weight", "bias"):
        _put_conv(out, "conv_first", kind, sd[f"conv_first.{kind}"])
        _put_conv(out, "conv_after_body", kind, sd[f"conv_after_body.{kind}"])
        _put_conv(out, "conv_last", kind, sd[f"conv_last.{kind}"])
        _put_conv(out, "conv_before_upsample", kind, sd[f"conv_before_upsample.0.{kind}"])
        _put_ln(out, "before_RG", kind, sd[f"before_RG.1.{kind}"])
        _put_ln(out, "norm", kind, sd[f"norm.{kind}"])
    for k in list(sd):
        if m := re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k):
            _put_conv(out, f"upsample_{int(m.group(1)) // 2}", m.group(2), sd[k])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))
    )
    for li in range(n_layers):
        for kind in ("weight", "bias"):
            _put_conv(out, f"layers_{li}_conv", kind, sd[f"layers.{li}.conv.{kind}"])
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"layers\.{li}\.blocks\.(\d+)\.", k))
            }
        )
        for bi in block_ids:
            t, f = f"layers.{li}.blocks.{bi}", f"layers_{li}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            _put_linear(out, f"{f}.ffn.fc1", "weight", sd[f"{t}.ffn.fc1.weight"])
            _put_linear(out, f"{f}.ffn.fc1", "bias", sd[f"{t}.ffn.fc1.bias"])
            _put_linear(out, f"{f}.ffn.fc2", "weight", sd[f"{t}.ffn.fc2.weight"])
            _put_linear(out, f"{f}.ffn.fc2", "bias", sd[f"{t}.ffn.fc2.bias"])
            _put_ln(out, f"{f}.ffn.sg_norm", "weight", sd[f"{t}.ffn.sg.norm.weight"])
            _put_ln(out, f"{f}.ffn.sg_norm", "bias", sd[f"{t}.ffn.sg.norm.bias"])
            _put_conv(out, f"{f}.ffn.sg_conv", "weight", sd[f"{t}.ffn.sg.conv.weight"])
            _put_conv(out, f"{f}.ffn.sg_conv", "bias", sd[f"{t}.ffn.sg.conv.bias"])
            if f"{t}.attn.q.weight" in sd:  # RG-SA
                for name in ("reduction1", "conv", "dwconv", "cpe"):
                    for kind in ("weight", "bias"):
                        if f"{t}.attn.{name}.{kind}" in sd:
                            _put_conv(out, f"{f}.attn.{name}", kind, sd[f"{t}.attn.{name}.{kind}"])
                _put_ln(out, f"{f}.attn.norm_act", "weight", sd[f"{t}.attn.norm_act.0.weight"])
                _put_ln(out, f"{f}.attn.norm_act", "bias", sd[f"{t}.attn.norm_act.0.bias"])
                for name in ("q", "k", "v", "proj"):
                    _put_linear(out, f"{f}.attn.{name}", "weight", sd[f"{t}.attn.{name}.weight"])
                    if f"{t}.attn.{name}.bias" in sd:
                        _put_linear(out, f"{f}.attn.{name}", "bias", sd[f"{t}.attn.{name}.bias"])
            else:  # L-SA: flax keeps qkv/attns/proj at block level
                _put_dual_rect_attn(out, sd, f"{t}.attn", f)
    return out


@register_exporter("RGT")
def _export_rgt(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in flat.items():
        w = "weight" if k.endswith(("kernel", "scale")) else "bias"
        if m := re.fullmatch(
            r"(conv_first|conv_after_body|conv_last|conv_before_upsample)\.conv\.(kernel|bias)", k
        ):
            t = m.group(1) if m.group(1) != "conv_before_upsample" else "conv_before_upsample.0"
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k):
            out[f"upsample.{2 * int(m.group(1))}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"(before_RG|norm)\.(scale|bias)", k):
            t = "before_RG.1" if m.group(1) == "before_RG" else "norm"
            out[f"{t}.{w}"] = v
        elif m := re.fullmatch(r"layers_(\d+)_conv\.conv\.(kernel|bias)", k):
            out[f"layers.{m.group(1)}.conv.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"layers_(\d+)_b(\d+)\.(.+)", k):
            li, bi, rest = m.groups()
            t = f"layers.{li}.blocks.{bi}"
            if mm := re.fullmatch(r"(norm[12])\.(scale|bias)", rest):
                out[f"{t}.{mm.group(1)}.{w}"] = v
            elif mm := re.fullmatch(r"ffn\.fc([12])\.(kernel|bias)", rest):
                out[f"{t}.ffn.fc{mm.group(1)}.{w}"] = linear_w(v) if w == "weight" else v
            elif mm := re.fullmatch(r"ffn\.sg_norm\.(scale|bias)", rest):
                out[f"{t}.ffn.sg.norm.{w}"] = v
            elif mm := re.fullmatch(r"ffn\.sg_conv\.conv\.(kernel|bias)", rest):
                out[f"{t}.ffn.sg.conv.{w}"] = conv_w_inv(v) if w == "weight" else v
            elif mm := re.fullmatch(r"attn\.(reduction1|conv|dwconv|cpe)\.conv\.(kernel|bias)", rest):
                out[f"{t}.attn.{mm.group(1)}.{w}"] = conv_w_inv(v) if w == "weight" else v
            elif mm := re.fullmatch(r"attn\.norm_act\.(scale|bias)", rest):
                out[f"{t}.attn.norm_act.0.{w}"] = v
            elif mm := re.fullmatch(r"attn\.(q|k|v|proj)\.(kernel|bias)", rest):
                out[f"{t}.attn.{mm.group(1)}.{w}"] = linear_w(v) if w == "weight" else v
            elif _export_dual_rect_attn(out, rest, v, f"{t}.attn"):
                pass
            else:
                raise KeyError(f"unmapped RGT flax param {k}")
        else:
            raise KeyError(f"unmapped RGT flax param {k}")
    return out


# ---------------------------------------------------------------------------
# GRL (ofsoundof/GRL-Image-Restoration models/grl.py; spandrel GRL).
# conv_first / norm_start / layers.{li}.blocks.{bi} (norm1, MixedAttention:
# qkv.body Linear, window_attn.attn_transform + stripe_attn.attn_transform1/2
# (Swin-v2 logit_scale + cpb_mlp.{0,2}), proj, CAB local connection at
# .conv.cab, norm2, mlp.fc1/fc2) / layers.{li}.conv / norm_end /
# conv_after_body / pixelshuffle tail. table_/index_/mask_ buffers are
# recomputed statically on the flax side and skipped here.
# ---------------------------------------------------------------------------

_GRL_TF = (("window_attn.attn_transform", "attn_transform_w"),
           ("stripe_attn.attn_transform1", "attn_transform1"),
           ("stripe_attn.attn_transform2", "attn_transform2"))


@register_converter("GRL")
def _convert_grl(sd: dict[str, np.ndarray], module) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    sd = {k: v for k, v in sd.items()
          if not re.match(r"(table_|index_|mask_)", k.split(".")[-1])}
    for kind in ("weight", "bias"):
        _put_conv(out, "conv_first", kind, sd[f"conv_first.{kind}"])
        _put_conv(out, "conv_after_body", kind, sd[f"conv_after_body.{kind}"])
        _put_ln(out, "norm_start", kind, sd[f"norm_start.{kind}"])
        _put_ln(out, "norm_end", kind, sd[f"norm_end.{kind}"])
        if f"conv_before_upsample.0.{kind}" in sd:  # pixelshuffle tail
            _put_conv(out, "conv_before_upsample", kind, sd[f"conv_before_upsample.0.{kind}"])
            _put_conv(out, "conv_last", kind, sd[f"conv_last.{kind}"])
        elif f"conv_last.{kind}" in sd:  # restoration tail
            _put_conv(out, "conv_last", kind, sd[f"conv_last.{kind}"])
    for k in list(sd):
        if m := re.fullmatch(r"upsample\.(\d+)\.(weight|bias)", k):
            name = ("upsample" if "conv_before_upsample.0.weight" not in sd
                    else f"upsample_{int(m.group(1)) // 2}")
            _put_conv(out, name, m.group(2), sd[k])
    n_layers = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k))
    )
    for li in range(n_layers):
        for kind in ("weight", "bias"):
            _put_conv(out, f"layers_{li}_conv", kind, sd[f"layers.{li}.conv.{kind}"])
        block_ids = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(rf"layers\.{li}\.blocks\.(\d+)\.", k))
            }
        )
        for bi in block_ids:
            t, f = f"layers.{li}.blocks.{bi}", f"layers_{li}_b{bi}"
            for n in ("norm1", "norm2"):
                _put_ln(out, f"{f}.{n}", "weight", sd[f"{t}.{n}.weight"])
                _put_ln(out, f"{f}.{n}", "bias", sd[f"{t}.{n}.bias"])
            _put_linear(out, f"{f}.attn.qkv", "weight", sd[f"{t}.attn.qkv.body.weight"])
            if f"{t}.attn.qkv.body.bias" in sd:
                _put_linear(out, f"{f}.attn.qkv", "bias", sd[f"{t}.attn.qkv.body.bias"])
            _put_linear(out, f"{f}.attn.proj", "weight", sd[f"{t}.attn.proj.weight"])
            if f"{t}.attn.proj.bias" in sd:
                _put_linear(out, f"{f}.attn.proj", "bias", sd[f"{t}.attn.proj.bias"])
            for tt, ft in _GRL_TF:
                out[f"{f}.attn.{ft}.logit_scale"] = sd[f"{t}.attn.{tt}.logit_scale"]
                _put_linear(out, f"{f}.attn.{ft}.cpb0", "weight", sd[f"{t}.attn.{tt}.cpb_mlp.0.weight"])
                _put_linear(out, f"{f}.attn.{ft}.cpb0", "bias", sd[f"{t}.attn.{tt}.cpb_mlp.0.bias"])
                _put_linear(out, f"{f}.attn.{ft}.cpb1", "weight", sd[f"{t}.attn.{tt}.cpb_mlp.2.weight"])
            for tn, fn in (("mlp.fc1", "mlp_fc1"), ("mlp.fc2", "mlp_fc2")):
                _put_linear(out, f"{f}.{fn}", "weight", sd[f"{t}.{tn}.weight"])
                _put_linear(out, f"{f}.{fn}", "bias", sd[f"{t}.{tn}.bias"])
            if f"{t}.conv.cab.0.weight" in sd:  # local connection CAB
                for tc, fc in (("cab.0", "cab_0"), ("cab.2", "cab_1"),
                               ("cab.3.attention.1", "cab_ca0"),
                               ("cab.3.attention.3", "cab_ca1")):
                    for kind in ("weight", "bias"):
                        _put_conv(out, f"{f}.{fc}", kind, sd[f"{t}.conv.{tc}.{kind}"])
    return out


@register_exporter("GRL")
def _export_grl(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    tf_inv = {ft: tt for tt, ft in _GRL_TF}
    cab_inv = {"cab_0": "cab.0", "cab_1": "cab.2",
               "cab_ca0": "cab.3.attention.1", "cab_ca1": "cab.3.attention.3"}
    for k, v in flat.items():
        w = "weight" if k.endswith(("kernel", "scale")) else "bias"
        if m := re.fullmatch(
            r"(conv_first|conv_after_body|conv_last|conv_before_upsample)\.conv\.(kernel|bias)", k
        ):
            t = m.group(1) if m.group(1) != "conv_before_upsample" else "conv_before_upsample.0"
            out[f"{t}.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"upsample\.conv\.(kernel|bias)", k):
            out[f"upsample.0.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"upsample_(\d+)\.conv\.(kernel|bias)", k):
            out[f"upsample.{2 * int(m.group(1))}.{w}"] = (
                conv_w_inv(v) if w == "weight" else v
            )
        elif m := re.fullmatch(r"(norm_start|norm_end)\.(scale|bias)", k):
            out[f"{m.group(1)}.{w}"] = v
        elif m := re.fullmatch(r"layers_(\d+)_conv\.conv\.(kernel|bias)", k):
            out[f"layers.{m.group(1)}.conv.{w}"] = conv_w_inv(v) if w == "weight" else v
        elif m := re.fullmatch(r"layers_(\d+)_b(\d+)\.(.+)", k):
            li, bi, rest = m.groups()
            t = f"layers.{li}.blocks.{bi}"
            if mm := re.fullmatch(r"(norm[12])\.(scale|bias)", rest):
                out[f"{t}.{mm.group(1)}.{w}"] = v
            elif mm := re.fullmatch(r"attn\.qkv\.(kernel|bias)", rest):
                out[f"{t}.attn.qkv.body.{w}"] = linear_w(v) if w == "weight" else v
            elif mm := re.fullmatch(r"attn\.proj\.(kernel|bias)", rest):
                out[f"{t}.attn.proj.{w}"] = linear_w(v) if w == "weight" else v
            elif mm := re.fullmatch(r"attn\.(attn_transform\w*)\.logit_scale", rest):
                out[f"{t}.attn.{tf_inv[mm.group(1)]}.logit_scale"] = v
            elif mm := re.fullmatch(r"attn\.(attn_transform\w*)\.cpb([01])\.(kernel|bias)", rest):
                idx = "0" if mm.group(2) == "0" else "2"
                out[f"{t}.attn.{tf_inv[mm.group(1)]}.cpb_mlp.{idx}.{w}"] = (
                    linear_w(v) if w == "weight" else v
                )
            elif mm := re.fullmatch(r"mlp_fc([12])\.(kernel|bias)", rest):
                out[f"{t}.mlp.fc{mm.group(1)}.{w}"] = linear_w(v) if w == "weight" else v
            elif mm := re.fullmatch(r"(cab_\w+)\.conv\.(kernel|bias)", rest):
                out[f"{t}.conv.{cab_inv[mm.group(1)]}.{w}"] = (
                    conv_w_inv(v) if w == "weight" else v
                )
            else:
                raise KeyError(f"unmapped GRL flax param {k}")
        else:
            raise KeyError(f"unmapped GRL flax param {k}")
    return out
