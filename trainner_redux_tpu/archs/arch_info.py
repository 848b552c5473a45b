"""Architecture metadata sidecar.

Parity: /root/reference/traiNNer/archs/arch_info.py (1418 LoC):
- dtype-policy tables (the reference's ARCHS_WITHOUT_FP16 forces bf16 for
  ~50 transformer variants; on TPU bf16 is already the default policy, so
  the table records archs that must run attention/softmax in fp32),
- minimum input sizes,
- OFFICIAL_METRICS: published PSNR/SSIM (Urban100-Y, DF2K/DIV2K training)
  for released models — the quality baselines of BASELINE.md §A,
- OFFICIAL_SETTINGS: per-arch from-scratch training hyperparameters,
- ALL_ARCHS: template-generation metadata.
"""

from __future__ import annotations

from typing import Any

# Archs whose attention math needs fp32 accumulation even under the bf16
# policy (reference ARCHS_WITHOUT_FP16 analogue — on TPU this is handled by
# fp32 softmax in the implementations; listed for config tooling parity).
ARCHS_FP32_SOFTMAX = {
    "swinir_s", "swinir_m", "swinir_l", "hat", "hat_s", "hat_m", "hat_l",
    "dat", "dat_s", "dat_2", "dat_light", "srformer", "srformer_light",
    "swin2sr_s", "swin2sr_m", "drct", "drct_l", "atd", "atd_light",
}

# Minimum H/W the arch can compile at (window sizes / downsampling depth).
REQUIRE_32_HW = {"swinir_s", "swinir_m", "swinir_l", "dat", "dat_s", "dat_2", "dat_light"}
REQUIRE_64_HW = {"hat", "hat_s", "hat_m", "hat_l", "tscunet"}

# Batch>=2 required (batch statistics in interaction norms).
REQUIRE_BATCH_2 = {"dat", "dat_s", "dat_2", "dat_light"}

# Video archs consuming (B, T, H, W, C) clips.
VSR_ARCHS = {"temporalspan", "temporalspanv2", "tscunet"}

# Published PSNR/SSIM of officially released models: Urban100 Y-channel,
# models trained on DF2K (or DIV2K where marked). Source: the reference's
# OFFICIAL_METRICS (arch_info.py:124-512) / BASELINE.md.
OFFICIAL_METRICS: dict[str, dict[int, tuple[float, float]]] = {
    "artcnn_r8f48": {2: (31.82, 0.9266)},
    "artcnn_r8f64": {2: (32.10, 0.9293)},
    "artcnn_r16f96": {2: (32.81, 0.9358)},
    "atd": {2: (34.73, 0.9476), 3: (30.52, 0.8924), 4: (28.22, 0.8414)},
    "compact": {2: (31.72, 0.9257)},
    "ultracompact": {2: (31.36, 0.9218)},
    "dat": {2: (34.37, 0.9458), 3: (30.18, 0.8886), 4: (27.87, 0.8343)},
    "dat_s": {2: (34.12, 0.9444), 3: (29.98, 0.8846), 4: (27.68, 0.8300)},
    "dat_light": {2: (32.89, 0.9346), 3: (28.89, 0.8666), 4: (26.64, 0.8033)},
    "dat_2": {2: (34.31, 0.9457), 3: (30.13, 0.8878), 4: (27.86, 0.8341)},
    "drct": {2: (34.54, 0.9474), 3: (30.34, 0.8910), 4: (28.06, 0.8378)},
    "drct_l": {2: (35.17, 0.9516), 3: (31.14, 0.9004), 4: (28.70, 0.8508)},
    "esrgan": {4: (27.03, 0.8153), 2: (33.08, 0.9387)},
    "hat_s": {2: (34.31, 0.9459), 3: (30.15, 0.8879), 4: (27.87, 0.8346)},
    "hat_m": {2: (34.45, 0.9466), 3: (30.23, 0.8896), 4: (27.97, 0.8368)},
    "hat_l": {2: (35.09, 0.9513), 3: (30.92, 0.8981), 4: (28.60, 0.8498)},
    "man": {2: (33.73, 0.9422), 3: (29.52, 0.8782), 4: (27.26, 0.8197)},
    "man_tiny": {4: (25.84, 0.7786)},
    "man_light": {4: (26.70, 0.8052)},
    "omnisr": {2: (33.30, 0.9386), 3: (29.12, 0.8712), 4: (26.95, 0.8105)},
    "plksr": {2: (33.36, 0.9395), 3: (29.10, 0.8713), 4: (26.85, 0.8097)},
    "plksr_tiny": {2: (32.58, 0.9328), 3: (28.51, 0.8599), 4: (26.34, 0.7942)},
    "realplksr": {2: (33.44, 0.9412), 4: (26.94, 0.8140)},
    "rcan": {2: (33.62, 0.9410), 4: (27.16, 0.8168)},
    "rcan_l": {2: (33.80, 0.9437)},
    "safmn": {2: (31.84, 0.9256), 3: (27.95, 0.8474), 4: (25.97, 0.7809)},
    "safmn_l": {2: (33.06, 0.9366), 3: (28.99, 0.8679), 4: (26.81, 0.8058)},
    "span": {2: (32.24, 0.9294), 4: (26.18, 0.7879)},
    "span_s": {2: (32.20, 0.9288), 4: (26.13, 0.7865)},
    "srformer": {2: (34.09, 0.9449), 3: (30.04, 0.8865), 4: (27.68, 0.8311)},
    "srformer_light": {2: (32.91, 0.9353), 3: (28.81, 0.8655), 4: (26.67, 0.8032)},
    "swinir_s": {2: (32.76, 0.9340), 3: (28.66, 0.8624), 4: (26.47, 0.7980)},
    "swinir_m": {2: (33.81, 0.9427), 3: (29.75, 0.8826), 4: (27.45, 0.8254)},
    "swin2sr_m": {2: (33.89, 0.9431), 4: (27.51, 0.8271)},
    "swin2sr_s": {2: (32.85, 0.9349)},
}

# Per-arch official from-scratch training settings (lr, batch, total_iter, ema)
# mirroring the reference's OFFICIAL_SETTINGS_FROMSCRATCH (arch_info.py:513+).
OFFICIAL_SETTINGS_FROMSCRATCH: dict[str, dict[str, Any]] = {
    "default": {"lr": 1e-4, "batch": 32, "total_iter": 500_000, "ema_decay": 0.999,
                "scheduler": {"type": "MultiStepLR", "milestones": [250_000, 400_000, 450_000, 475_000], "gamma": 0.5}},
    "span": {"lr": 5e-4, "batch": 64, "total_iter": 500_000, "ema_decay": 0.999},
    "compact": {"lr": 1e-3, "batch": 64, "total_iter": 1_000_000, "ema_decay": 0.999},
    "esrgan": {"lr": 1e-4, "batch": 16, "total_iter": 400_000, "ema_decay": 0.999},
    "swinir_m": {"lr": 2e-4, "batch": 32, "total_iter": 500_000, "ema_decay": 0.999},
    "hat_m": {"lr": 2e-4, "batch": 32, "total_iter": 500_000, "ema_decay": 0.999},
    "dat": {"lr": 2e-4, "batch": 32, "total_iter": 500_000, "ema_decay": 0.999},
    "rcan": {"lr": 1e-4, "batch": 16, "total_iter": 1_000_000, "ema_decay": 0.999},
    "man": {"lr": 5e-4, "batch": 32, "total_iter": 1_600_000, "ema_decay": 0.999},
}

OFFICIAL_SETTINGS_FINETUNE: dict[str, dict[str, Any]] = {
    "default": {"lr": 1e-5, "batch": 8, "total_iter": 100_000, "ema_decay": 0.999},
}

# Template-generation metadata: names grouped per family with variants.
ALL_ARCHS: list[dict[str, Any]] = [
    {"names": ["span", "span_s", "span_f32", "span_f64", "span_f96"], "family": "SPAN",
     "scales": [1, 2, 4], "video": False},
    {"names": ["compact", "ultracompact", "superultracompact"], "family": "Compact",
     "scales": [1, 2, 3, 4], "video": False},
    {"names": ["esrgan", "esrgan_lite"], "family": "ESRGAN", "scales": [1, 2, 4],
     "video": False},
    {"names": ["swinir_s", "swinir_m", "swinir_l"], "family": "SwinIR",
     "scales": [1, 2, 3, 4], "video": False},
    {"names": ["hat", "hat_s", "hat_m", "hat_l"], "family": "HAT", "scales": [2, 3, 4],
     "video": False},
    {"names": ["dat", "dat_s", "dat_2", "dat_light"], "family": "DAT",
     "scales": [2, 3, 4], "video": False},
    {"names": ["rcan", "rcan_l", "rcan_unshuffle"], "family": "RCAN",
     "scales": [1, 2, 3, 4], "video": False},
    {"names": ["man", "man_tiny", "man_light"], "family": "MAN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["safmn", "safmn_l"], "family": "SAFMN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["plksr", "plksr_tiny", "realplksr"], "family": "PLKSR",
     "scales": [2, 3, 4], "video": False},
    {"names": ["artcnn", "artcnn_r16f96", "artcnn_r8f64", "artcnn_r8f48"],
     "family": "ArtCNN", "scales": [1, 2, 4], "video": False},
    {"names": ["srformer", "srformer_light"], "family": "SRFormer", "scales": [2, 3, 4],
     "video": False},
    {"names": ["swin2sr_s", "swin2sr_m"], "family": "Swin2SR", "scales": [2, 4],
     "video": False},
    {"names": ["drct", "drct_l"], "family": "DRCT", "scales": [2, 3, 4], "video": False},
    {"names": ["atd", "atd_light"], "family": "ATD", "scales": [2, 3, 4],
     "video": False},
    {"names": ["realcugan"], "family": "RealCUGAN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["rtmosr", "rtmosr_l", "rtmosr_ul"], "family": "RTMoSR",
     "scales": [1, 2, 4], "video": False},
    {"names": ["moesr2"], "family": "MoESR", "scales": [1, 2, 4], "video": False},
    {"names": ["mosrv2"], "family": "MoSRv2", "scales": [1, 2, 4], "video": False},
    {"names": ["detailrefinernet"], "family": "DetailRefinerNet", "scales": [1],
     "video": False},
    {"names": ["elysiumsr_s", "elysiumsr_m", "elysiumsr_l", "elysiumsr_xl"],
     "family": "ElysiumSR", "scales": [1, 2, 4], "video": False},
    {"names": ["spanf"], "family": "SPANF", "scales": [2, 4], "video": False},
    {"names": ["lmlt_tiny", "lmlt_base", "lmlt_large"], "family": "LMLT",
     "scales": [2, 3, 4], "video": False},
    {"names": ["paragonsr_anime", "paragonsr_nano", "paragonsr_tiny", "paragonsr_xs",
               "paragonsr_s", "paragonsr_m", "paragonsr_l", "paragonsr_xl"],
     "family": "ParagonSR", "scales": [1, 2, 4], "video": False},
    {"names": ["hyperionsr_s", "hyperionsr_m", "hyperionsr_l", "hyperionsr_xl"],
     "family": "HyperionSR", "scales": [1, 2, 4], "video": False},
    {"names": ["elan", "elan_light"], "family": "ELAN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["fdat_tiny", "fdat_light", "fdat_medium", "fdat_large", "fdat_xl"],
     "family": "FDAT", "scales": [1, 2, 3, 4], "video": False},
    {"names": ["mosr", "mosr_t"], "family": "MoSR", "scales": [2, 4], "video": False},
    {"names": ["spanplus", "spanplus_s", "spanplus_st", "spanplus_sts"],
     "family": "SPANPlus", "scales": [1, 2, 4], "video": False},
    {"names": ["lkfmixer_t", "lkfmixer_b", "lkfmixer_l"], "family": "LKFMixer",
     "scales": [2, 3, 4], "video": False},
    {"names": ["eimn_l", "eimn_a"], "family": "EIMN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["sebica", "sebica_mini"], "family": "Sebica", "scales": [2, 4],
     "video": False},
    {"names": ["omnisr"], "family": "OmniSR", "scales": [2, 3, 4], "video": False},
    {"names": ["temporalspan"], "family": "TemporalSPAN", "scales": [2, 4],
     "video": True},
    {"names": ["tscunet"], "family": "TSCUNet", "scales": [1, 2, 4], "video": True},
    {"names": ["temporalspanv2"], "family": "TemporalSPANv2", "scales": [2, 4],
     "video": True},
    {"names": ["scunet_aaf6aa"], "family": "SCUNet", "scales": [1, 2, 4],
     "video": False},
    {"names": ["gaterv3_s", "gaterv3_r"], "family": "GateRV3", "scales": [1, 2, 4],
     "video": False},
    {"names": ["flexnet", "metaflexnet"], "family": "FlexNet", "scales": [1, 2, 4],
     "video": False},
    {"names": ["emt"], "family": "EMT", "scales": [2, 3, 4], "video": False},
    {"names": ["cascadedgaze"], "family": "CGNet", "scales": [1], "video": False},
    {"names": ["dis_balanced", "dis_fast"], "family": "DIS", "scales": [1, 2, 3, 4],
     "video": False},
    {"names": ["escrealm", "escrealm_xl"], "family": "ESC", "scales": [1, 2, 4],
     "video": False},
    {"names": ["paragonsr2_realtime", "paragonsr2_stream", "paragonsr2_photo",
               "paragonsr2_pro"], "family": "ParagonSR2", "scales": [1, 2, 4],
     "video": False},
    {"names": ["gfisrv2"], "family": "GFISRv2", "scales": [1, 2, 4],
     "video": False},
    {"names": ["spanc"], "family": "SpanC", "scales": [1, 2, 3, 4],
     "video": False},
    {"names": ["hit_sir", "hit_sng", "hit_srf"], "family": "HiT",
     "scales": [2, 3, 4], "video": False},
    {"names": ["dwt", "dwt_s"], "family": "DWT", "scales": [2, 3, 4],
     "video": False},
    {"names": ["srformerv2"], "family": "SRFormerV2", "scales": [2, 3, 4],
     "video": False},
    {"names": ["ditn_real"], "family": "DITN", "scales": [2, 3, 4],
     "video": False},
    {"names": ["seemore_t"], "family": "SeemoRe", "scales": [2, 3, 4],
     "video": False},
    {"names": ["rgt", "rgt_s"], "family": "RGT", "scales": [2, 3, 4],
     "video": False},
    {"names": ["craft"], "family": "CRAFT", "scales": [2, 3, 4],
     "video": False},
    {"names": ["grl_t", "grl_s", "grl_b"], "family": "GRL", "scales": [1, 2, 3, 4],
     "video": False},
    {"names": ["dctlsa"], "family": "DCTLSA", "scales": [2, 3, 4],
     "video": False},
    {"names": ["autoencoder"], "family": "AutoEncoder", "scales": [4], "video": False},
]


def official_settings(arch_name: str, finetune: bool = False) -> dict[str, Any]:
    table = OFFICIAL_SETTINGS_FINETUNE if finetune else OFFICIAL_SETTINGS_FROMSCRATCH
    base = dict(table["default"])
    for key, cfg in table.items():
        if key != "default" and arch_name.startswith(key):
            base.update(cfg)
            break
    return base
