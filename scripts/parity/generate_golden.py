"""Generate cross-framework golden fixtures from the reference's torch archs.

For each family with a LOCAL reference implementation, instantiate the
reference nn.Module with a tiny deterministic config, run one eval forward,
and record (state_dict -> safetensors, input/output -> npz) under
tests/golden/. The test suite then converts the state dict with our
torch_compat converters and asserts the flax forward matches the torch
output — end-to-end converter + arch-math validation across frameworks
(the strongest parity evidence available in a zero-egress environment;
see PARITY.md).

Usage: python scripts/parity/generate_golden.py [case ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from reference_oracle import import_ref_arch  # noqa: E402

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "..", "tests", "golden"
)

# case -> (module file, class name, kwargs, input shape NCHW or NTCHW)
CASES: dict[str, tuple[str, str, dict, tuple]] = {
    "span": (
        "span_arch", "SPAN",
        dict(num_in_ch=3, num_out_ch=3, feature_channels=16, upscale=2,
             norm=False),
        (1, 3, 16, 16),
    ),
    "span_norm": (
        "span_arch", "SPAN",
        dict(num_in_ch=3, num_out_ch=3, feature_channels=16, upscale=2,
             norm=True),
        (1, 3, 16, 16),
    ),
    "srvgg": (
        "srvgg_arch", "SRVGGNetCompact",
        dict(num_feat=8, num_conv=2, upscale=2),
        (1, 3, 16, 16),
    ),
    "hat": (
        "hat_arch", "HAT",
        dict(img_size=16, embed_dim=16, depths=(2,), num_heads=(2,),
             window_size=4, compress_ratio=2, squeeze_factor=4,
             drop_path_rate=0.0, upscale=2,
             upsampler="pixelshuffle", num_feat=16),
        (1, 3, 16, 16),
    ),
    "dat": (
        "dat_arch", "DAT",
        dict(img_size=16, embed_dim=16, depth=[2], num_heads=[2],
             split_size=[2, 4], drop_path_rate=0.0, upscale=2,
             resi_connection="1conv", upsampler="pixelshuffle"),
        (1, 3, 16, 16),
    ),
    "fdat": (
        "fdat_arch", "FDAT",
        dict(scale=2, embed_dim=16, num_groups=1, depth_per_group=1,
             num_heads=2, window_size=4, drop_path_rate=0.0,
             upsampler_type="pixelshuffle"),
        (1, 3, 16, 16),
    ),
    "fdat_tc": (
        "fdat_arch", "FDAT",
        dict(scale=2, embed_dim=16, num_groups=1, depth_per_group=1,
             num_heads=2, window_size=4, drop_path_rate=0.0,
             upsampler_type="transpose+conv"),
        (1, 3, 16, 16),
    ),
    "drct": (
        "drct_arch", "DRCT",
        dict(img_size=16, embed_dim=18, depths=(2,), num_heads=(2,),
             window_size=4, gc=6, drop_path_rate=0.0, upscale=2,
             upsampler="pixelshuffle", resi_connection="1conv"),
        (1, 3, 16, 16),
    ),
    "tscunet": (
        "tscunet_arch", "TSCUNet",
        dict(clip_size=5, nb=1, dim=64, scale=2, input_resolution=64),
        (1, 5, 3, 64, 64),
    ),
    "spanplus": (
        "spanplus_arch", "SpanPlus",
        dict(feature_channels=16, upscale=2, blocks=[1], upsampler="ps"),
        (1, 3, 16, 16),
    ),
    "rcan": (
        "rcan_arch", "RCAN",
        dict(scale=2, n_resgroups=1, n_resblocks=1, n_feats=8, reduction=4),
        (1, 3, 16, 16),
    ),
    "artcnn": (
        "artcnn_arch", "ArtCNN",
        dict(in_ch=3, scale=2, filters=16, n_block=2),
        (1, 3, 16, 16),
    ),
    "moesr": (
        "moesr_arch", "MoESR2",
        dict(scale=2, dim=16, n_blocks=1, n_block=1,
             upsampler="pixelshuffledirect"),
        (1, 3, 16, 16),
    ),
    "moesr_ps": (
        "moesr_arch", "MoESR2",
        dict(scale=2, dim=16, n_blocks=1, n_block=1,
             upsampler="pixelshuffle", upsample_dim=8),
        (1, 3, 16, 16),
    ),
    "moesr_nc": (
        "moesr_arch", "MoESR2",
        dict(scale=2, dim=16, n_blocks=1, n_block=1,
             upsampler="nearest+conv"),
        (1, 3, 16, 16),
    ),
    "mosrv2": (
        "mosrv2_arch", "MoSRv2",
        dict(scale=2, n_block=2, dim=16, upsampler="pixelshuffledirect",
             unshuffle_mod=True, mid_dim=16),
        (1, 3, 16, 16),
    ),
    "mosrv2_rms": (
        "mosrv2_arch", "MoSRv2",
        dict(scale=2, n_block=1, dim=16, upsampler="pixelshuffle",
             unshuffle_mod=False, rms_norm=True, mid_dim=8),
        (1, 3, 16, 16),
    ),
    "sebica": (
        "sebica_arch", "Sebica",
        dict(scale=2, N=8),
        (1, 3, 16, 16),
    ),
    "spanf": (
        "spanf_arch", "SPANF",
        dict(num_in_ch=3, num_out_ch=3, feature_channels=16, upscale=2),
        (1, 3, 16, 16),
    ),
    "elan": (
        "elan_arch", "ELAN",
        dict(scale=2, m_elan=2, c_elan=30, n_share=0),
        (1, 3, 16, 16),
    ),
    "elan_norm": (
        "elan_arch", "ELAN",
        dict(scale=2, m_elan=2, c_elan=30, n_share=1, norm=True),
        (1, 3, 16, 16),
    ),
    "eimn": (
        "eimn_arch", "EIMN",
        dict(embed_dims=16, scale=2, num_stages=2),
        (1, 3, 16, 16),
    ),
    "emt": (
        "emt_arch", "EMT",
        dict(scale=2, dim=20, n_blocks=1, n_layers=3, num_heads=2, n_GTLs=2,
             window_list=([8, 4], [4, 8]), shift_list=([4, 2], [2, 4])),
        (1, 3, 16, 16),
    ),
    "lmlt": (
        "lmlt_arch", "LMLT",
        dict(dim=16, n_blocks=1, scale=2),
        (1, 3, 64, 64),
    ),
    "man": (
        "man_arch", "MAN",
        dict(n_resblocks=2, n_resgroups=1, n_feats=24, scale=2),
        (1, 3, 16, 16),
    ),
    "man_mg": (
        "man_arch", "MAN",
        dict(n_resblocks=1, n_resgroups=2, n_feats=24, scale=2),
        (1, 3, 16, 16),
    ),
    "realplksr": (
        "realplksr_arch", "RealPLKSR",
        dict(dim=16, n_blocks=2, upscaling_factor=2, kernel_size=7),
        (1, 3, 16, 16),
    ),
    "realplksr_gn": (
        "realplksr_arch", "RealPLKSR",
        dict(dim=16, n_blocks=2, upscaling_factor=2, kernel_size=7,
             layer_norm=False, use_ea=False),
        (1, 3, 16, 16),
    ),
    "realplksr_dys": (
        "realplksr_arch", "RealPLKSR",
        dict(dim=16, n_blocks=1, upscaling_factor=2, kernel_size=7,
             upsampler="dysample"),
        (1, 3, 16, 16),
    ),
    "rtmosr": (
        "rtmosr_arch", "RTMoSR",
        dict(scale=2, dim=16, ffn_expansion=2, n_blocks=1,
             unshuffle_mod=False, dccm=True, se=True),
        (1, 3, 16, 16),
    ),
    "rtmosr_ul": (
        "rtmosr_arch", "RTMoSR",
        dict(scale=2, dim=16, ffn_expansion=1.5, n_blocks=1,
             unshuffle_mod=True, dccm=False, se=True),
        (1, 3, 16, 16),
    ),
    "lkfmixer": (
        "lkfmixer_arch", "LKFMixer",
        dict(in_channels=3, channels=16, out_channels=3, upscale=2,
             num_block=1, large_kernel=7, split_factor=0.25),
        (1, 3, 16, 16),
    ),
    "cgnet": (
        "cgnet_arch", "CascadedGaze",
        dict(scale=1, width=16, middle_blk_num=1, enc_blk_nums=[1, 1],
             dec_blk_nums=[1, 1], GCE_CONVS_nums=[3, 2]),
        (1, 3, 32, 32),
    ),
    "detailrefiner": (
        "detailrefinernet_arch", "DetailRefinerNet",
        dict(num_features=16, num_groups=2, num_blocks_per_group=1),
        (1, 3, 16, 16),
    ),
    "spanpp": (
        "spanpp_arch", "SpanC",
        dict(num_in_ch=3, feature_channels=16, scale_list=(2,),
             eval_base_scale=2, implicit_dim=8, latent_layers=1),
        (1, 3, 16, 16),
    ),
    "tspan": (
        "temporal_span_arch", "TemporalSPAN",
        dict(num_in_ch=3, num_out_ch=3, num_frames=3, feature_channels=16,
             upscale=2, history_channels=8),
        (1, 3, 3, 16, 16),
    ),
    "tspanv2": (
        "temporal_span_v2_arch", "TSPANv2",
        dict(in_nc=3, out_nc=3, clip_size=3, dim=16, num_blocks=6, upscale=2),
        (1, 3, 3, 64, 64),
    ),
    "dis": (
        "dis_arch", "DIS",
        dict(num_features=16, num_blocks=2, scale=2),
        (1, 3, 16, 16),
    ),
    "dis_dw4": (
        "dis_arch", "DIS",
        dict(num_features=16, num_blocks=2, scale=4, use_depthwise=True),
        (1, 3, 16, 16),
    ),
    "scunet": (
        "scunet_aaf6aa_arch", "SCUNet_aaf6aa",
        dict(dim=64, config=[1, 1, 1, 1, 1, 1, 1], scale=1,
             input_resolution=256),
        (1, 3, 64, 64),
    ),
    "scunet_sr": (
        "scunet_aaf6aa_arch", "SCUNet_aaf6aa",
        dict(dim=64, config=[1, 1, 1, 1, 1, 1, 1], scale=2, residual=True,
             input_resolution=64),
        (1, 3, 64, 64),
    ),
    "patchgan": (
        "patchgan_arch", "PatchGANDiscriminatorSN",
        dict(input_nc=3, ndf=16, n_layers=3),
        (1, 3, 32, 32),
    ),
    "ms_patchgan": (
        "patchgan_arch", "MultiscalePatchGANDiscriminatorSN",
        dict(input_nc=3, ndf=16, n_layers=2, num_d=2),
        (1, 3, 32, 32),
    ),
    "dunet": (
        "dunet_arch", "DUnet",
        dict(num_in_ch=3, num_feat=16),
        (1, 3, 32, 32),
    ),
    "hyperionsr": (
        "hyperionsr_arch", "HyperionSR",
        dict(scale=2, num_feat=16, num_groups=2, num_blocks=1),
        (1, 3, 16, 16),
    ),
    "elysiumsr": (
        "elysiumsr_arch", "ElysiumSR",
        dict(scale=2, num_feat=16, num_blocks=2, drop_path_rate=0.0),
        (1, 3, 16, 16),
    ),
    "metagan2": (
        "metagan2_arch", "MetaGan2",
        dict(in_ch=3, dims=(16, 16), blocks=(1, 1), downs=(4, 2)),
        (1, 3, 32, 32),
    ),
    "metagan3": (
        "metagan3_arch", "MetaGAN3",
        dict(in_ch=3, dims=(16, 16, 16), blocks=(1, 1, 1)),
        (1, 3, 64, 64),
    ),
    "munet": (
        "munet_arch", "MUNet",
        dict(num_in_ch=3, num_feat=16, ch_mult=(1, 2)),
        (1, 3, 64, 64),
    ),
    "gaterv3": (
        "gaterv3_arch", "GateRV3",
        dict(dim=16, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1,
             sisr_blocks=1, scale=2),
        (1, 3, 16, 16),
    ),
    "gaterv3_att": (
        "gaterv3_arch", "GateRV3",
        dict(dim=16, enc_blocks=(1, 1), dec_blocks=(1, 1), num_latent=1,
             sisr_blocks=1, scale=2, attention=True, flash=True),
        (1, 3, 16, 16),
    ),
    "lawfft": (
        "lawfft_arch", "LAWFFT",
        dict(dim=16, n_rblock=1, n_mblock=2, scale=2, window_size=8),
        (1, 3, 16, 16),
    ),
    "lawfft_us": (
        "lawfft_arch", "LAWFFT",
        dict(dim=16, n_rblock=1, n_mblock=2, scale=2, window_size=8,
             unshuffle_mod=True, upsampler="pixelshuffledirect"),
        (1, 3, 16, 16),
    ),
    "escreal": (
        "escreal_arch", "ESCRealM",
        dict(dim=16, pdim=4, kernel_size=13, n_blocks=1, conv_blocks=1,
             window_size=8, num_heads=2, scale=2, attn_type="Naive"),
        (1, 3, 16, 16),
    ),
    "escreal_us": (
        "escreal_arch", "ESCRealM",
        dict(dim=16, pdim=4, kernel_size=13, n_blocks=1, conv_blocks=1,
             window_size=8, num_heads=2, scale=2, attn_type="Naive",
             unshuffle_mod=True, upsampler="pixelshuffle"),
        (1, 3, 16, 16),
    ),
    "gfisrv2": (
        "gfisrv2_arch", "GFISRV2",
        dict(dim=16, n_blocks=2, scale=2, upsampler="pixelshuffledirect"),
        (1, 3, 16, 16),
    ),
    "gfisrv2_us": (
        "gfisrv2_arch", "GFISRV2",
        dict(dim=16, n_blocks=2, scale=2, upsampler="pixelshuffle",
             pixel_unshuffle=True, mid_dim=8),
        (1, 3, 16, 16),
    ),
    "paragonsr": (
        "paragonsr_arch", "ParagonSR",
        dict(scale=2, num_feat=16, num_groups=1, num_blocks=1),
        (1, 3, 16, 16),
    ),
    "flexnet": (
        "flexnet_arch", "FlexNet",
        dict(dim=16, num_blocks=(1, 1), scale=2, pipeline_type="linear",
             window_size=8),
        (1, 3, 16, 16),
    ),
    "metaflexnet": (
        "flexnet_arch", "FlexNet",
        dict(dim=16, num_blocks=(1, 1, 1, 1), scale=2, pipeline_type="meta",
             window_size=8, upsampler="nearest+conv"),
        (1, 3, 64, 64),
    ),
    "hit_sir": (
        "hit_sir_arch", "HiT_SIR",
        dict(upscale=2, embed_dim=16, depths=(2,), num_heads=(2,),
             base_win_size=(4, 4), hier_win_ratios=[0.5, 1],
             upsampler="pixelshuffledirect"),
        (1, 3, 16, 16),
    ),
    "hit_srf": (
        "hit_srf_arch", "HiT_SRF",
        dict(upscale=2, embed_dim=16, depths=(2,), num_heads=(2,),
             base_win_size=(4, 4), hier_win_ratios=[0.5, 1],
             upsampler="pixelshuffle"),
        (1, 3, 16, 16),
    ),
    "hit_sng": (
        "hit_sng_arch", "HiT_SNG",
        dict(upscale=2, embed_dim=18, depths=(2,), num_heads=(3,),
             base_win_size=(4, 4), hier_win_ratios=[0.5, 1],
             upsampler="pixelshuffledirect"),
        (1, 3, 16, 16),
    ),
    "srformerv2": (
        "srformerv2_arch", "SRFormerv2",
        dict(upscale=2, embed_dim=16, depths=[2], num_heads=[2],
             window_size=12, squeeze_dim=8, img_size=12, mlp_ratio=2,
             upsampler="pixelshuffledirect"),
        (1, 3, 12, 12),
    ),
    "dwt": (
        "dwt_arch", "DWT",
        dict(upscale=2, embed_dim=16, depths=[2, 2, 2], num_heads=[2, 2, 2],
             window_size=4, img_size=16,
             layer_kinds=[[0, -1], [0, 2], [0, 1]], mlp_ratio=2.0,
             upsampler="pixelshuffle"),
        (1, 3, 16, 16),
    ),
    "psr2_realtime": (
        "paragonsr2_arch", "ParagonSR2",
        dict(scale=2, num_feat=16, num_groups=1, num_blocks=2,
             variant="realtime"),
        (1, 3, 16, 16),
    ),
    "psr2_stream": (
        "paragonsr2_arch", "ParagonSR2",
        dict(scale=2, num_feat=16, num_groups=1, num_blocks=2,
             variant="stream"),
        (1, 3, 16, 16),
    ),
    "psr2_photo": (
        "paragonsr2_arch", "ParagonSR2",
        dict(scale=2, num_feat=16, num_groups=1, num_blocks=2,
             variant="photo", window_size=8, attention_mode="sdpa"),
        (1, 3, 16, 16),
    ),
    "psr2_pro": (
        "paragonsr2_arch", "ParagonSR2",
        dict(scale=2, num_feat=16, num_groups=1, num_blocks=2,
             variant="pro", window_size=8, attention_mode="sdpa"),
        (1, 3, 16, 16),
    ),
    # discriminators (GAN parity)
    "unetdisc": (
        "discriminator_arch", "UNetDiscriminatorSN",
        dict(num_in_ch=3, num_feat=16),
        (1, 3, 32, 32),
    ),
    "vggdisc": (
        "discriminator_arch", "VGGStyleDiscriminator",
        dict(num_in_ch=3, num_feat=16, input_size=128),
        (1, 3, 128, 128),
    ),
    # ------------------------------------------------------------------
    # FULL-SIZE flagship cases at the reference's default/official configs
    # (VERDICT r1 #5: toy-config goldens are blind to size-dependent bugs —
    # relative-position tables, window masking at production window sizes,
    # pixel-unshuffle branches at 4x). Fixtures are large, gitignored, and
    # regenerated on demand by the test harness.
    # ------------------------------------------------------------------
    "span_full": (
        "span_arch", "SPAN",
        dict(num_in_ch=3, num_out_ch=3, feature_channels=48, upscale=4,
             norm=True),
        (1, 3, 32, 32),
    ),
    "srvgg_full": (
        "srvgg_arch", "SRVGGNetCompact",
        dict(num_feat=64, num_conv=16, upscale=4),
        (1, 3, 32, 32),
    ),
    "rcan_full": (
        "rcan_arch", "RCAN",
        dict(scale=4, n_resgroups=10, n_resblocks=20, n_feats=64, reduction=16),
        (1, 3, 32, 32),
    ),
    "hat_m_full": (
        "hat_arch", "HAT",
        dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
             window_size=16, mlp_ratio=2.0, compress_ratio=3, squeeze_factor=30,
             drop_path_rate=0.0, upscale=4, upsampler="pixelshuffle",
             num_feat=64),
        (1, 3, 64, 64),
    ),
    "dat_2_full": (
        "dat_arch", "DAT",
        dict(img_size=64, embed_dim=180, depth=[6] * 6, num_heads=[6] * 6,
             split_size=[8, 32], expansion_factor=2.0, drop_path_rate=0.0,
             upscale=4, resi_connection="1conv", upsampler="pixelshuffle"),
        (1, 3, 32, 32),
    ),
    "drct_full": (
        "drct_arch", "DRCT",
        dict(img_size=64, embed_dim=180, depths=(6,) * 6, num_heads=(6,) * 6,
             window_size=16, gc=32, drop_path_rate=0.0, upscale=4,
             upsampler="pixelshuffle", resi_connection="1conv"),
        (1, 3, 64, 64),
    ),
}


def generate(case: str) -> None:
    import torch
    from safetensors.torch import save_file

    module_file, cls_name, kwargs, in_shape = CASES[case]
    mod = import_ref_arch(module_file)
    cls = getattr(mod, cls_name)
    torch.manual_seed(0)
    net = cls(**kwargs)
    net.eval()
    x = torch.rand(*in_shape, generator=torch.Generator().manual_seed(1))
    with torch.inference_mode():
        y = net(x)
    if isinstance(y, (tuple, list)):
        y = y[0]
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    sd = {k: v.contiguous() for k, v in net.state_dict().items()}
    save_file(sd, os.path.join(GOLDEN_DIR, f"{case}.safetensors"))
    np.savez(
        os.path.join(GOLDEN_DIR, f"{case}.npz"),
        x=x.numpy(), y=y.detach().numpy(),
    )
    n_params = sum(v.numel() for v in sd.values())
    print(f"{case}: {cls_name} {n_params} params, out {tuple(y.shape)}")


if __name__ == "__main__":
    cases = sys.argv[1:] or list(CASES)
    for case in cases:
        try:
            generate(case)
        except Exception as e:
            print(f"FAIL {case}: {type(e).__name__}: {e}")
