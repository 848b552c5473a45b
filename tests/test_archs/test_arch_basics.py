"""Arch zoo basics: registry sweep, output shapes, torch layout parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trainner_redux_tpu.archs import build_network
from trainner_redux_tpu.archs.arch_util import pixel_shuffle, pixel_unshuffle


def test_pixel_shuffle_matches_torch(rng):
    import torch

    x = rng.random((2, 4, 5, 3 * 9)).astype(np.float32)  # NHWC, r=3
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 3))
    # torch works in NCHW
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.pixel_shuffle(t, 3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=0)


def test_pixel_unshuffle_matches_torch(rng):
    import torch

    x = rng.random((2, 6, 8, 3)).astype(np.float32)
    ours = np.asarray(pixel_unshuffle(jnp.asarray(x), 2))
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.pixel_unshuffle(t, 2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=0)


SHAPE_CASES = [
    ({"type": "compact", "scale": 2, "num_feat": 16, "num_conv": 2}, 2),
    ({"type": "superultracompact", "scale": 4}, 4),
    ({"type": "span_s", "scale": 2}, 2),
    ({"type": "esrgan_lite", "scale": 4, "num_blocks": 1}, 4),
    ({"type": "esrgan", "scale": 2, "num_blocks": 1}, 2),
    ({"type": "esrgan", "scale": 1, "num_blocks": 1}, 1),
    (
        {
            "type": "swinir_s",
            "scale": 2,
            "embed_dim": 16,
            "depths": [2, 2],
            "num_heads": [2, 2],
            "drop_path_rate": 0.0,
        },
        2,
    ),
    (
        {
            "type": "swinir_m",
            "scale": 3,
            "embed_dim": 16,
            "depths": [2],
            "num_heads": [2],
            "drop_path_rate": 0.0,
        },
        3,
    ),
    ({"type": "artcnn_r8f48", "scale": 2, "filters": 16, "n_block": 1}, 2),
    ({"type": "safmn", "scale": 3, "dim": 16, "n_blocks": 1}, 3),
    ({"type": "man_tiny", "scale": 2, "n_feats": 12, "n_resblocks": 1}, 2),
    ({"type": "plksr_tiny", "scale": 2, "dim": 16, "n_blocks": 1}, 2),
    ({"type": "realplksr", "scale": 4, "dim": 16, "n_blocks": 1}, 4),
    ({"type": "rcan", "scale": 2, "n_resgroups": 1, "n_resblocks": 1, "n_feats": 8,
      "reduction": 4, "unshuffle_mod": True}, 2),
    ({"type": "hat", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
      "window_size": 8, "drop_path_rate": 0.0, "num_feat": 16}, 2),
    ({"type": "dat", "scale": 2, "embed_dim": 16, "depth": [2], "num_heads": [2],
      "split_size": [2, 4], "drop_path_rate": 0.0, "num_feat": 16}, 2),
]


SHAPE_PARAMS = [
    (o if i < 4 else pytest.param(*o, marks=pytest.mark.slow))
    if not isinstance(o, tuple) or i < 4
    else pytest.param(*o, marks=pytest.mark.slow)
    for i, o in enumerate(SHAPE_CASES)
]


@pytest.mark.parametrize("opt,scale", SHAPE_PARAMS)
def test_arch_output_shape(opt, scale):
    net = build_network(opt)
    x = jnp.ones((1, 16, 16, 3), jnp.float32)
    params = net.init(jax.random.key(0), x)
    y = net.apply(params, x)
    assert y.shape == (1, 16 * scale, 16 * scale, 3)
    assert not np.any(np.isnan(np.asarray(y)))


def test_span_eval_matches_train_interior():
    """Fused eval conv must equal the decomposed train path in the interior
    (the 1px border differs by design, as in the reference)."""
    net = build_network({"type": "span_s", "scale": 2})
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    params = net.init(jax.random.key(0), x)
    y_train = net.apply(params, x, train=True)
    y_eval = net.apply(params, x, train=False)
    # compare away from borders (each Conv3XC corrupts a 1px halo; the net has
    # ~20 stacked convs so compare the central region)
    c = 24  # central margin in output pixels
    a = np.asarray(y_train)[:, c:-c, c:-c]
    b = np.asarray(y_eval)[:, c:-c, c:-c]
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_train_step_no_nans():
    """One forward+backward+adamw step on every minimal arch: finite grads."""
    import optax

    # span/transformer gradient coverage lives in test_grad_sweep; this
    # smoke test keeps the fast suite lean with the two smallest convnets
    for opt_dict in ({"type": "superultracompact", "scale": 2},):
        net = build_network(opt_dict)
        x = jax.random.uniform(jax.random.key(1), (2, 8, 8, 3))
        gt = jax.random.uniform(jax.random.key(2), (2, 16, 16, 3))
        params = net.init(jax.random.key(0), x)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p):
            return jnp.abs(net.apply(p, x) - gt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, _ = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        assert np.isfinite(float(loss))
        flat = jax.tree.leaves(jax.tree.map(lambda g: float(jnp.abs(g).max()), grads))
        assert all(np.isfinite(v) for v in flat)
        assert all(
            np.all(np.isfinite(np.asarray(leaf))) for leaf in jax.tree.leaves(new_params)
        )


# one forward+backward+update NaN sweep over every ported generator family
GRAD_SWEEP = [
    {"type": "compact", "scale": 2, "num_feat": 8, "num_conv": 1},
    {"type": "span_f32", "scale": 2},
    {"type": "esrgan_lite", "scale": 2, "num_blocks": 1, "num_filters": 8},
    {"type": "rcan", "scale": 2, "n_resgroups": 1, "n_resblocks": 1, "n_feats": 8,
     "reduction": 4},
    {"type": "swinir_s", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
     "drop_path_rate": 0.0},
    {"type": "hat", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
     "window_size": 8, "drop_path_rate": 0.0, "num_feat": 16},
    {"type": "dat", "scale": 2, "embed_dim": 16, "depth": [2], "num_heads": [2],
     "split_size": [2, 4], "drop_path_rate": 0.0, "num_feat": 16},
    {"type": "fdat_tiny", "scale": 2, "embed_dim": 16, "num_groups": 1,
     "depth_per_group": 1, "num_heads": 2, "drop_path_rate": 0.0},
    {"type": "srformer", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
     "window_size": 8, "drop_path_rate": 0.0, "num_feat": 16},
    {"type": "swin2sr_s", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
     "window_size": 8, "drop_path_rate": 0.0, "num_feat": 16},
    {"type": "drct", "scale": 2, "embed_dim": 18, "num_heads": [2], "window_size": 4,
     "growth": 6, "drop_path_rate": 0.0, "num_feat": 16},
    {"type": "elan", "scale": 2, "m_elan": 2, "c_elan": 30, "window_sizes": [2, 4, 8]},
    {"type": "safmn", "scale": 2, "dim": 16, "n_blocks": 1},
    {"type": "man_tiny", "scale": 2, "n_feats": 12, "n_resblocks": 1},
    {"type": "plksr_tiny", "scale": 2, "dim": 16, "n_blocks": 1},
    {"type": "mosr_t", "scale": 2, "dim": 16, "n_block": 1},
    {"type": "spanplus_sts", "scale": 2, "feature_channels": 16, "blocks": [1]},
    {"type": "lkfmixer_t", "scale": 2, "channels": 16, "num_block": 1, "large_kernel": 7},
    {"type": "eimn_a", "scale": 2, "embed_dims": 16, "num_stages": 1},
    {"type": "sebica_mini", "scale": 2},
    {"type": "omnisr", "scale": 2, "num_feat": 16, "res_num": 1, "window_size": 4},
    {"type": "artcnn_r8f48", "scale": 2, "filters": 16, "n_block": 1},
    {"type": "atd_light", "scale": 2, "embed_dim": 16, "depths": [2], "num_heads": [2],
     "window_size": 8, "category_size": 16, "num_tokens": 8, "reducted_dim": 4},
    {"type": "realcugan", "scale": 2},
    {"type": "rtmosr_l", "scale": 2, "dim": 16, "n_blocks": 1},
    {"type": "moesr2", "scale": 2, "dim": 16, "n_blocks": 1, "n_block": 1},
    {"type": "mosrv2", "scale": 2, "dim": 16, "n_block": 1},
    {"type": "detailrefinernet", "scale": 1, "num_features": 16, "num_groups": 2,
     "num_blocks_per_group": 1},
    {"type": "elysiumsr", "scale": 2, "num_feat": 16, "num_blocks": 1},
    {"type": "hyperionsr", "scale": 2, "num_feat": 16, "num_groups": 1,
     "num_blocks": 1},
    {"type": "spanf", "scale": 2, "feature_channels": 16},
    {"type": "lmlt_tiny", "scale": 2, "dim": 16, "n_blocks": 1},
    {"type": "paragonsr", "scale": 2, "num_feat": 16, "num_groups": 1,
     "num_blocks": 1},
    {"type": "unetsegmentation", "scale": 1, "classes": 3, "base_feat": 8,
     "depth": 2},
    {"type": "scunet_aaf6aa", "scale": 2, "dim": 16,
     "config": [1, 1, 1, 1, 1, 1, 1]},
    {"type": "gaterv3", "scale": 2, "dim": 16, "enc_blocks": [1, 1],
     "dec_blocks": [1, 1], "num_latent": 1, "sisr_blocks": 1},
    {"type": "flexnet", "scale": 2, "dim": 16, "num_blocks": [1, 1]},
    {"type": "emt", "scale": 2, "dim": 20, "n_blocks": 1, "n_layers": 2,
     "num_heads": 2, "n_GTLs": 1, "window_list": [[8, 4], [4, 8]],
     "shift_list": [[4, 2], [2, 4]]},
    {"type": "dis_fast", "scale": 2, "num_features": 16, "num_blocks": 2,
     "use_depthwise": True},
    {"type": "escrealm", "scale": 2, "dim": 16, "pdim": 8, "kernel_size": 5,
     "n_blocks": 1, "conv_blocks": 1, "window_size": 8, "num_heads": 2,
     "unshuffle_mod": True},
    {"type": "paragonsr2_pro", "scale": 2, "num_feat": 16, "num_groups": 1,
     "num_blocks": 2, "window_size": 4},
    {"type": "gfisrv2", "scale": 2, "dim": 16, "n_blocks": 4,
     "pixel_unshuffle": True},
    {"type": "spanc", "scale": 2, "feature_channels": 16, "implicit_dim": 32,
     "latent_layers": 2},
    {"type": "hit_sir", "scale": 2, "embed_dim": 16, "depths": [2],
     "num_heads": [2], "base_win_size": [4, 4], "hier_win_ratios": [1, 2]},
    {"type": "hit_srf", "scale": 2, "embed_dim": 16, "depths": [2],
     "num_heads": [2], "base_win_size": [4, 4], "hier_win_ratios": [1, 2]},
    {"type": "dwt_s", "scale": 2, "embed_dim": 16, "depths": [2, 2],
     "num_heads": [2, 2], "window_size": 4, "layer_kinds": [[0, -1], [0, 2]]},
    {"type": "srformerv2", "scale": 2, "embed_dim": 16, "depths": [2],
     "num_heads": [2], "window_size": 8, "squeeze_dim": 8},
    {"type": "ditn_real", "scale": 2, "dim": 16, "ITL_blocks": 1,
     "SAL_blocks": 1, "patch_size": 4},
    {"type": "seemore_t", "scale": 2, "embedding_dim": 16, "num_layers": 1,
     "num_experts": 2, "topk": 1},
    {"type": "rgt_s", "scale": 2, "embed_dim": 16, "depth": [2],
     "num_heads": [2], "split_size": [2, 4]},
    {"type": "craft", "scale": 2, "embed_dim": 16, "depths": [1, 1],
     "num_heads": [2, 2], "split_size_0": 2, "split_size_1": 4,
     "window_size": 4},
    {"type": "grl_s", "scale": 2, "embed_dim": 16, "depths": [2],
     "num_heads_window": [2], "num_heads_stripe": [2], "window_size": 4,
     "stripe_size": [8, 8], "anchor_window_down_factor": 2},
    {"type": "dctlsa", "scale": 2, "nf": 15, "num_modules": 2, "num_head": 3},
]


# families exercised in the default (fast) run; the rest only in `-m ""`
FAST_SWEEP_FAMILIES = {"compact"}
GRAD_SWEEP_PARAMS = [
    o if o["type"] in FAST_SWEEP_FAMILIES else pytest.param(o, marks=pytest.mark.slow)
    for o in GRAD_SWEEP
]


@pytest.mark.parametrize("opt", GRAD_SWEEP_PARAMS, ids=lambda o: o["type"])
def test_grad_sweep(opt):
    """Registry conformance sweep (reference tests/test_archs/test_archs.py):
    one full train step with finite loss/grads/params for every family."""
    import optax

    net = build_network(dict(opt))
    s = opt.get("scale", 2)
    x = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    gt = jax.random.uniform(jax.random.key(2), (2, 16 * s, 16 * s, 3))
    params = net.init(jax.random.key(0), x, train=False)

    def loss_fn(p):
        return jnp.abs(net.apply(p, x, train=False) - gt).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    tx = optax.adamw(1e-4)
    new_params = optax.apply_updates(params, tx.update(grads, tx.init(params), params)[0])
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    assert all(np.all(np.isfinite(np.asarray(p))) for p in jax.tree.leaves(new_params))


@pytest.mark.slow
def test_munet_discriminator_forward():
    """MUNet quad-branch discriminator: logit map shape + finite grads with
    spectral-norm state threading (reference munet_arch.py:253-404)."""
    import jax
    import jax.numpy as jnp

    net = build_network({"type": "munet", "num_feat": 16, "ch_mult": [1, 2]})
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    variables = net.init(jax.random.key(1), x, train=True)
    out, upd = net.apply(variables, x, train=True, mutable=["spectral"])
    assert out.shape == (2, 32, 32, 1)
    assert bool(jnp.isfinite(out).all())
    assert "spectral" in upd

    def loss_fn(p):
        o, _ = net.apply(
            {"params": p, "spectral": variables["spectral"]}, x, train=True,
            mutable=["spectral"],
        )
        return jnp.mean(o**2)

    g = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda t: float(jnp.abs(t).max()), g))
    assert all(np.isfinite(v) for v in flat)


@pytest.mark.slow
def test_cgnet_forward_grads():
    """CascadedGaze needs >=~32px inputs (strided GCE cascade), so it gets its
    own test instead of a GRAD_SWEEP entry."""
    import optax

    net = build_network(
        {"type": "cascadedgaze", "scale": 1, "width": 16, "middle_blk_num": 1,
         "enc_blk_nums": [1, 1], "dec_blk_nums": [1, 1], "GCE_CONVS_nums": [3, 2]}
    )
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    gt = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
    params = net.init(jax.random.key(0), x, train=False)

    def loss_fn(p):
        return jnp.abs(net.apply(p, x, train=False) - gt).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_temporalspanv2_video_forward():
    """TSPANv2 consumes (B, T, H, W, C) clips and emits the center frame at
    scale (reference temporal_span_v2_arch.py:333-518)."""
    net = build_network(
        {"type": "temporalspanv2", "scale": 2, "num_frames": 3,
         "feature_channels": 16, "num_blocks": 2}
    )
    x = jax.random.uniform(jax.random.key(0), (2, 3, 12, 16, 3))
    params = net.init(jax.random.key(1), x, train=False)
    y = net.apply(params, x, train=False)
    assert y.shape == (2, 24, 32, 3)

    def loss_fn(p):
        return jnp.abs(net.apply(p, x, train=True)).mean()

    grads = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_lawfft_testarch():
    """LAWFFT (test-arch registry): FFT attention + dynamic local kernels."""
    net = build_network(
        {"type": "lawfft", "scale": 2, "dim": 16, "n_rblock": 1, "n_mblock": 2,
         "unshuffle_mod": True}
    )
    x = jax.random.uniform(jax.random.key(0), (2, 12, 20, 3))
    params = net.init(jax.random.key(1), x, train=False)
    y = net.apply(params, x, train=False)
    assert y.shape == (2, 24, 40, 3)
    grads = jax.grad(lambda p: jnp.abs(net.apply(p, x, train=False)).mean())(params)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))


@pytest.mark.slow
def test_paragondiffusion_flow():
    """Rectified-flow U-Net: loss + grads + Euler sampling on latents
    (reference paragondiffusion_arch.py:180-333)."""
    from trainner_redux_tpu.archs.paragondiffusion_arch import (
        ParagonDiffusion,
        rectified_flow_loss,
        sample_flow,
    )

    net = ParagonDiffusion(channels=8, num_blocks=(1, 1), control_channels=4)
    z1 = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    lr = jax.random.uniform(jax.random.key(1), (2, 16, 16, 3))
    variables = net.init(jax.random.key(2), z1, jnp.zeros((2,)), lr, train=False)
    loss = rectified_flow_loss(net, variables, z1, lr, jax.random.key(3))
    assert np.isfinite(float(loss))
    grads = jax.grad(
        lambda p: rectified_flow_loss(net, p, z1, lr, jax.random.key(3))
    )(variables)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in jax.tree.leaves(grads))
    z = sample_flow(net, variables, lr, (8, 8), jax.random.key(4), num_steps=2)
    assert z.shape == (2, 8, 8, 4)


@pytest.mark.slow
def test_topiq_cfanet_scores():
    """CFANet FR/NR forward produces scalar scores (reference
    topiq_arch.py:229-497); pretrained weights are gated separately."""
    net = build_network({"type": "topiq", "scale": 1, "use_ref": True})
    x = jax.random.uniform(jax.random.key(0), (2, 64, 64, 3))
    y = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    params = net.init(jax.random.key(2), x, y, train=False)
    s = net.apply(params, x, y, train=False)
    assert s.shape == (2,)
    assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.slow
def test_metagan3_feature_discriminator():
    """MetaGAN3 dual-path SN feature discriminator: /32 feature map output
    (reference metagan3_arch.py:164-193)."""
    net = build_network(
        {"type": "metagan3", "dims": [8, 12, 16, 20], "blocks": [1, 1, 1, 1]}
    )
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    variables = net.init(jax.random.key(1), x, train=True)
    y, _ = net.apply(variables, x, train=True, mutable=["spectral"])
    assert y.shape == (2, 1, 1, 20)
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_tscunet_sequence_mode_matches_sliding_clips():
    """Streaming video inference (t > clip_size): every pyramid level runs
    once over all consecutive triples; outputs must be bit-identical to the
    reference-style sliding clip windows."""
    net = build_network({"type": "tscunet", "scale": 2, "clip_size": 5, "dim": 16})
    rng = np.random.default_rng(0)
    x = rng.random((1, 7, 16, 16, 3)).astype(np.float32)
    params = net.init(jax.random.key(0), jnp.asarray(x[:, :5]), train=True)
    seq = np.asarray(net.apply(params, jnp.asarray(x), train=True))
    assert seq.shape == (1, 3, 32, 32, 3)
    for i in range(3):
        clip = np.asarray(net.apply(params, jnp.asarray(x[:, i : i + 5]), train=True))
        # identical math; tolerance covers conv reduction-order differences
        # between batch sizes on the multi-device CPU test backend (bit-exact
        # on a single device)
        np.testing.assert_allclose(seq[:, i], clip, atol=5e-3)
