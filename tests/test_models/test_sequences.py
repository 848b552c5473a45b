"""Degradation sequence controller: plan generation + execution path."""

import numpy as np


def test_sequence_controller_plans():
    from trainner_redux_tpu.models.paragon_sequences import (
        SequenceController,
        create_predefined_sequences,
        create_video_sequences,
    )

    ctrl = SequenceController(create_predefined_sequences(), seed=0)
    plans = [ctrl.plan() for _ in range(50)]
    nonempty = [p for p in plans if p]
    assert nonempty, "some plans must fire"
    ops = {op for p in nonempty for op, _params in p}
    # reference op vocabulary (paragon_sequences.py chains)
    assert ops & {"jpeg_compression", "webp_compression", "heif_compression"}
    assert "oversharpening" in ops
    for p in nonempty:
        for op, params in p:
            assert isinstance(params, dict)
            for v in params.values():
                assert np.isfinite(v)

    vids = SequenceController(create_video_sequences(), seed=1)
    vops = {op for _ in range(40) for op, _p in vids.plan()}
    assert "video_compression" in vops


def test_sequence_sets_and_names():
    """Chain names match the reference's three sequence modules."""
    from trainner_redux_tpu.models.paragon_sequences import sequences_for_set

    photo = {s.name for s in sequences_for_set("photo")}
    assert photo == {"internet_upload_download", "phone_camera_capture",
                     "dslr_professional", "social_media_upload"}
    video = {s.name for s in sequences_for_set("video")}
    assert video == {"youtube_video", "tiktok_shortform", "streaming_service",
                     "social_multi_platform", "dvdrip_anime"}
    comp = {s.name for s in sequences_for_set("comprehensive")}
    assert comp == {"professional_to_internet", "phone_to_social",
                    "social_processing", "legacy_internet"}
    assert len(sequences_for_set("all")) == 13


def test_plan_executes_on_device():
    """Every op name emitted by any chain runs through _apply_plan."""
    import jax
    import jax.numpy as jnp

    from trainner_redux_tpu.models.paragon_sequences import sequences_for_set
    from trainner_redux_tpu.models.realesrgan_model import RealESRGANModel

    model = RealESRGANModel.__new__(RealESRGANModel)  # op executor only
    model._op_jits = {}
    lq = jax.random.uniform(jax.random.key(0), (2, 24, 24, 3))
    seen = set()
    for seq in sequences_for_set("all"):
        plan = [
            (st.degradation_type, st.sample_parameters(np.random.default_rng(0)))
            for st in seq.steps
        ]
        seen.update(op for op, _ in plan)
        out = model._apply_plan(lq, plan, jax.random.key(1))
        assert out.shape == lq.shape
        assert bool(jnp.isfinite(out).all())
    assert {"video_compression", "block_artifacts", "color_banding",
            "ringing", "chromatic_aberration", "rolling_shutter"} <= seen
