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
    assert "jpeg" in ops
    for p in nonempty:
        for op, params in p:
            assert isinstance(params, dict)
            for v in params.values():
                assert np.isfinite(v)

    vids = SequenceController(create_video_sequences(), seed=1)
    assert any(vids.plan() for _ in range(20))
