"""Dynamic loss scheduler: baseline phase, rebalancing, state roundtrip."""

from trainner_redux_tpu.losses.dynamic_loss_scheduling import DynamicLossScheduler


def test_baseline_then_adapt():
    s = DynamicLossScheduler({"l_g_l1": 1.0, "l_g_gan": 0.1}, baseline_iterations=5,
                             adaptation_rate=0.5, momentum=0.0)
    for i in range(1, 6):
        m = s.update({"l_g_l1": 1.0, "l_g_gan": 0.5}, i)
        assert m == {"l_g_l1": 1.0, "l_g_gan": 1.0}
    # gan loss doubles -> multiplier should fall below 1
    for i in range(6, 12):
        m = s.update({"l_g_l1": 1.0, "l_g_gan": 1.0}, i)
    assert m["l_g_gan"] < 1.0
    assert m["l_g_l1"] == 1.0


def test_state_roundtrip():
    s = DynamicLossScheduler({"a": 1.0}, baseline_iterations=1)
    s.update({"a": 2.0}, 1)
    s.update({"a": 4.0}, 2)
    state = s.state_dict()
    s2 = DynamicLossScheduler({"a": 1.0})
    s2.load_state_dict(state)
    assert s2.multipliers == s.multipliers


def test_auto_calibration_presets():
    """auto_calibrate derives hyperparameters from arch size class, run
    length, dataset complexity, and GAN presence (reference
    dynamic_loss_scheduling.py:524-830)."""
    from trainner_redux_tpu.losses.dynamic_loss_scheduling import (
        auto_calibrate_params,
        create_dynamic_loss_scheduler,
    )

    # size class from the arch type string
    p_s = auto_calibrate_params("span_s", 40_000, ["l_g_l1"])
    p_xl = auto_calibrate_params("drct_xl", 40_000, ["l_g_l1"])
    assert p_s["max_weight"] == 20.0 and p_s["baseline_iterations"] == 150
    assert p_xl["max_weight"] == 100.0 and p_xl["momentum"] == 0.97

    # short runs adapt faster with a halved baseline
    p_short = auto_calibrate_params("span_s", 5_000, ["l_g_l1"])
    assert p_short["adaptation_rate"] > p_s["adaptation_rate"]
    assert p_short["baseline_iterations"] == 75
    # long runs are more conservative
    p_long = auto_calibrate_params("span_s", 100_000, ["l_g_l1"])
    assert p_long["adaptation_rate"] < p_s["adaptation_rate"]

    # GAN presence raises the threshold and lowers the ceiling
    p_gan = auto_calibrate_params("span_s", 40_000, ["l_g_l1", "l_g_gan"])
    assert p_gan["adaptation_threshold"] > p_s["adaptation_threshold"]
    assert p_gan["max_weight"] < p_s["max_weight"]

    # complex datasets lower the ceiling / raise the threshold
    p_cplx = auto_calibrate_params(
        "span_s", 40_000, ["l_g_l1"], {"overall_complexity": 0.9}
    )
    assert p_cplx["max_weight"] < p_s["max_weight"]

    # explicit config keys override derived values
    p_ovr = auto_calibrate_params(
        "span_s", 40_000, ["l_g_l1"], overrides={"max_weight": 3.0}
    )
    assert p_ovr["max_weight"] == 3.0

    # factory: enabled gate, auto_calibrate path, manual path
    assert create_dynamic_loss_scheduler({"a": 1.0}, {"enabled": False}) is None
    s = create_dynamic_loss_scheduler(
        {"a": 1.0}, {"enabled": True, "auto_calibrate": True},
        arch_type="hat_m", total_iterations=40_000,
    )
    assert s is not None and s.max_weight == 30.0
    s2 = create_dynamic_loss_scheduler(
        {"a": 1.0}, {"enabled": True, "momentum": 0.5}
    )
    assert s2 is not None and s2.momentum == 0.5
