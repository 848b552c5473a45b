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
