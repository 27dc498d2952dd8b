"""Observability counters/timers."""

from nanorq_tpu.utils import stats


def test_counters_and_timers():
    stats.reset()
    stats.count("x")
    stats.count("x", 2)
    with stats.timer("t"):
        pass
    snap = stats.snapshot()
    assert snap["counters"]["x"] == 3
    assert snap["timers"]["t"]["count"] == 1
    assert "x = 3" in stats.report()
    stats.reset()
    assert stats.snapshot()["counters"] == {}
