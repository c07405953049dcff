"""Film tonemap + profiling utilities."""

import numpy as np

from mcpt_tpu.film import tonemap
from mcpt_tpu.utils.profiling import PhaseTimer, ThroughputMeter
from mcpt_tpu.utils.progress import format_duration


def test_tonemap_gamma_and_clamp():
    fb = np.array([[[0.0, 1.0, 4.0]]], np.float32)
    out = tonemap(fb)
    assert out.shape == (1, 1, 4)
    assert out[0, 0, 0] == 0
    assert out[0, 0, 1] == 255  # 255 * 1^0.45
    assert out[0, 0, 2] == 255  # clamped (Renderer.cpp:99-101)
    assert out[0, 0, 3] == 255
    # gamma 0.45: 0.5 -> 255*0.5^0.45 ~ 186.6 -> 186
    mid = tonemap(np.full((1, 1, 3), 0.5, np.float32))
    assert mid[0, 0, 0] == int(255 * 0.5**0.45)


def test_tonemap_negative_is_black():
    out = tonemap(np.full((1, 1, 3), -1.0, np.float32))
    assert (out[0, 0, :3] == 0).all()


def test_format_duration():
    assert format_duration(3725.5) == "1:2:5.500"
    assert format_duration(0.001) == "0:0:0.1"


def test_phase_timer_and_meter():
    pt = PhaseTimer()
    with pt.phase("x"):
        pass
    assert pt.counts["x"] == 1
    assert "x" in pt.report()
    m = ThroughputMeter()
    m.add(100, 10)
    r = m.report()
    assert r["rays"] == 100 and r["paths"] == 10 and r["rays_per_s"] > 0
