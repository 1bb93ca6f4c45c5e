"""The bench steal gate must trigger on EITHER bracketing control.

Regression for the r5 driver artifact: the headline window had a noisy
FIRST half (cpu_control_pre 11.3% steal, post 0.0%) and the r4-era gate
— post-control only — shipped a 14.8s headline (vs the 11.2s clean
record) with steal_retry False. The retry trigger and the noisy_window
flag now share one predicate, bench.window_is_noisy.
"""

import bench


def _c(pct: float) -> dict:
    return {"steal_pct_vs_healthy": pct}


def test_noisy_pre_control_triggers():
    # the exact r5 driver signature
    assert bench.window_is_noisy(_c(11.3), _c(0.0))


def test_noisy_post_control_triggers():
    # the r4 signature (post 19.4%) the original gate was built for
    assert bench.window_is_noisy(_c(0.0), _c(19.4))


def test_clean_window_passes():
    assert not bench.window_is_noisy(_c(0.0), _c(0.0))
    assert not bench.window_is_noisy(_c(9.9), _c(10.0))  # gate is strict >


def test_single_control_form():
    # scaling_bench-style single-control checks reuse the same predicate
    assert bench.window_is_noisy(_c(10.1))
    assert not bench.window_is_noisy(_c(10.0))
