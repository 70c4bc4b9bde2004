"""Schedule math + LP plan tests (reference lp_utils.py:63-111 and the
CogVideoX modulation/pass-switch logic, ...cogvideox...py:1029-1040)."""

import math

import numpy as np
import pytest

from alg_tpu.alg.schedule import (
    LPConfig,
    build_lp_plan,
    get_lp_strength,
    modulate_filter_params,
)

pytestmark = pytest.mark.fast


def _cfg(**kw):
    return LPConfig(use_low_pass_guidance=True, **kw)


def test_interval_schedule():
    cfg = _cfg(lp_strength_schedule_type="interval", schedule_interval_start_time=0.0, schedule_interval_end_time=0.04)
    # 50 steps: step_norm = i/49 <= 0.04 ⇔ i <= 1 (SURVEY §4 item 4)
    vals = [get_lp_strength(i, 50, cfg) for i in range(50)]
    assert vals[0] == 1.0 and vals[1] == 1.0
    assert all(v == 0.0 for v in vals[2:])


def test_interval_wan():
    cfg = _cfg(lp_strength_schedule_type="interval", schedule_interval_start_time=0.0, schedule_interval_end_time=0.20)
    active = sum(get_lp_strength(i, 50, cfg) for i in range(50))
    # i/49 <= 0.2 ⇔ i <= 9.8 → 10 active steps (BASELINE.md)
    assert active == 10


def test_linear_schedule():
    cfg = _cfg(
        lp_strength_schedule_type="linear",
        schedule_linear_start_weight=1.0,
        schedule_linear_end_weight=0.2,
        schedule_linear_end_time=0.5,
    )
    assert get_lp_strength(0, 11, cfg) == 1.0
    # step 5 of 11: norm = 0.5 → >= end_time → end weight
    assert get_lp_strength(5, 11, cfg) == 0.2
    # midpoint of ramp
    mid = get_lp_strength(2, 11, cfg)  # norm 0.2, progress 0.4
    assert abs(mid - (1.0 * 0.6 + 0.2 * 0.4)) < 1e-9
    # end_time <= 0 → constant start weight
    cfg0 = _cfg(lp_strength_schedule_type="linear", schedule_linear_start_weight=0.7, schedule_linear_end_time=0.0)
    assert get_lp_strength(3, 10, cfg0) == 0.7


def test_exponential_schedule():
    cfg = _cfg(lp_strength_schedule_type="exponential", schedule_exp_decay_rate=5.0)
    for i in range(10):
        expected = math.exp(-5.0 * (i / 9))
        assert abs(get_lp_strength(i, 10, cfg) - expected) < 1e-12
    # negative rate → abs
    cfg_neg = _cfg(lp_strength_schedule_type="exponential", schedule_exp_decay_rate=-2.0)
    assert abs(get_lp_strength(9, 10, cfg_neg) - math.exp(-2.0)) < 1e-12


def test_none_and_unknown_schedule():
    assert get_lp_strength(3, 10, _cfg(lp_strength_schedule_type="none")) == 1.0
    assert get_lp_strength(3, 10, _cfg(lp_strength_schedule_type="bogus")) == 1.0


def test_single_step_edge():
    cfg = _cfg(lp_strength_schedule_type="interval", schedule_interval_start_time=0.0, schedule_interval_end_time=0.04)
    # total_steps=1 → step_norm = 0/max(0,1) = 0 → active
    assert get_lp_strength(0, 1, cfg) == 1.0


def test_modulation():
    cfg = _cfg(lp_blur_sigma=2.0, lp_blur_kernel_size=9, lp_resize_factor=0.25, schedule_blur_kernel_size=False)
    sigma, ks, rf = modulate_filter_params(cfg, 0.5)
    assert sigma == 1.0
    assert ks == 9  # unscheduled kernel stays fixed
    assert abs(rf - (1.0 - 0.75 * 0.5)) < 1e-12
    cfg2 = _cfg(lp_blur_kernel_size=0.2, schedule_blur_kernel_size=True)
    _, ks2, _ = modulate_filter_params(cfg2, 0.5)
    assert abs(ks2 - 0.1) < 1e-12
    # strength 1 → full filter; strength 0 → no-op resize factor 1.0
    _, _, rf0 = modulate_filter_params(cfg, 0.0)
    assert rf0 == 1.0


def test_plan_interval_segments_and_identity():
    cfg = _cfg(
        lp_filter_type="down_up",
        lp_resize_factor=0.25,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.04,
    )
    plan = build_lp_plan(cfg, num_steps=50, height=12, width=16)
    assert plan.active
    assert plan.three_pass[:2].all() and not plan.three_pass[2:].any()
    assert len(plan.segments) == 2
    seg0, seg1 = plan.segments
    assert (seg0.start, seg0.stop, seg0.three_pass) == (0, 2, True)
    assert (seg1.start, seg1.stop, seg1.three_pass) == (2, 50, False)
    # inactive steps carry identity operators
    mh5, mw5 = plan.step_matrices(5)
    np.testing.assert_array_equal(mh5, np.eye(12, dtype=np.float32))
    np.testing.assert_array_equal(mw5, np.eye(16, dtype=np.float32))
    # active steps carry a genuine low-pass operator
    assert not np.allclose(plan.step_matrices(0)[0], np.eye(12))
    # interval schedule dedupes to exactly 2 unique operators
    assert plan.m_h.shape[0] == 2


def test_plan_exponential_shortcut():
    cfg = _cfg(
        lp_filter_type="down_up",
        lp_resize_factor=0.5,
        lp_strength_schedule_type="exponential",
        schedule_exp_decay_rate=5.0,
    )
    plan = build_lp_plan(cfg, num_steps=20, height=8, width=8, exp_shortcut=True)
    # strength < 0.1 ⇔ exp(-5 i/19) < 0.1 ⇔ i > 19*ln(10)/5 ≈ 8.75 → steps 9+ are 2-pass
    assert plan.three_pass[:9].all() and not plan.three_pass[9:].any()
    plan_noshort = build_lp_plan(cfg, num_steps=20, height=8, width=8, exp_shortcut=False)
    assert plan_noshort.three_pass.all()


def test_plan_inactive():
    plan = build_lp_plan(LPConfig(), num_steps=10, height=4, width=4)
    assert not plan.active
    assert plan.m_h is None
    assert len(plan.segments) == 1 and not plan.segments[0].three_pass
