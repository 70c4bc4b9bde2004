"""ALG strength schedules and the per-run static low-pass plan.

``get_lp_strength`` reproduces reference ``lp_utils.py:63-111`` exactly
(linear / interval / exponential / none schedules). Strength depends only on
the step index, the total step count, and static config — so the *entire*
schedule, the per-step strength→parameter modulation (reference
``pipeline_cogvideox_image2video_lowpass.py:1034-1040``), the per-step filter
operators, and the 2-pass/3-pass decision (``...cogvideox...py:1029-1032``)
are all precomputed host-side into an :class:`LPPlan` before the denoise loop
is traced. The loop itself sees only fixed-shape arrays.

Consecutive steps with the same pass count are grouped into ``segments`` so the
sampler can run one fixed-shape ``lax.scan`` per segment instead of paying a
``lax.cond`` with both DiT batch shapes compiled on every step.
"""

from __future__ import annotations

import dataclasses
import logging
import math
from typing import Optional

import numpy as np

from alg_tpu.alg.matrices import filter_matrices

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class LPConfig:
    """ALG kwargs — mirrors the reference pipeline ``__call__`` surface.

    Defaults match ``pipeline_cogvideox_image2video_lowpass.py:753-773`` (the
    three pipelines share this surface; reference ``readme.md:94-136``
    documents the YAML keys one-to-one).
    """

    use_low_pass_guidance: bool = False
    lp_filter_type: str = "none"  # none | down_up | gaussian_blur
    lp_filter_in_latent: bool = True
    lp_blur_sigma: float = 3.0
    lp_blur_kernel_size: object = 0.1  # float = relative to H; int = absolute
    lp_resize_factor: float = 0.25
    lp_strength_schedule_type: str = "none"
    schedule_blur_kernel_size: bool = False
    schedule_interval_start_time: float = 0.0
    schedule_interval_end_time: float = 1.0
    schedule_linear_start_weight: float = 1.0
    schedule_linear_end_weight: float = 0.0
    schedule_linear_end_time: float = 1.0
    schedule_exp_decay_rate: float = 5.0


def get_lp_strength(step_index: int, total_steps: int, cfg: LPConfig) -> float:
    """Low-pass strength multiplier for one step. Reference ``lp_utils.py:63-111``."""
    step_norm = step_index / max(total_steps - 1, 1)
    kind = cfg.lp_strength_schedule_type

    if kind == "linear":
        duration = cfg.schedule_linear_end_time
        if duration <= 0:
            return cfg.schedule_linear_start_weight
        if step_norm >= duration:
            return cfg.schedule_linear_end_weight
        progress = step_norm / duration
        return cfg.schedule_linear_start_weight * (1 - progress) + cfg.schedule_linear_end_weight * progress

    if kind == "interval":
        if cfg.schedule_interval_start_time <= step_norm <= cfg.schedule_interval_end_time:
            return 1.0
        return 0.0

    if kind == "exponential":
        rate = cfg.schedule_exp_decay_rate
        if rate < 0:
            logger.warning("Negative exponential decay rate (%s); using abs value.", rate)
            rate = abs(rate)
        return math.exp(-rate * step_norm)

    if kind == "none":
        return 1.0

    logger.warning("Unknown lp_strength_schedule_type %r; using constant 1.0.", kind)
    return 1.0


def modulate_filter_params(cfg: LPConfig, strength: float):
    """Strength → effective (sigma, kernel_size, resize_factor).

    Reference ``pipeline_cogvideox_image2video_lowpass.py:1034-1040`` (same in
    Wan :863-867 and Hunyuan :1144-1151):
      sigma' = sigma * s;   kernel' = kernel * s iff schedule_blur_kernel_size;
      resize' = 1 - (1 - f) * s  (interpolates toward the no-op 1.0).
    """
    sigma = cfg.lp_blur_sigma * strength
    if cfg.schedule_blur_kernel_size:
        ks = cfg.lp_blur_kernel_size * strength
    else:
        ks = cfg.lp_blur_kernel_size
    resize = 1.0 - (1.0 - cfg.lp_resize_factor) * strength
    return sigma, ks, resize


@dataclasses.dataclass(frozen=True)
class LPSegment:
    """A maximal run of consecutive steps sharing a pass count."""

    start: int  # first step index (inclusive)
    stop: int  # last step index (exclusive)
    three_pass: bool  # True → [uncond(clean), uncond(LP), text(LP)] evaluation


@dataclasses.dataclass(frozen=True)
class LPPlan:
    """Trace-time-static per-step ALG plan for one sampling run.

    Filter operators are stored deduplicated: ``m_h [U, H, H]`` /
    ``m_w [U, W, W]`` hold the U *unique* separable operators of the run
    (interval schedules have U=2: active filter + identity) and ``m_idx [T]``
    maps each step to its operator — the in-loop gather cost is independent of
    the schedule, and pixel-space plans don't materialize 50 near-identical
    720×720 matrices. ``strengths``: raw schedule values. ``three_pass``:
    per-step bool (strength != 0, minus the exponential <0.1 shortcut,
    reference ``...cogvideox...py:1029-1032``). ``active``: ALG on at all.
    ``segments``: contiguous same-pass-count runs.
    """

    active: bool
    num_steps: int
    strengths: np.ndarray  # [T] float32
    three_pass: np.ndarray  # [T] bool
    m_h: Optional[np.ndarray]  # [U, H, H] float32, None when inactive
    m_w: Optional[np.ndarray]  # [U, W, W] float32, None when inactive
    m_idx: Optional[np.ndarray]  # [T] int32, None when inactive
    segments: tuple

    def step_matrices(self, i: int):
        """(m_h, m_w) for host-side step ``i`` (tests / eager paths)."""
        return self.m_h[self.m_idx[i]], self.m_w[self.m_idx[i]]


def _segments_from_mask(three_pass: np.ndarray) -> tuple:
    segs = []
    t = len(three_pass)
    i = 0
    while i < t:
        j = i
        while j < t and three_pass[j] == three_pass[i]:
            j += 1
        segs.append(LPSegment(start=i, stop=j, three_pass=bool(three_pass[i])))
        i = j
    return tuple(segs)


def build_lp_plan(
    cfg: LPConfig,
    num_steps: int,
    height: int,
    width: int,
    exp_shortcut: bool = True,
) -> LPPlan:
    """Precompute the full per-step ALG plan for a ``num_steps`` run.

    ``height``/``width`` are the spatial dims of the tensor the filter is
    applied to (latent dims when ``lp_filter_in_latent`` — all shipped
    reference configs — else pixel dims). ``exp_shortcut`` reproduces the
    CogVideoX-only rounding shortcut: exponential schedule with strength < 0.1
    falls back to 2-pass (reference ``...cogvideox...py:1031-1032``).
    """
    if not cfg.use_low_pass_guidance:
        mask = np.zeros(num_steps, dtype=bool)
        return LPPlan(
            active=False,
            num_steps=num_steps,
            strengths=np.zeros(num_steps, dtype=np.float32),
            three_pass=mask,
            m_h=None,
            m_w=None,
            m_idx=None,
            segments=_segments_from_mask(mask),
        )

    strengths = np.array(
        [get_lp_strength(i, num_steps, cfg) for i in range(num_steps)], dtype=np.float32
    )
    three_pass = strengths != 0.0
    if exp_shortcut and cfg.lp_strength_schedule_type == "exponential":
        three_pass &= strengths >= 0.1

    # dedupe operators by effective filter parameters
    unique: dict = {}
    m_idx = np.zeros(num_steps, dtype=np.int32)
    mh_list, mw_list = [], []
    for i in range(num_steps):
        sigma, ks, resize = modulate_filter_params(cfg, float(strengths[i]))
        key = (round(sigma, 12), ks if isinstance(ks, int) else round(float(ks), 12), round(resize, 12))
        if key not in unique:
            mh, mw = filter_matrices(
                cfg.lp_filter_type,
                height,
                width,
                blur_sigma=sigma,
                blur_kernel_size=ks,
                resize_factor=resize,
            )
            unique[key] = len(mh_list)
            mh_list.append(mh)
            mw_list.append(mw)
        m_idx[i] = unique[key]

    return LPPlan(
        active=True,
        num_steps=num_steps,
        strengths=strengths,
        three_pass=three_pass,
        m_h=np.stack(mh_list),
        m_w=np.stack(mw_list),
        m_idx=m_idx,
        segments=_segments_from_mask(three_pass),
    )


def build_cache_schedule(num_steps: int, cache_interval: int, strengths=None):
    """Compute-step mask for the opt-in step cache (``cache_interval > 1``).

    Full DiT forward on every ``cache_interval``-th step and the final step;
    every nonzero-``strengths`` ALG step is forced too — its (possibly
    2-pass) conditioning varies per step, so skipping it would drop the ALG
    effect entirely. Shared by all three pipelines."""
    import numpy as _np

    compute = _np.zeros(num_steps, bool)
    compute[::cache_interval] = True
    compute[-1] = True
    if strengths is not None:
        compute[_np.asarray(strengths) != 0.0] = True
    return compute
