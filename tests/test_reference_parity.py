"""Direct parity against the actual reference implementation.

Imports ``/root/reference/lp_utils.py`` (with torchvision stubbed — only the
gaussian path needs it, which the filter tests cover via the formula) and
compares schedules, bucketing, and the down_up filter end to end.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

pytestmark = pytest.mark.fast

REF_PATH = "/root/reference"


@pytest.fixture(scope="module")
def ref_lp_utils():
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvf = types.ModuleType("torchvision.transforms.functional")
        # a module in sys.modules with __spec__ = None breaks any later
        # importlib.util.find_spec("torchvision") (e.g. inside transformers'
        # optional-dependency probing) with "torchvision.__spec__ is None" —
        # give the stubs real specs
        for mod in (tv, tvt, tvf):
            mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, loader=None)

        def gaussian_blur(img, kernel_size, sigma):  # formula-equivalent stand-in
            ks = kernel_size[0]
            half = (ks - 1) * 0.5
            x = torch.linspace(-half, half, ks)
            pdf = torch.exp(-0.5 * (x / sigma[0]) ** 2)
            k1 = (pdf / pdf.sum()).to(img.dtype)
            c = img.shape[-3]
            pad = ks // 2
            xp = torch.nn.functional.pad(img, [pad, pad, pad, pad], mode="reflect")
            y = torch.nn.functional.conv2d(xp, k1.view(1, 1, 1, ks).expand(c, 1, 1, ks), groups=c)
            return torch.nn.functional.conv2d(y, k1.view(1, 1, ks, 1).expand(c, 1, ks, 1), groups=c)

        tvf.gaussian_blur = gaussian_blur
        tv.transforms = tvt
        tvt.functional = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf

    sys.path.insert(0, REF_PATH)
    import lp_utils

    yield lp_utils
    sys.path.remove(REF_PATH)


def test_strength_schedules_match_reference(ref_lp_utils):
    from alg_tpu.alg.schedule import LPConfig, get_lp_strength

    cases = [
        dict(lp_strength_schedule_type="interval", schedule_interval_start_time=0.0, schedule_interval_end_time=0.04),
        dict(lp_strength_schedule_type="interval", schedule_interval_start_time=0.1, schedule_interval_end_time=0.5),
        dict(
            lp_strength_schedule_type="linear",
            schedule_linear_start_weight=0.9,
            schedule_linear_end_weight=0.1,
            schedule_linear_end_time=0.6,
        ),
        dict(lp_strength_schedule_type="exponential", schedule_exp_decay_rate=4.2),
        dict(lp_strength_schedule_type="none"),
    ]
    for case in cases:
        cfg = LPConfig(use_low_pass_guidance=True, **case)
        for total in (1, 2, 50):
            for i in range(total):
                ref = ref_lp_utils.get_lp_strength(
                    step_index=i,
                    total_steps=total,
                    lp_strength_schedule_type=cfg.lp_strength_schedule_type,
                    schedule_interval_start_time=cfg.schedule_interval_start_time,
                    schedule_interval_end_time=cfg.schedule_interval_end_time,
                    schedule_linear_start_weight=cfg.schedule_linear_start_weight,
                    schedule_linear_end_weight=cfg.schedule_linear_end_weight,
                    schedule_linear_end_time=cfg.schedule_linear_end_time,
                    schedule_exp_decay_rate=cfg.schedule_exp_decay_rate,
                )
                ours = get_lp_strength(i, total, cfg)
                assert abs(ours - ref) < 1e-12, (case, i, total)


def test_down_up_filter_matches_reference(ref_lp_utils):
    from alg_tpu.alg.filters import apply_low_pass_filter

    rng = np.random.RandomState(3)
    for shape in [(2, 3, 15, 21), (1, 4, 3, 12, 16)]:
        x = rng.randn(*shape).astype(np.float32)
        for f in (0.25, 0.4, 0.625):
            ref = ref_lp_utils.apply_low_pass_filter(
                torch.from_numpy(x), "down_up", blur_sigma=0.0, blur_kernel_size=3, resize_factor=f
            ).numpy()
            ours = np.asarray(apply_low_pass_filter(jnp.asarray(x), "down_up", resize_factor=f))
            np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_hunyuan_bucketing_matches_reference(ref_lp_utils):
    from alg_tpu.alg.hunyuan_size import get_hunyuan_video_size

    class FakeImage:
        def __init__(self, w, h):
            self.size = (w, h)

    for res in ("360p", "540p", "720p"):
        for (w, h) in [(1280, 720), (720, 1280), (512, 512), (641, 480), (480, 853)]:
            img = FakeImage(w, h)
            ref = ref_lp_utils.get_hunyuan_video_size(res, img)
            ours = get_hunyuan_video_size(res, img)
            assert tuple(ours) == tuple(ref), (res, w, h)
