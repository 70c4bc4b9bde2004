"""Bitwise validation of the pure-numpy torch-CPU RNG (VERDICT r2 item #6).

torch is imported HERE ONLY as the oracle; ``alg_tpu.core.torch_rng`` (and
the production ``NoiseSource``) never import it. Covers every code path of
torch's CPU ``randn``/``rand``: the MT19937 engine stream, the bulk
``normal_fill`` float32 path (aligned blocks + the %16 tail-recompute), the
serial ``normal_distribution<double>`` path for numel<16 (including the
generator's persistent second-sample cache across calls), float64 draws, and
interleaved draw sequences on one generator. Reference touchpoints:
``run.py:94`` (one seeded generator threads all draws),
``pipeline_cogvideox_image2video_lowpass.py:388-391,419``.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from alg_tpu.core.rng import NoiseSource
from alg_tpu.core.torch_rng import MT19937, TorchCPUGenerator

pytestmark = pytest.mark.fast


def _bits(a):
    a = np.asarray(a)
    return a.view(np.int32 if a.dtype == np.float32 else np.int64)


def assert_bitwise(t, mine):
    t = np.asarray(t)
    assert t.shape == mine.shape and t.dtype == mine.dtype
    np.testing.assert_array_equal(_bits(t), _bits(mine))


def test_engine_word_stream_matches_std_mt19937():
    # torch's at::mt19937(seed) produces the std::mt19937 sequence
    import random

    eng = MT19937(42)
    # numpy oracle: RandomState uses the same init_genrand seeding + tempering
    rs = np.random.RandomState(42)
    ours = eng.words(2048)
    ref = rs.randint(0, 2 ** 32, size=2048, dtype=np.uint32)
    np.testing.assert_array_equal(ours, ref)
    del random


@pytest.mark.parametrize("seed", [0, 1, 42, 2026])
@pytest.mark.parametrize(
    "shape",
    [(16,), (17,), (31,), (32,), (100,), (3, 5), (2, 3, 4, 5), (15,), (7,), (1,), (1000,)],
)
def test_randn_f32_bitwise(seed, shape):
    g = torch.Generator()
    g.manual_seed(seed)
    t = torch.randn(shape, generator=g).numpy()
    mine = TorchCPUGenerator(seed).randn(shape)
    assert_bitwise(t, mine)


@pytest.mark.parametrize("shape", [(64,), (10,), (17,), (2, 8)])
def test_randn_f64_bitwise(shape):
    g = torch.Generator()
    g.manual_seed(9)
    t = torch.randn(shape, generator=g, dtype=torch.float64).numpy()
    mine = TorchCPUGenerator(9).randn(shape, dtype=np.float64)
    assert_bitwise(t, mine)


def test_randn_large_bitwise():
    n = 1_000_000
    g = torch.Generator()
    g.manual_seed(42)
    t = torch.randn(n, generator=g).numpy()
    mine = TorchCPUGenerator(42).randn((n,))
    assert_bitwise(t, mine)


def test_interleaved_sequence_bitwise():
    """One generator, mixed shapes/paths — the serial path's cached second
    Box-Muller sample must survive across calls exactly as CPUGeneratorImpl's."""
    g = torch.Generator()
    g.manual_seed(7)
    m = TorchCPUGenerator(7)
    for shape in [(5,), (32,), (3,), (17,), (4, 4), (1,), (1,), (100,), (2,)]:
        assert_bitwise(torch.randn(shape, generator=g).numpy(), m.randn(shape))


def test_rand_bitwise():
    g = torch.Generator()
    g.manual_seed(3)
    m = TorchCPUGenerator(3)
    assert_bitwise(torch.rand(1000, generator=g).numpy(), m.rand((1000,)))
    assert_bitwise(
        torch.rand(33, generator=g, dtype=torch.float64).numpy(),
        m.rand((33,), dtype=np.float64),
    )


def test_noise_source_matches_torch_generator_sequence():
    """NoiseSource (the production API) draws the same stream as the
    reference's single seeded torch.Generator."""
    g = torch.Generator()
    g.manual_seed(42)
    ns = NoiseSource(seed=42)
    for shape in [(1, 1, 16, 4, 4), (1, 13, 16, 4, 4), (2, 3), (1, 16, 4, 4, 8)]:
        assert_bitwise(torch.randn(shape, generator=g).numpy(), ns.randn(shape))


def test_noise_source_torch_free():
    """The production modules never import torch (it stays test-only).

    torch's C extensions cannot survive a true unload/reimport (library
    re-registration), so the runtime check masks torch with a poison stub
    (imports of it would fail loudly), reloads the production module under
    the mask, and then restores sys.modules EXACTLY — never re-importing
    torch itself."""
    import importlib
    import sys

    import alg_tpu.core.rng as rng_mod
    import alg_tpu.core.torch_rng as trng_mod

    for mod in (rng_mod, trng_mod):
        src = open(mod.__file__).read()
        assert "import torch" not in src.replace("torch_rng", ""), mod.__name__

    saved = {k: sys.modules[k] for k in list(sys.modules) if k == "torch" or k.startswith("torch.")}
    try:
        for k in saved:
            sys.modules[k] = None  # import of any torch module now raises
        trng2 = importlib.reload(trng_mod)
        out = trng2.TorchCPUGenerator(42).randn((32,))
        assert out.shape == (32,) and np.isfinite(out).all()
    finally:
        sys.modules.update(saved)
        importlib.reload(trng_mod)
