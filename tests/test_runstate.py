"""Preemption-safe checkpoint/resume (io/runstate.py).

The reference has no failure recovery (SURVEY §5); this is a beyond-parity
subsystem. The contract under test: a run preempted mid-denoise and resumed
from its on-disk snapshot produces BITWISE-identical final latents to an
uninterrupted run — across carry structures (CogVideoX ``(latents,
old_pred)``; Wan ``(latents, UniPC multistep state)``) and across resume
points that fall inside scan chunks and inside ALG three-pass segments.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from alg_tpu.io.runstate import RunCheckpoint, as_checkpoint, run_fingerprint

pytestmark = []


# ---------------------------------------------------------------------------
# unit: fingerprint + snapshot mechanics (no models)
# ---------------------------------------------------------------------------


@pytest.mark.fast
def test_fingerprint_stability_and_sensitivity():
    a = run_fingerprint("cogvideox", prompt="bus", seed=42, steps=50)
    assert a == run_fingerprint("cogvideox", prompt="bus", seed=42, steps=50)
    assert a != run_fingerprint("cogvideox", prompt="bus", seed=43, steps=50)
    assert a != run_fingerprint("wan", prompt="bus", seed=42, steps=50)
    assert len(a) == 32


@pytest.mark.fast
def test_save_restore_roundtrip_pytree(tmp_path):
    path = str(tmp_path / "state.npz")
    ck = RunCheckpoint(path, "fp", every=1)
    carry = (
        jnp.arange(12, dtype=jnp.float32).reshape(3, 4) / 7.0,
        {"hist": [jnp.ones((2, 2)), jnp.full((1,), 3.5)]},
    )
    ck.save(5, carry)
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")

    template = jax.tree_util.tree_map(jnp.zeros_like, carry)
    step, restored = RunCheckpoint(path, "fp").restore(template)
    assert step == 5
    for got, want in zip(jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(carry)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.fast
def test_restore_rejects_mismatches(tmp_path):
    path = str(tmp_path / "state.npz")
    carry = (jnp.ones((2, 3)),)
    RunCheckpoint(path, "fp-a", every=1).save(3, carry)

    # fingerprint mismatch → fresh
    step, out = RunCheckpoint(path, "fp-b").restore(carry)
    assert step == 0 and out is carry

    # carry structure mismatch (extra leaf) → fresh
    step, out = RunCheckpoint(path, "fp-a").restore((jnp.ones((2, 3)), jnp.ones(1)))
    assert step == 0

    # shape mismatch → fresh
    step, out = RunCheckpoint(path, "fp-a").restore((jnp.ones((3, 2)),))
    assert step == 0

    # corrupt file → fresh, no raise
    with open(path, "wb") as f:
        f.write(b"not an npz")
    step, out = RunCheckpoint(path, "fp-a").restore(carry)
    assert step == 0

    # missing file → fresh
    step, out = RunCheckpoint(str(tmp_path / "absent.npz"), "fp").restore(carry)
    assert step == 0


@pytest.mark.fast
def test_maybe_save_interval_and_complete(tmp_path):
    path = str(tmp_path / "state.npz")
    ck = RunCheckpoint(path, "fp", every=4)
    carry = (jnp.zeros(2),)
    ck.maybe_save(2, carry)  # first save always happens
    assert RunCheckpoint(path, "fp").restore(carry)[0] == 2
    ck.maybe_save(4, carry)  # 4 - 2 < every → skipped
    assert RunCheckpoint(path, "fp").restore(carry)[0] == 2
    ck.maybe_save(6, carry)  # 6 - 2 >= every → saved
    step, _ = RunCheckpoint(path, "fp").restore(carry)
    assert step == 6
    ck.complete()
    assert not os.path.exists(path)

    keep = RunCheckpoint(path, "fp", every=1, keep=True)
    keep.save(1, carry)
    keep.complete()
    assert os.path.exists(path)


@pytest.mark.fast
def test_as_checkpoint_normalization(tmp_path):
    assert as_checkpoint(None, "fp", 8) is None
    ck = as_checkpoint(str(tmp_path / "s.npz"), "fp", 3)
    assert isinstance(ck, RunCheckpoint) and ck.fingerprint == "fp" and ck.every == 3
    inst = RunCheckpoint(str(tmp_path / "t.npz"))
    out = as_checkpoint(inst, "computed", 8)
    assert out is inst and out.fingerprint == "computed"


# ---------------------------------------------------------------------------
# pipeline e2e: preempt mid-run, resume, compare bitwise
# ---------------------------------------------------------------------------


class _Preempted(RuntimeError):
    pass


class _PreemptingCheckpoint(RunCheckpoint):
    """Simulates process death: raises after the Nth successful save, so the
    test resumes from whatever reached disk — exactly the crash contract."""

    def __init__(self, *a, fail_after=1, **k):
        super().__init__(*a, **k)
        self.fail_after = fail_after
        self.saves = 0

    def save(self, next_step, carry):
        super().save(next_step, carry)
        self.saves += 1
        if self.saves >= self.fail_after:
            raise _Preempted(f"simulated preemption after save #{self.saves}")


@pytest.fixture(scope="module")
def cog_pipe():
    from alg_tpu.models.cogvideox import (
        CogVideoXTransformerConfig,
        CogVideoXVAEConfig,
        init_cogvideox_transformer,
        init_cogvideox_vae,
    )
    from alg_tpu.pipelines import CogVideoXPipeline

    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=16,
        text_embed_dim=12,
        num_layers=2,
        sample_height=4,
        sample_width=4,
        max_text_seq_length=5,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 16, 16, 32), latent_channels=4, layers_per_block=1, norm_num_groups=4
    )
    key = jax.random.PRNGKey(0)
    return CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_cogvideox_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_cogvideox_vae(jax.random.PRNGKey(1), vcfg),
    )


def _cog_kwargs(with_alg=True):
    rng = np.random.RandomState(1)
    kw = dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 5, 12).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 5, 12).astype(np.float32)),
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=6.0,
        seed=42,
        output_type="latent",
    )
    if with_alg:
        kw.update(
            use_low_pass_guidance=True,
            lp_filter_type="down_up",
            lp_filter_in_latent=True,
            lp_resize_factor=0.5,
            lp_strength_schedule_type="interval",
            schedule_interval_start_time=0.0,
            # steps 0-1 three-pass, 2-3 two-pass: the resume point (after
            # step 1 with every=1, fail_after=2) lands ON the segment seam
            schedule_interval_end_time=0.5,
        )
    return kw


def test_cogvideox_resume_bitwise(cog_pipe, tmp_path, monkeypatch):
    # keep chunks smaller than the run so the preemption hits mid-loop
    monkeypatch.setattr("alg_tpu.core.device.SCAN_CHUNK", 1)
    kw = _cog_kwargs()

    ref = cog_pipe(**kw)  # uninterrupted, no checkpoint

    path = str(tmp_path / "cog.npz")
    ck = _PreemptingCheckpoint(path, every=1, fail_after=2)
    with pytest.raises(_Preempted):
        cog_pipe(checkpoint=ck, **kw)
    assert os.path.exists(path)

    resumed = cog_pipe(checkpoint=path, **kw)  # fresh call, state from disk
    np.testing.assert_array_equal(resumed, ref)
    assert not os.path.exists(path)  # complete() removed the snapshot


def test_cogvideox_resume_rejects_changed_args(cog_pipe, tmp_path, monkeypatch):
    monkeypatch.setattr("alg_tpu.core.device.SCAN_CHUNK", 1)
    kw = _cog_kwargs(with_alg=False)

    path = str(tmp_path / "cog2.npz")
    ck = _PreemptingCheckpoint(path, every=1, fail_after=1)
    with pytest.raises(_Preempted):
        cog_pipe(checkpoint=ck, **kw)

    # different seed → fingerprint mismatch → snapshot ignored, fresh run
    kw2 = dict(kw, seed=43)
    out = cog_pipe(checkpoint=path, **kw2)
    ref2 = cog_pipe(**kw2)
    np.testing.assert_array_equal(out, ref2)


def test_wan_resume_bitwise_multistep_state(tmp_path, monkeypatch):
    """UniPC's multistep history rides the carry — a resume that forgot it
    would diverge from step order-2 on. 4 steps, preempt after step 2."""
    from alg_tpu.models.wan import (
        WanTransformerConfig,
        WanVAEConfig,
        init_wan_transformer,
        init_wan_vae,
    )
    from alg_tpu.pipelines import WanPipeline
    from alg_tpu.schedulers import UniPCConfig

    monkeypatch.setattr("alg_tpu.core.device.SCAN_CHUNK", 1)

    tcfg = WanTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=12,
        in_channels=12,
        out_channels=4,
        num_layers=2,
        ffn_dim=32,
        freq_dim=16,
        text_dim=8,
        image_dim=10,
    )
    vcfg = WanVAEConfig(
        base_dim=8,
        z_dim=4,
        dim_mult=(1, 2, 2, 2),
        num_res_blocks=1,
        latents_mean=tuple(float(x) for x in np.linspace(-0.5, 0.5, 4)),
        latents_std=tuple(float(x) for x in np.linspace(1.0, 2.0, 4)),
    )
    key = jax.random.PRNGKey(0)
    pipe = WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_wan_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_wan_vae(jax.random.PRNGKey(1), vcfg),
        scheduler_cfg=UniPCConfig(flow_shift=5.0),
    )

    rng = np.random.RandomState(1)
    kw = dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        negative_prompt_embeds=jnp.asarray(rng.randn(1, 7, 8).astype(np.float32)),
        image_embeds=jnp.asarray(rng.randn(1, 5, 10).astype(np.float32)),
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=5.0,
        seed=42,
        output_type="latent",
    )

    ref = pipe(**kw)

    path = str(tmp_path / "wan.npz")
    ck = _PreemptingCheckpoint(path, every=1, fail_after=2)
    with pytest.raises(_Preempted):
        pipe(checkpoint=ck, **kw)

    resumed = pipe(checkpoint=path, **kw)
    np.testing.assert_array_equal(resumed, ref)


def test_hunyuan_resume_bitwise_token_replace(tmp_path, monkeypatch):
    """Hunyuan's carry is bare latents; the resume must preserve the
    token_replace frame-0 re-pinning (shipped single-pass ALG path)."""
    from alg_tpu.models.hunyuan import (
        HunyuanVAEConfig,
        HunyuanVideoTransformerConfig,
        init_hunyuan_transformer,
        init_hunyuan_vae,
    )
    from alg_tpu.pipelines import HunyuanVideoPipeline

    monkeypatch.setattr("alg_tpu.core.device.SCAN_CHUNK", 1)

    tcfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    vcfg = HunyuanVAEConfig(
        block_out_channels=(8, 16, 16, 16), latent_channels=4, layers_per_block=1, norm_num_groups=4
    )
    key = jax.random.PRNGKey(0)
    pipe = HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=init_hunyuan_transformer(key, tcfg),
        vae_cfg=vcfg,
        vae_params=init_hunyuan_vae(jax.random.PRNGKey(1), vcfg),
    )

    rng = np.random.RandomState(0)
    kw = dict(
        image=np.random.RandomState(7).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=jnp.asarray(rng.randn(1, 7, 12).astype(np.float32)),
        pooled_prompt_embeds=jnp.asarray(rng.randn(1, 6).astype(np.float32)),
        prompt_attention_mask=jnp.ones((1, 7), jnp.int32),
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=6.0,
        true_cfg_scale=1.0,
        i2v_stable=True,
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.5,
        output_type="latent",
        seed=42,
    )

    ref = pipe(**kw)

    path = str(tmp_path / "hv.npz")
    ck = _PreemptingCheckpoint(path, every=1, fail_after=2)
    with pytest.raises(_Preempted):
        pipe(checkpoint=ck, **kw)

    resumed = pipe(checkpoint=path, **kw)
    np.testing.assert_array_equal(resumed, ref)
