"""End-to-end Wan mini-pipeline golden (VERDICT r2 missing #1, Wan flavor).

Test-local torch reimplementation of the reference Wan pipeline's ``__call__``
orchestration, line by line from
``/root/reference/pipeline_wan_image2video_lowpass.py``:

* ``prepare_latents`` (:372-449): ``randn_tensor`` noise FIRST, then the
  condition video (first frame + zeros, optional ``last_image`` tail,
  :402-412), argmax (mode) VAE encode, per-channel
  ``(z − latents_mean)·(1/latents_std)`` normalization (:415-434), and the
  4-channel mask block (ones on conditioned frames, first frame repeated ×4,
  reshape+transpose, :436-447) → 20-channel ``[mask ⧺ latent_cond]``;
* ``prepare_lp`` latent branch (:541-556): the ACTUAL reference
  ``lp_utils.apply_low_pass_filter`` applied to the WHOLE fused condition —
  mask channels included (faithful quirk 2.4b) — with the
  ``patch_size[0]`` no-op check;
* the denoise loop (:844-944): strength→modulation (:863-867), 2-pass iff
  ``lp_strength == 0.0`` (no exponential shortcut, :882), 3-pass
  ``[condition, LP, LP]`` channel-concat (:888-894), CLIP image embeds
  repeated to the pass batch (:904-908), combine keyed on chunk count
  (:919-924), UniPC stepping (:927);
* final de-normalization ``latents/latents_std + latents_mean`` + VAE decode
  (:948-960).

Pass criteria: final latents allclose fp32 AND decoded-frame PSNR > 40 dB,
ALG on and off, plus the FLF2V ``last_image`` variant.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_dit_torch_golden as ditref
import test_vae_full_torch_golden as vaeref
from test_scheduler_torch_golden import TorchUniPC
from test_reference_parity import ref_lp_utils  # fixture: actual reference lp_utils

from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.wan import (
    WanTransformerConfig,
    WanVAEConfig,
    init_wan_transformer,
    init_wan_vae,
    wan_rope,
)
from alg_tpu.pipelines import WanPipeline
from alg_tpu.schedulers.unipc import UniPCConfig

_ = ref_lp_utils

HEIGHT = WIDTH = 32
NUM_FRAMES = 9
STEPS = 4
GUIDANCE = 5.0

ALG_KW = dict(
    use_low_pass_guidance=True,
    lp_filter_type="down_up",
    lp_filter_in_latent=True,
    lp_resize_factor=0.4,
    lp_strength_schedule_type="interval",
    schedule_interval_start_time=0.0,
    schedule_interval_end_time=0.4,  # 4 steps → steps 0,1 active (3-pass)
)


def _psnr(a, b, peak=2.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / mse) if mse > 0 else np.inf


def _build():
    tcfg = WanTransformerConfig(
        num_attention_heads=2, attention_head_dim=12, in_channels=12, out_channels=4,
        num_layers=2, ffn_dim=32, freq_dim=16, text_dim=8, image_dim=10,
        patch_size=(1, 2, 2),
    )
    vcfg = WanVAEConfig(
        base_dim=8, z_dim=4, dim_mult=(1, 1, 2, 2), num_res_blocks=1,
        temperal_downsample=(False, True, True),
        latents_mean=(0.1, -0.2, 0.3, 0.0),
        latents_std=(1.2, 0.9, 1.1, 1.0),
    )
    tparams = ditref._randomize(init_wan_transformer(jax.random.PRNGKey(0), tcfg), seed=9)
    vparams = vaeref._randomize(init_wan_vae(jax.random.PRNGKey(5), vcfg), seed=31)
    return tcfg, vcfg, tparams, vparams


def _torch_mask_block(batch_size, num_frames, f_lat, h_lat, w_lat, tscale, last_image):
    """Reference :436-447."""
    mask = torch.ones(batch_size, 1, num_frames, h_lat, w_lat, dtype=torch.float64)
    if last_image is None:
        mask[:, :, list(range(1, num_frames))] = 0
    else:
        mask[:, :, list(range(1, num_frames - 1))] = 0
    first = torch.repeat_interleave(mask[:, :, 0:1], dim=2, repeats=tscale)
    mask = torch.cat([first, mask[:, :, 1:]], dim=2)
    mask = mask.view(batch_size, -1, tscale, h_lat, w_lat)
    return mask.transpose(1, 2)  # [B, 4, F_lat, h, w]


def _torch_mini_pipeline(
    lp_utils, tcfg, vcfg, tparams, vparams, *,
    image_bchw, prompt_embeds, negative_prompt_embeds, image_embeds,
    seed, last_image=None, use_low_pass_guidance=False,
    lp_filter_type="none", lp_resize_factor=0.4,
    lp_strength_schedule_type="none",
    schedule_interval_start_time=0.0, schedule_interval_end_time=1.0,
    lp_filter_in_latent=True, lp_blur_sigma=3.0, lp_blur_kernel_size=0.1,
    schedule_blur_kernel_size=False,
    schedule_linear_start_weight=1.0, schedule_linear_end_weight=0.0,
    schedule_linear_end_time=1.0, schedule_exp_decay_rate=5.0,
):
    generator = torch.Generator()
    generator.manual_seed(seed)
    num_frames = NUM_FRAMES
    tscale = vcfg.temporal_scale
    f_lat = (num_frames - 1) // tscale + 1
    h_lat, w_lat = HEIGHT // 8, WIDTH // 8
    zc = vcfg.z_dim
    do_cfg = GUIDANCE > 1.0

    pe = torch.tensor(np.asarray(prompt_embeds, np.float64))
    ne = torch.tensor(np.asarray(negative_prompt_embeds, np.float64))
    img_e = torch.tensor(np.asarray(image_embeds, np.float64))

    sched = TorchUniPC(UniPCConfig(flow_shift=5.0), STEPS)
    timesteps = sched.timesteps

    image = torch.tensor(np.asarray(image_bchw, np.float64))
    batch_size = image.shape[0]

    # prepare_latents (:386-449): noise FIRST
    latents = torch.randn(
        (batch_size, zc, f_lat, h_lat, w_lat), generator=generator, dtype=torch.float32
    ).double()

    image_5d = image.unsqueeze(2)
    if last_image is None:
        video_condition = torch.cat(
            [image_5d, image_5d.new_zeros(batch_size, 3, num_frames - 1, HEIGHT, WIDTH)], dim=2
        )
    else:
        li = torch.tensor(np.asarray(last_image, np.float64)).unsqueeze(2)
        video_condition = torch.cat(
            [image_5d, image_5d.new_zeros(batch_size, 3, num_frames - 2, HEIGHT, WIDTH), li],
            dim=2,
        )
    lmean = torch.tensor(vcfg.latents_mean, dtype=torch.float64).view(1, zc, 1, 1, 1)
    lstd = 1.0 / torch.tensor(vcfg.latents_std, dtype=torch.float64).view(1, zc, 1, 1, 1)
    mean, _ = vaeref.torch_wan_vae_encode(vparams, vcfg, video_condition)  # argmax = mode
    latent_condition = mean.repeat(batch_size, 1, 1, 1, 1)
    latent_condition = (latent_condition - lmean) * lstd
    mask = _torch_mask_block(batch_size, num_frames, f_lat, h_lat, w_lat, tscale, last_image)
    condition = torch.cat([mask, latent_condition], dim=1)  # [B, 8, F_lat, h, w]

    rope_cos, rope_sin = wan_rope(tcfg, f_lat, h_lat, w_lat)

    def prepare_lp_pixel(mod_sigma, mod_kernel, mod_resize):
        """Reference prepare_lp pixel branch (:493-540): filter RGB → rebuild
        the full mask+latent condition with a POSTERIOR draw (the initial
        condition uses argmax; the LP rebuild samples — faithful)."""
        image_lp = lp_utils.apply_low_pass_filter(
            image,
            filter_type=lp_filter_type,
            blur_sigma=mod_sigma,
            blur_kernel_size=mod_kernel,
            resize_factor=mod_resize,
        )
        vc = torch.cat(
            [image_lp.unsqueeze(2),
             image_lp.new_zeros(batch_size, 3, num_frames - 1, HEIGHT, WIDTH)],
            dim=2,
        )
        mean_lp, logvar_lp = vaeref.torch_wan_vae_encode(vparams, vcfg, vc)
        std_lp = torch.exp(0.5 * torch.clamp(logvar_lp, -30.0, 20.0))
        eps = torch.randn(mean_lp.shape, generator=generator, dtype=torch.float32).double()
        enc = mean_lp + std_lp * eps
        latent_cond = (enc - lmean) * lstd
        m = _torch_mask_block(batch_size, num_frames, f_lat, h_lat, w_lat, tscale, None)
        return torch.cat([m, latent_cond], dim=1)

    for i, t in enumerate(timesteps):
        if do_cfg and use_low_pass_guidance:
            lp_strength = lp_utils.get_lp_strength(
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
            mod_sigma = lp_blur_sigma * lp_strength
            mod_kernel = (
                lp_blur_kernel_size * lp_strength
                if schedule_blur_kernel_size
                else lp_blur_kernel_size
            )
            mod_resize = 1.0 - (1.0 - lp_resize_factor) * lp_strength
            if lp_filter_in_latent:
                # prepare_lp latent branch (:541-556): filters the WHOLE fused
                # condition, mask channels included (quirk 2.4b)
                lp_lat = lp_utils.apply_low_pass_filter(
                    condition,
                    filter_type=lp_filter_type,
                    blur_sigma=mod_sigma,
                    blur_kernel_size=mod_kernel,
                    resize_factor=mod_resize,
                )
            else:
                lp_lat = prepare_lp_pixel(mod_sigma, mod_kernel, mod_resize)
            # patch_size[0] == 1 → the size(1) % pt check is a no-op (:550-556)
            if lp_strength == 0.0:
                lmi = torch.cat([latents] * 2)
                lmi = torch.cat([lmi, torch.cat([condition, condition], dim=0)], dim=1)
                embeds = torch.cat([ne, pe], dim=0)
            else:
                lmi = torch.cat([latents] * 3)
                lmi = torch.cat([lmi, torch.cat([condition, lp_lat, lp_lat], dim=0)], dim=1)
                embeds = torch.cat([ne, ne, pe], dim=0)
        else:
            lmi = torch.cat([latents] * 2)
            lmi = torch.cat([lmi, torch.cat([condition, condition], dim=0)], dim=1)
            embeds = torch.cat([ne, pe], dim=0)

        timestep = torch.full((lmi.shape[0],), float(t), dtype=torch.float64)
        img_batch = img_e.repeat(lmi.shape[0], 1, 1) if img_e.shape[0] != lmi.shape[0] else img_e
        noise_pred = ditref._torch_wan(
            tparams, tcfg, lmi, timestep, embeds, img_batch, rope_cos, rope_sin
        )
        noise_pred = torch.as_tensor(np.asarray(noise_pred), dtype=torch.float64)

        if noise_pred.shape[0] == 3:
            uncond_init, uncond, text = noise_pred.chunk(3)
            noise_pred = uncond_init + GUIDANCE * (text - uncond)
        else:
            uncond, text = noise_pred.chunk(2)
            noise_pred = uncond + GUIDANCE * (text - uncond)

        latents = sched.step(noise_pred, latents)

    final_latents = latents
    denorm = latents / lstd + lmean  # (:948-958)
    video = vaeref.torch_wan_vae_decode(vparams, vcfg, denorm)  # [B, C, F, H, W]
    return np.asarray(final_latents), np.asarray(video)


@pytest.mark.parametrize(
    "alg,flf2v",
    [(True, False), (False, False), (True, True), ("pixel", False)],
    ids=["alg", "noalg", "alg-flf2v", "alg-pixel"],
)
def test_wan_minipipeline_golden(ref_lp_utils, alg, flf2v):
    tcfg, vcfg, tparams, vparams = _build()
    r = np.random.RandomState(13)
    pe = r.randn(1, 7, 8).astype(np.float32)
    ne = r.randn(1, 7, 8).astype(np.float32)
    img_e = r.randn(1, 5, 10).astype(np.float32)
    img = r.rand(1, 3, HEIGHT, WIDTH).astype(np.float32) * 2 - 1
    last = (r.rand(1, 3, HEIGHT, WIDTH).astype(np.float32) * 2 - 1) if flf2v else None
    alg_kw = dict(ALG_KW) if alg else {}
    if alg == "pixel":
        # pixel branch: per-step filtered-RGB full-condition rebuild with
        # posterior draws through the same generator (reference :493-540)
        alg_kw["lp_filter_in_latent"] = False

    lat_t, vid_t = _torch_mini_pipeline(
        ref_lp_utils, tcfg, vcfg, tparams, vparams,
        image_bchw=img, prompt_embeds=pe, negative_prompt_embeds=ne,
        image_embeds=img_e, seed=42, last_image=last, **alg_kw,
    )

    pipe = WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        scheduler_cfg=UniPCConfig(flow_shift=5.0),
    )
    lat_j = pipe(
        image=img,
        prompt_embeds=jnp.asarray(pe),
        negative_prompt_embeds=jnp.asarray(ne),
        image_embeds=jnp.asarray(img_e),
        height=HEIGHT,
        width=WIDTH,
        num_frames=NUM_FRAMES,
        num_inference_steps=STEPS,
        guidance_scale=GUIDANCE,
        output_type="latent",
        noise_source=NoiseSource(seed=42),
        last_image=last,
        **alg_kw,
    )

    assert lat_j.shape == lat_t.shape
    np.testing.assert_allclose(np.asarray(lat_j), lat_t, atol=2e-3, rtol=1e-4)

    vid_j = np.asarray(pipe.decode_latents(jnp.asarray(lat_j)))
    assert vid_j.shape == vid_t.shape
    psnr = _psnr(vid_j, vid_t)
    assert psnr > 40.0, f"decoded-frame PSNR {psnr:.1f} dB <= 40"
