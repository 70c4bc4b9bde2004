"""End-to-end CogVideoX mini-pipeline golden (VERDICT r2 missing #1).

Every leaf (DiT, VAE, scheduler, filter, schedule) already has an independent
vendored-torch golden; this test closes the last self-validated seam — the
*orchestration glue* — by re-implementing the reference pipeline's ``__call__``
in test-local torch at tiny scale, line by line from
``/root/reference/pipeline_cogvideox_image2video_lowpass.py``:

* ``prepare_latents`` (:352-425): per-sample VAE encode +
  ``latent_dist.sample(generator)``, ``invert_scale_latents`` scaling, zero-pad
  of the image latent to all frames, CogVideoX-1.5 ``patch_size_t`` front-pad,
  ``randn_tensor`` initial noise × ``init_noise_sigma``;
* ``prepare_lp`` latent branch (:682-699): permute → the ACTUAL reference
  ``lp_utils.apply_low_pass_filter`` (imported from /root/reference) →
  permute back → ``patch_size_t`` re-pad;
* the denoise loop (:1005-1140): host ``get_lp_strength`` (actual reference),
  strength→parameter modulation (:1034-1040), the exponential <0.1 shortcut
  (:1031-1032), 2/3-pass batch assembly with ``[neg,neg,pos]`` embeds
  (:948-955) and ``[clean, LP, LP]`` channel-concat conditioning (:1060-1070),
  3-pass combine ``uncond_init + g·(text − uncond)`` (:1099-1102), dynamic-CFG
  cosine ramp (:1105-1108), DDIM / DPM(+old_pred threading, per-step generator
  noise) stepping (:1111-1122);
* ``decode_latents`` (:428-433) with padding-frame drop (:1144-1146).

The torch model/VAE forwards are the already-golden vendored implementations
(test_dit_torch_golden / test_vae_torch_golden), run in float64; both sides
draw from the same torch-CPU stream (bit-exact ``NoiseSource``). Pass
criteria per VERDICT: final latents allclose in fp32 AND PSNR > 40 dB on
decoded frames, ALG on and off, plus the DPM and patch_size_t variants.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_dit_torch_golden as ditref
import test_vae_torch_golden as vaeref
from test_scheduler_torch_golden import TorchCogVideoXDPM, TorchDDIM
from test_reference_parity import ref_lp_utils  # fixture: actual /root/reference/lp_utils

from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    CogVideoXVAEConfig,
    cogvideox_rope,
    init_cogvideox_transformer,
    init_cogvideox_vae,
)
from alg_tpu.pipelines import CogVideoXPipeline
from alg_tpu.schedulers.ddim_cogvideox import CogVideoXDDIMConfig

_ = ref_lp_utils  # (fixture reexport for pytest)


def _psnr(a, b, peak=2.0):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(peak * peak / mse) if mse > 0 else np.inf


HEIGHT = WIDTH = 32
ALG_KW = dict(
    use_low_pass_guidance=True,
    lp_filter_type="down_up",
    lp_filter_in_latent=True,
    lp_resize_factor=0.25,
    lp_strength_schedule_type="interval",
    schedule_interval_start_time=0.0,
    schedule_interval_end_time=0.4,  # 4 steps → steps 0,1 are 3-pass
)


def _build(patch_size_t=None):
    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=2,
        attention_head_dim=16,
        in_channels=8,
        out_channels=4,
        time_embed_dim=24,
        text_embed_dim=12,
        num_layers=2,
        sample_height=HEIGHT // 8,
        sample_width=WIDTH // 8,
        max_text_seq_length=5,
        patch_size_t=patch_size_t,
    )
    vcfg = CogVideoXVAEConfig(
        block_out_channels=(8, 8, 16, 16), latent_channels=4, layers_per_block=1,
        norm_num_groups=4,
    )
    tparams = ditref._randomize(init_cogvideox_transformer(jax.random.PRNGKey(0), tcfg), seed=7)
    vparams = vaeref._randomize(init_cogvideox_vae(jax.random.PRNGKey(4), vcfg), seed=21, scale=0.25)
    return tcfg, vcfg, tparams, vparams


def _torch_mini_pipeline(
    lp_utils,
    tcfg,
    vcfg,
    tparams,
    vparams,
    *,
    image_bchw,
    prompt_embeds,
    negative_prompt_embeds,
    num_frames,
    num_inference_steps,
    guidance_scale,
    seed,
    scheduler="ddim",
    use_dynamic_cfg=False,
    use_low_pass_guidance=False,
    lp_filter_type="none",
    lp_filter_in_latent=True,
    lp_blur_sigma=3.0,
    lp_blur_kernel_size=0.1,
    lp_resize_factor=0.25,
    lp_strength_schedule_type="none",
    schedule_blur_kernel_size=False,
    schedule_interval_start_time=0.0,
    schedule_interval_end_time=1.0,
    schedule_linear_start_weight=1.0,
    schedule_linear_end_weight=0.0,
    schedule_linear_end_time=1.0,
    schedule_exp_decay_rate=5.0,
):
    """Reference ``__call__`` orchestration in torch float64 (draws in f32)."""
    generator = torch.Generator()
    generator.manual_seed(seed)
    scfg = CogVideoXDDIMConfig()
    vae_scale_t = vcfg.temporal_compression_ratio
    scaling = vcfg.scaling_factor
    do_cfg = guidance_scale > 1.0
    patch_size_t = tcfg.patch_size_t

    # ---- embeds assembly (:948-955)
    pe = torch.tensor(np.asarray(prompt_embeds, np.float64))
    ne = torch.tensor(np.asarray(negative_prompt_embeds, np.float64))
    if do_cfg and use_low_pass_guidance:
        prompt_embeds_3 = torch.cat([ne, ne, pe], dim=0)
        prompt_embeds_init = torch.cat([ne, pe], dim=0)
    elif do_cfg:
        prompt_embeds_3 = prompt_embeds_init = torch.cat([ne, pe], dim=0)
    else:
        prompt_embeds_3 = prompt_embeds_init = pe

    # ---- frame geometry (:962-968)
    latent_frames = (num_frames - 1) // vae_scale_t + 1
    additional_frames = 0
    if patch_size_t is not None and latent_frames % patch_size_t != 0:
        additional_frames = patch_size_t - latent_frames % patch_size_t
        num_frames += additional_frames * vae_scale_t

    image_tensor = torch.tensor(np.asarray(image_bchw, np.float64))  # [B,C,H,W]
    batch_size = image_tensor.shape[0]

    # ---- prepare_latents (:352-425)
    lat_frames_total = (num_frames - 1) // vae_scale_t + 1
    shape = (batch_size, lat_frames_total, vcfg.latent_channels, HEIGHT // 8, WIDTH // 8)
    if patch_size_t is not None:
        shape = shape[:1] + (shape[1] + shape[1] % patch_size_t,) + shape[2:]

    image_5d = image_tensor.unsqueeze(2)  # [B, C, 1, H, W]
    samples = []
    for b in range(batch_size):
        mean, logvar = vaeref.torch_cog_vae_encode(vparams, vcfg, image_5d[b:b + 1])
        std = torch.exp(0.5 * torch.clamp(logvar, -30.0, 20.0))
        eps = torch.randn(mean.shape, generator=generator, dtype=torch.float32).double()
        samples.append(mean + std * eps)
    image_latents = torch.cat(samples, dim=0).permute(0, 2, 1, 3, 4)  # [B,F,C,h,w]
    if not vcfg.invert_scale_latents:
        image_latents = scaling * image_latents
    else:
        image_latents = 1 / scaling * image_latents
    pad = torch.zeros(
        (batch_size, lat_frames_total - 1) + image_latents.shape[2:], dtype=torch.float64
    )
    image_latents = torch.cat([image_latents, pad], dim=1)
    if patch_size_t is not None:
        first = image_latents[:, : image_latents.size(1) % patch_size_t]
        image_latents = torch.cat([first, image_latents], dim=1)

    latents = torch.randn(shape, generator=generator, dtype=torch.float32).double()
    # × scheduler.init_noise_sigma (:424) — 1.0 for CogVideoX DDIM/DPM

    # ---- rope (:991-995); shared precompute, the tables themselves are
    # independently golden-tested in test_dit_torch_golden
    rope_cos, rope_sin = cogvideox_rope(tcfg, HEIGHT, WIDTH, latents.shape[1])

    # ---- schedulers
    ddim = TorchDDIM(scfg, num_inference_steps)
    dpm = TorchCogVideoXDPM(scfg, num_inference_steps)
    timesteps = ddim.timesteps
    old_x0 = None

    def prepare_lp_pixel(mod_sigma, mod_kernel, mod_resize):
        """Reference prepare_lp pixel branch (:628-680): filter RGB → VAE
        encode → posterior draw (generator order!) → scale → pad frames →
        patch_size_t front-pad."""
        image_lp = lp_utils.apply_low_pass_filter(
            image_tensor,
            filter_type=lp_filter_type,
            blur_sigma=mod_sigma,
            blur_kernel_size=mod_kernel,
            resize_factor=mod_resize,
        )
        mean, logvar = vaeref.torch_cog_vae_encode(vparams, vcfg, image_lp.unsqueeze(2))
        std = torch.exp(0.5 * torch.clamp(logvar, -30.0, 20.0))
        eps = torch.randn(mean.shape, generator=generator, dtype=torch.float32).double()
        enc = mean + std * eps  # [B, z, 1, h, w]
        if not vcfg.invert_scale_latents:
            enc = scaling * enc
        else:
            enc = 1 / scaling * enc
        enc = enc.permute(0, 2, 1, 3, 4)
        padded_frames = (num_frames - 1) // vae_scale_t + 1
        if padded_frames > enc.shape[1]:
            padz = torch.zeros(
                (batch_size, padded_frames - enc.shape[1]) + enc.shape[2:], dtype=torch.float64
            )
            lp_lat = torch.cat([enc, padz], dim=1)
        else:
            lp_lat = enc[:, :padded_frames]
        if patch_size_t is not None:
            rem = lp_lat.size(1) % patch_size_t
            if rem != 0:
                n_pre = min(patch_size_t - rem, lp_lat.shape[1])
                lp_lat = torch.cat([lp_lat[:, :n_pre], lp_lat], dim=1)
        return lp_lat

    guidance = guidance_scale
    for i, t in enumerate(timesteps):
        two_pass = True
        if do_cfg and use_low_pass_guidance:
            lp_strength = lp_utils.get_lp_strength(
                step_index=i,
                total_steps=num_inference_steps,
                lp_strength_schedule_type=lp_strength_schedule_type,
                schedule_interval_start_time=schedule_interval_start_time,
                schedule_interval_end_time=schedule_interval_end_time,
                schedule_linear_start_weight=schedule_linear_start_weight,
                schedule_linear_end_weight=schedule_linear_end_weight,
                schedule_linear_end_time=schedule_linear_end_time,
                schedule_exp_decay_rate=schedule_exp_decay_rate,
            )
            two_pass = lp_strength == 0
            if lp_strength_schedule_type == "exponential" and lp_strength < 0.1:
                two_pass = True
            mod_sigma = lp_blur_sigma * lp_strength
            mod_kernel = (
                lp_blur_kernel_size * lp_strength
                if schedule_blur_kernel_size
                else lp_blur_kernel_size
            )
            mod_resize = 1.0 - (1.0 - lp_resize_factor) * lp_strength

            if lp_filter_in_latent:
                # prepare_lp latent branch (:682-699)
                perm = image_latents.permute(0, 2, 1, 3, 4).contiguous()
                lp_lat = lp_utils.apply_low_pass_filter(
                    perm,
                    filter_type=lp_filter_type,
                    blur_sigma=mod_sigma,
                    blur_kernel_size=mod_kernel,
                    resize_factor=mod_resize,
                )
                lp_lat = lp_lat.permute(0, 2, 1, 3, 4).contiguous()
                if patch_size_t is not None:
                    rem = lp_lat.size(1) % patch_size_t
                    if rem != 0:
                        n_pre = min(patch_size_t - rem, lp_lat.shape[1])
                        lp_lat = torch.cat([lp_lat[:, :n_pre], lp_lat], dim=1)
            else:
                lp_lat = prepare_lp_pixel(mod_sigma, mod_kernel, mod_resize)

            if two_pass:
                lmi = torch.cat([latents] * 2)
                lmi = torch.cat([lmi, torch.cat([lp_lat] * 2, dim=0)], dim=2)
            else:
                lmi = torch.cat([latents] * 3)
                lmi = torch.cat(
                    [lmi, torch.cat([image_latents, lp_lat, lp_lat], dim=0)], dim=2
                )
            embeds = prompt_embeds_init if two_pass else prompt_embeds_3
        elif do_cfg:
            lmi = torch.cat([latents] * 2)
            lmi = torch.cat([lmi, torch.cat([image_latents] * 2, dim=0)], dim=2)
            embeds = prompt_embeds_init
        else:
            lmi = torch.cat([latents, image_latents], dim=2)
            embeds = prompt_embeds_init

        timestep = torch.full((lmi.shape[0],), float(t), dtype=torch.float64)
        noise_pred = ditref._torch_cogvideox(
            tparams, tcfg, lmi, embeds, timestep, rope_cos, rope_sin
        )
        noise_pred = torch.as_tensor(np.asarray(noise_pred), dtype=torch.float64)

        if use_low_pass_guidance and do_cfg:
            if two_pass:
                uncond, text = noise_pred.chunk(2)
                noise_pred = uncond + guidance_scale * (text - uncond)
            else:
                uncond_init, uncond, text = noise_pred.chunk(3)
                noise_pred = uncond_init + guidance_scale * (text - uncond)
        elif do_cfg:
            uncond, text = noise_pred.chunk(2)
            if use_dynamic_cfg:
                guidance = 1 + guidance_scale * (
                    (1 - np.cos(np.pi * ((num_inference_steps - float(t)) / num_inference_steps) ** 5.0)) / 2
                )
            noise_pred = uncond + guidance * (text - uncond)

        if scheduler == "dpm":
            noise = torch.randn(
                tuple(latents.shape), generator=generator, dtype=torch.float32
            ).double()
            prev_t = int(t) - scfg.num_train_timesteps // num_inference_steps
            back_t = int(timesteps[i - 1]) if i > 0 else None
            latents, old_x0 = dpm.step(noise_pred, int(t), prev_t, back_t, latents, old_x0, noise)
        else:
            latents = ddim.step(noise_pred, int(t), latents)

    final_latents = latents
    dec_in = latents[:, additional_frames:]
    z = dec_in.permute(0, 2, 1, 3, 4) / scaling  # [B,C,F,h,w]
    video = vaeref.torch_cog_vae_decode(vparams, vcfg, z)  # NCDHW
    return np.asarray(final_latents), np.asarray(video.permute(0, 2, 1, 3, 4))  # [B,F,C,H,W]


def _embeds():
    r = np.random.RandomState(11)
    return (
        r.randn(1, 5, 12).astype(np.float32),
        r.randn(1, 5, 12).astype(np.float32),
    )


def _image():
    return (np.random.RandomState(7).rand(1, 3, HEIGHT, WIDTH).astype(np.float32) * 2 - 1)


@pytest.mark.parametrize(
    "scheduler,alg,patch_size_t,dynamic_cfg",
    [
        ("ddim", True, None, False),
        ("ddim", False, None, False),
        ("dpm", True, None, False),
        ("ddim", True, 2, False),
        ("ddim", False, None, True),
        ("ddim", "pixel", None, False),
    ],
    ids=["ddim-alg", "ddim-noalg", "dpm-alg", "ddim-alg-pst2", "ddim-dyncfg", "ddim-alg-pixel"],
)
def test_cogvideox_minipipeline_golden(ref_lp_utils, scheduler, alg, patch_size_t, dynamic_cfg):
    tcfg, vcfg, tparams, vparams = _build(patch_size_t)
    pe, ne = _embeds()
    img = _image()
    common = dict(
        num_frames=9,
        num_inference_steps=4,
        guidance_scale=6.0,
        seed=42,
    )
    alg_kw = dict(ALG_KW) if alg else {}
    if alg == "pixel":
        # pixel-space branch: per-step filtered-RGB VAE encode + posterior
        # draws through the same generator (reference :628-680)
        alg_kw["lp_filter_in_latent"] = False

    lat_t, vid_t = _torch_mini_pipeline(
        ref_lp_utils, tcfg, vcfg, tparams, vparams,
        image_bchw=img, prompt_embeds=pe, negative_prompt_embeds=ne,
        scheduler=scheduler, use_dynamic_cfg=dynamic_cfg, **common, **alg_kw,
    )

    pipe = CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        scheduler=scheduler,
    )
    lat_j = pipe(
        image=img,
        prompt_embeds=jnp.asarray(pe),
        negative_prompt_embeds=jnp.asarray(ne),
        height=HEIGHT,
        width=WIDTH,
        output_type="latent",
        noise_source=NoiseSource(seed=42),
        use_dynamic_cfg=dynamic_cfg,
        **common,
        **alg_kw,
    )

    assert lat_j.shape == lat_t.shape
    np.testing.assert_allclose(np.asarray(lat_j), lat_t, atol=2e-3, rtol=1e-4)

    # decode through the shipped decode path (scalings + padding-frame drop)
    add = lat_j.shape[1] - ((common["num_frames"] - 1) // vcfg.temporal_compression_ratio + 1)
    vid_j = np.asarray(pipe.decode_latents(jnp.asarray(lat_j)[:, add:]))
    assert vid_j.shape == vid_t.shape
    psnr = _psnr(vid_j, vid_t)
    assert psnr > 40.0, f"decoded-frame PSNR {psnr:.1f} dB <= 40"
