"""Wan2.1-I2V + ALG pipeline — jit-compiled TPU sampler.

Reproduces the reference ``WanImageToVideoPipeline`` semantics
(``pipeline_wan_image2video_lowpass.py:587-968``) with the same TPU execution
plan as the CogVideoX pipeline (single jit'd segmented denoise loop, filter
operators as precomputed matrices, host-side torch-order noise):

  * layout is the reference's ``[B, C, F, h, w]``; frames coerced to 4k+1
    (``:764-769``);
  * conditioning = ``[mask(4ch) ⧺ latent_cond(16ch)]`` built from the first
    frame (+ optional ``last_image``) with argmax (mode) VAE encode and
    per-channel latents_mean/std normalization (``:372-449``);
  * latent-space ALG filters the FULL 20-channel condition including the mask
    channels — faithful quirk 2.4b (``:869-880``);
  * 2-pass vs 3-pass keyed on strength == 0 with NO exponential shortcut
    (``:882-894``); 3-pass combine ``uncond_init + g·(text − uncond)``
    (``:919-921``);
  * UMT5 text encoding with mask + per-sample trim/re-pad (``:185-224``),
    CLIP-vision penultimate hidden states as image embeds (``:226-234``);
  * UniPC scheduler (``run.py:63``), fp32 latents through the loop, final
    de-normalize + VAE decode (``:948-960``).

Quirk policy: ``guidance_scale <= 1`` raises NameError in the reference
(2.4a, unreachable) — implemented as a sane single pass.
"""

from __future__ import annotations

import dataclasses
import html
import re
from typing import Any, Callable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.alg.matrices import apply_filter_matrices
from alg_tpu.alg.schedule import LPConfig, LPPlan, build_lp_plan
from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.clip import CLIPVisionConfig, clip_preprocess, clip_vision_hidden_states
from alg_tpu.models.t5 import T5Config, t5_encode
from alg_tpu.models.wan import (
    WanTransformerConfig,
    WanVAEConfig,
    init_wan_transformer,
    wan_rope,
    wan_transformer,
    wan_vae_decode,
    wan_vae_encode,
)
from alg_tpu.pipelines import processing
from alg_tpu.schedulers import UniPCConfig, make_unipc_plan, unipc_init_state, unipc_step


def prompt_clean(text: str) -> str:
    """ftfy.fix_text + html unescape + whitespace collapse (reference :97-111;
    ftfy is optional in this environment)."""
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip()


@dataclasses.dataclass
class WanPipeline:
    transformer_cfg: WanTransformerConfig
    transformer_params: Any
    vae_cfg: WanVAEConfig
    vae_params: Any
    t5_cfg: Optional[T5Config] = None
    t5_params: Any = None
    clip_cfg: Optional[CLIPVisionConfig] = None
    clip_params: Any = None
    tokenize: Optional[Callable] = None  # (prompts, max_len) -> (ids, mask)
    scheduler_cfg: UniPCConfig = dataclasses.field(default_factory=lambda: UniPCConfig(flow_shift=5.0))
    dtype: Any = jnp.float32
    # multi-chip: mesh for shard_map'd fused attention inside the sampler
    attn_mesh: Any = None
    # sequence-parallel KV strategy when the mesh has an sp axis: "gather"
    # (all-gathered KV) or "ring" (KV chunks rotate via ppermute — ring
    # attention; O(S/sp) peak KV memory per chip)
    sp_mode: str = "gather"
    # explicit VAE-encode tiling toggle (reference ``enable_vae_tiling``
    # analog): True/False forces it; None = tile only multi-frame clips that
    # are a real HBM risk (see models/vae_tiling.auto_tile_encode)
    vae_encode_tiling: Optional[bool] = None
    # guidance micro-batching: 0 = one batched DiT forward per step (CFG/ALG
    # passes concatenated along batch — the throughput default); N>0 = run the
    # passes sequentially in micro-batches of N samples via lax.scan. Peak
    # activation memory drops ~(passes/N)×, which is what fits Wan-14B W4A8
    # (batch-3 ALG segments) in one v5e chip's 16 GB HBM; at S≈33k tokens the
    # MXU is saturated per pass, so the throughput cost is ~0 (docs/PERF.md)
    guidance_microbatch: int = 0
    # cooperative interruption (reference ``self._interrupt`` checked each
    # step): set True (e.g. from a step_observer or another thread) to stop
    # the run; chunk-granular in the production scan path, per-step with a
    # step_observer; reset at the start of every __call__ (reference :920)
    interrupt: bool = dataclasses.field(default=False, compare=False)

    @property
    def vae_scale_factor_spatial(self) -> int:
        return self.vae_cfg.spatial_scale

    @property
    def vae_scale_factor_temporal(self) -> int:
        return self.vae_cfg.temporal_scale

    # -- encoders ----------------------------------------------------------

    def encode_prompt(self, prompt, max_sequence_length: int = 512) -> jnp.ndarray:
        """UMT5 encode WITH mask; per-sample trim to real length then zero-pad
        (reference :185-224)."""
        if self.tokenize is None:
            raise ValueError("No tokenizer injected; pass prompt_embeds instead")
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        prompts = [prompt_clean(p) for p in prompts]
        ids, mask = self.tokenize(prompts, max_sequence_length)
        fn = jax.jit(lambda params, i, m: t5_encode(params, self.t5_cfg, i, m))
        embeds = np.array(fn(self.t5_params, jnp.asarray(ids), jnp.asarray(mask)))
        seq_lens = mask.sum(axis=1)
        for b, n in enumerate(seq_lens):
            embeds[b, n:] = 0.0
        return jnp.asarray(embeds, self.dtype)

    def encode_image(self, image) -> jnp.ndarray:
        """CLIP vision penultimate hidden states [B, 257, image_dim]."""
        pixels = clip_preprocess(image, self.clip_cfg.image_size)
        fn = jax.jit(
            lambda params, px: clip_vision_hidden_states(params, self.clip_cfg, px)[-2]
        )
        return fn(self.clip_params, jnp.asarray(pixels)).astype(self.dtype)

    # -- main entry --------------------------------------------------------

    def __call__(
        self,
        image=None,
        prompt: Optional[Union[str, Sequence[str]]] = None,
        negative_prompt: Optional[Union[str, Sequence[str]]] = None,
        height: int = 480,
        width: int = 832,
        num_frames: int = 81,
        num_inference_steps: int = 50,
        guidance_scale: float = 5.0,
        seed: int = 42,
        noise_source: Optional[NoiseSource] = None,
        latents: Optional[np.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        image_embeds: Optional[jnp.ndarray] = None,
        last_image=None,
        max_sequence_length: int = 512,
        output_type: str = "pil",
        attention_kwargs: Optional[dict] = None,
        # --- ALG kwargs (reference surface, :612-633) ---
        use_low_pass_guidance: bool = False,
        lp_filter_type: str = "none",
        lp_filter_in_latent: bool = True,
        lp_blur_sigma: float = 3.0,
        lp_blur_kernel_size=0.1,
        lp_resize_factor: float = 0.25,
        lp_strength_schedule_type: str = "none",
        schedule_blur_kernel_size: bool = False,
        schedule_interval_start_time: float = 0.0,
        schedule_interval_end_time: float = 1.0,
        schedule_linear_start_weight: float = 1.0,
        schedule_linear_end_weight: float = 0.0,
        schedule_linear_end_time: float = 1.0,
        schedule_exp_decay_rate: float = 5.0,
        step_observer=None,
        # preemption-safe resume (beyond-parity; see io/runstate.py)
        checkpoint=None,
        checkpoint_every: int = 8,
        # beyond-parity step caching (see cogvideox.py): DiT forward only
        # every cache_interval-th step, previous prediction reused otherwise
        # (3-pass/final steps always computed). 1 = exact.
        cache_interval: int = 1,
    ):
        # reset cooperative interruption for this run (reference :844 loop entry)
        self.interrupt = False
        cache_interval = int(cache_interval)
        if cache_interval < 1:
            raise ValueError(f"cache_interval must be >= 1, got {cache_interval}")
        if checkpoint is not None:
            from alg_tpu.io.runstate import as_checkpoint, run_fingerprint

            checkpoint = as_checkpoint(
                checkpoint,
                run_fingerprint(
                    "wan",
                    prompt=prompt,
                    negative_prompt=negative_prompt,
                    seed=seed,
                    height=height,
                    width=width,
                    num_frames=num_frames,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    has_last_image=last_image is not None,
                    # only hashed when active — exact-mode checkpoints
                    # written before this key existed stay resumable
                    **({"cache_interval": cache_interval} if cache_interval != 1 else {}),
                    alg=(
                        use_low_pass_guidance,
                        lp_filter_type,
                        lp_filter_in_latent,
                        lp_blur_sigma,
                        lp_blur_kernel_size,
                        lp_resize_factor,
                        lp_strength_schedule_type,
                        schedule_blur_kernel_size,
                        schedule_interval_start_time,
                        schedule_interval_end_time,
                        schedule_linear_start_weight,
                        schedule_linear_end_weight,
                        schedule_linear_end_time,
                        schedule_exp_decay_rate,
                    ),
                ),
                every=checkpoint_every,
            )
        processing.validate_attention_kwargs(attention_kwargs)
        # check_inputs (reference :318-370): H, W must divide 16
        if height % 16 != 0 or width % 16 != 0:
            raise ValueError(f"height and width must be divisible by 16 but are {height} and {width}.")
        if prompt is None and prompt_embeds is None:
            raise ValueError("Provide prompt or prompt_embeds.")
        if prompt is not None and prompt_embeds is not None:
            raise ValueError("Cannot forward both prompt and prompt_embeds.")
        if prompt is not None and not isinstance(prompt, (str, list, tuple)):
            raise ValueError(f"prompt must be str or list but is {type(prompt)}")
        # reference :318-370 validates the image input up front — without it
        # image=None crashes deep inside encode_image / the VAE condition
        # build (VERDICT r1 weak #8). The image is always required: even with
        # image_embeds supplied, the 20-channel mask+latent condition is
        # VAE-encoded from the image pixels (:402-434).
        if image is None:
            raise ValueError("Provide image (image_embeds only replaces the CLIP-vision embeds).")
        if negative_prompt is not None and not isinstance(negative_prompt, (str, list, tuple)):
            raise ValueError(f"negative_prompt must be str or list but is {type(negative_prompt)}")

        do_cfg = guidance_scale > 1.0
        noise = noise_source or NoiseSource(seed=seed)

        # frames coerced to k·4+1 (reference :764-769)
        tscale = self.vae_scale_factor_temporal
        if num_frames % tscale != 1:
            num_frames = num_frames // tscale * tscale + 1
        num_frames = max(num_frames, 1)
        f_lat = (num_frames - 1) // tscale + 1
        h_lat = height // self.vae_scale_factor_spatial
        w_lat = width // self.vae_scale_factor_spatial
        zc = self.vae_cfg.z_dim

        # ---- text / image encoders
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt, max_sequence_length)
        if do_cfg and negative_prompt_embeds is None:
            neg = negative_prompt if negative_prompt is not None else ""
            negative_prompt_embeds = self.encode_prompt(
                [neg] * prompt_embeds.shape[0] if isinstance(neg, str) else neg, max_sequence_length
            )
        batch_size = prompt_embeds.shape[0]
        if image_embeds is None:
            image_embeds = self.encode_image(image)

        # ---- initial noise [B, z, F_lat, h, w] fp32 (reference :397-398)
        if latents is None:
            latents0 = noise.randn((batch_size, zc, f_lat, h_lat, w_lat))
        else:
            latents0 = np.asarray(latents, np.float32)
        latents0 = jnp.asarray(latents0, jnp.float32)

        # ---- condition: [mask(4) ⧺ normalized latent_cond(16)] (:402-449)
        if image is not None and not isinstance(image, np.ndarray):
            image_tensor = processing.preprocess_image(image, height, width)
        else:
            image_tensor = np.asarray(image, np.float32)
        condition = self._build_condition(image_tensor, batch_size, num_frames, height, width, last_image)

        # ---- plans
        sched_plan = make_unipc_plan(self.scheduler_cfg, num_inference_steps)
        lp_cfg = LPConfig(
            use_low_pass_guidance=use_low_pass_guidance and do_cfg,
            lp_filter_type=lp_filter_type,
            lp_filter_in_latent=lp_filter_in_latent,
            lp_blur_sigma=lp_blur_sigma,
            lp_blur_kernel_size=lp_blur_kernel_size,
            lp_resize_factor=lp_resize_factor,
            lp_strength_schedule_type=lp_strength_schedule_type,
            schedule_blur_kernel_size=schedule_blur_kernel_size,
            schedule_interval_start_time=schedule_interval_start_time,
            schedule_interval_end_time=schedule_interval_end_time,
            schedule_linear_start_weight=schedule_linear_start_weight,
            schedule_linear_end_weight=schedule_linear_end_weight,
            schedule_linear_end_time=schedule_linear_end_time,
            schedule_exp_decay_rate=schedule_exp_decay_rate,
        )
        filter_h, filter_w = (h_lat, w_lat) if lp_filter_in_latent else (height, width)
        # Wan has no exponential 2-pass shortcut (:882)
        lp_plan = build_lp_plan(lp_cfg, num_inference_steps, filter_h, filter_w, exp_shortcut=False)

        pixel_mode = lp_plan.active and not lp_filter_in_latent
        pixel_image = None
        pixel_vae_noise = None
        if pixel_mode:
            pixel_image = jnp.asarray(image_tensor[:, None], jnp.float32)  # [B,1,C,H,W]
            pixel_vae_noise = jnp.asarray(
                np.stack(
                    [
                        noise.randn((batch_size, zc, f_lat, h_lat, w_lat)).transpose(0, 2, 3, 4, 1)
                        for _ in range(num_inference_steps)
                    ]
                )
            )

        latents_out = self._sample(
            latents0,
            condition,
            prompt_embeds,
            negative_prompt_embeds,
            image_embeds,
            sched_plan,
            lp_plan,
            guidance_scale,
            do_cfg,
            num_frames,
            pixel_image,
            pixel_vae_noise,
            step_observer=step_observer,
            checkpoint=checkpoint,
            cache_interval=cache_interval,
        )

        if output_type == "latent":
            return np.asarray(latents_out)

        video = self.decode_latents(latents_out)  # [B, C, F, H, W]
        return processing.postprocess_video(np.asarray(video).transpose(0, 2, 1, 3, 4), output_type)

    # -- condition construction -------------------------------------------

    def _mask_block(self, batch_size, num_frames, f_lat, h_lat, w_lat, last_image=None) -> np.ndarray:
        """[B, 4, F_lat, h, w] mask: ones on conditioned pixel frames, first
        frame repeated ×4, reshaped (reference :436-447)."""
        t = self.vae_scale_factor_temporal
        mask = np.ones((batch_size, 1, num_frames, h_lat, w_lat), np.float32)
        if last_image is None:
            mask[:, :, 1:] = 0.0
        else:
            mask[:, :, 1:-1] = 0.0
        first = np.repeat(mask[:, :, 0:1], t, axis=2)
        mask = np.concatenate([first, mask[:, :, 1:]], axis=2)  # [B,1,F+3,h,w]
        mask = mask.reshape(batch_size, -1, t, h_lat, w_lat).transpose(0, 2, 1, 3, 4)
        return mask  # [B, t=4, F_lat, h, w]

    def _vae_dtype(self):
        """Dtype the VAE weights are stored in — convs run in it, matching
        the reference (fp32 for Wan's faithful config, `run.py:51-55`)."""
        leaves = jax.tree_util.tree_leaves(self.vae_params)
        return leaves[0].dtype if leaves else jnp.float32

    def _encode_video_condition_p(self, vae_params, video_bfchw: jnp.ndarray) -> jnp.ndarray:
        """argmax (mode) VAE encode + latents_mean/std normalize → [B,z,F',h,w].

        The full-frame-count condition video (first frame + zeros, :402-412)
        is the biggest encode in the system — 81f@480×832 won't fit HBM
        untiled, so it goes through overlapping spatial tiles."""
        from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

        x = video_bfchw.transpose(0, 1, 3, 4, 2).astype(self._vae_dtype())  # BFHWC
        if getattr(self, "_enc_jit", None) is None:
            self._enc_jit = jax.jit(
                lambda params, xt: wan_vae_encode(params, self.vae_cfg, xt)[0]
            )
        if auto_tile_encode(x.shape[1], x.shape[2], x.shape[3], self.vae_encode_tiling):
            # each tile is its OWN jitted program, dispatched from the host
            # loop in tiled_encode: tracing the whole tile grid into one
            # program makes XLA hold every tile's encoder activations
            # concurrently (measured 49 GB at the 81f@480x832 condition —
            # r5 e2e bench finding); per-tile dispatch peaks at one tile
            mean = tiled_encode(
                lambda xt: self._enc_jit(vae_params, xt), x, self.vae_cfg.spatial_scale
            )
        else:
            mean = self._enc_jit(vae_params, x)
        z = mean.astype(jnp.float32).transpose(0, 4, 1, 2, 3)  # [B, z, F', h, w]
        lm = jnp.asarray(self.vae_cfg.latents_mean, jnp.float32).reshape(1, -1, 1, 1, 1)
        ls = jnp.asarray(self.vae_cfg.latents_std, jnp.float32).reshape(1, -1, 1, 1, 1)
        return (z - lm) / ls

    def _build_condition(self, image_tensor, batch_size, num_frames, height, width, last_image):
        img = jnp.asarray(image_tensor, jnp.float32)[:, None]  # [B,1,C,H,W]
        if last_image is None:
            zeros = jnp.zeros((img.shape[0], num_frames - 1) + img.shape[2:], jnp.float32)
            video = jnp.concatenate([img, zeros], axis=1)
        else:
            last = jnp.asarray(
                processing.preprocess_image(last_image, height, width)
                if not isinstance(last_image, np.ndarray)
                else last_image,
                jnp.float32,
            )[:, None]
            zeros = jnp.zeros((img.shape[0], num_frames - 2) + img.shape[2:], jnp.float32)
            video = jnp.concatenate([img, zeros, last], axis=1)
        # NOT wrapped in an outer jit: the tiled branch of
        # _encode_video_condition_p must dispatch per-tile programs (see its
        # comment); the per-call jits inside cover the compute
        latent_cond = self._encode_video_condition_p(self.vae_params, video)
        if latent_cond.shape[0] < batch_size:
            latent_cond = jnp.repeat(latent_cond, batch_size, axis=0)
        f_lat, h_lat, w_lat = latent_cond.shape[2:]
        mask = self._mask_block(batch_size, num_frames, f_lat, h_lat, w_lat, last_image)
        return jnp.concatenate([jnp.asarray(mask), latent_cond], axis=1)  # [B, 20, F', h, w]

    # -- sampler -----------------------------------------------------------

    def _sample(
        self,
        latents0,
        condition,
        prompt_embeds,
        negative_prompt_embeds,
        image_embeds,
        sched_plan,
        lp_plan: LPPlan,
        guidance_scale,
        do_cfg,
        num_frames,
        pixel_image,
        pixel_vae_noise,
        step_observer=None,
        checkpoint=None,
        cache_interval: int = 1,
        stop_after=None,
    ):
        tcfg = self.transformer_cfg
        alg = lp_plan.active
        use_cache = cache_interval > 1
        pixel_mode = pixel_image is not None
        batch = latents0.shape[0]
        f_lat, h_lat, w_lat = latents0.shape[2:]

        # host-side tables stay numpy closures; every device array is a jit
        # ARGUMENT (closed-over device arrays become MLIR constants whose
        # lowering needs a device→host fetch — rejected by the axon tunnel)
        rope_cos, rope_sin = wan_rope(tcfg, f_lat, h_lat, w_lat)

        if do_cfg:
            embeds2 = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            embeds3 = (
                jnp.concatenate(
                    [negative_prompt_embeds, negative_prompt_embeds, prompt_embeds], axis=0
                )
                if alg
                else None
            )
        else:
            embeds2 = prompt_embeds
            embeds3 = None

        m_h = lp_plan.m_h if alg else None  # numpy
        m_w = lp_plan.m_w if alg else None
        m_idx = lp_plan.m_idx if alg else None
        lm_np = np.asarray(self.vae_cfg.latents_mean, np.float32).reshape(1, -1, 1, 1, 1)
        ls_np = np.asarray(self.vae_cfg.latents_std, np.float32).reshape(1, -1, 1, 1, 1)
        ts_np = np.asarray(sched_plan.timesteps)

        def lp_condition(i, data):
            if not alg:
                return data["condition"]
            mh = jnp.asarray(m_h)[jnp.asarray(m_idx)[i]]
            mw = jnp.asarray(m_w)[jnp.asarray(m_idx)[i]]
            if not pixel_mode:
                # latent branch filters the whole 20-ch condition, incl. the
                # mask channels (faithful quirk 2.4b)
                return apply_filter_matrices(data["condition"], mh, mw)
            # pixel branch: filter RGB → rebuild mask+latent condition with a
            # per-step posterior draw (:493-540)
            rgb = apply_filter_matrices(data["pixel_image"], mh, mw)
            zeros = jnp.zeros((rgb.shape[0], num_frames - 1) + rgb.shape[2:], jnp.float32)
            video = jnp.concatenate([rgb, zeros], axis=1).transpose(0, 1, 3, 4, 2)
            video = video.astype(self._vae_dtype())
            from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

            if auto_tile_encode(
                video.shape[1], video.shape[2], video.shape[3], self.vae_encode_tiling
            ):
                mean, logvar = tiled_encode(
                    lambda xt: wan_vae_encode(data["vae_params"], self.vae_cfg, xt),
                    video,
                    self.vae_cfg.spatial_scale,
                )
            else:
                mean, logvar = wan_vae_encode(data["vae_params"], self.vae_cfg, video)
            mean, logvar = mean.astype(jnp.float32), logvar.astype(jnp.float32)
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = (mean + std * data["pixel_vae_noise"][i]).transpose(0, 4, 1, 2, 3)
            z = (z - jnp.asarray(lm_np)) / jnp.asarray(ls_np)
            mask = data["condition"][:, :4]  # identical mask construction (:530-540)
            return jnp.concatenate([mask, z], axis=1)

        gmb = int(self.guidance_microbatch or 0)

        def dit(tparams, lat_in, cond_in, embeds, img_embeds, t):
            x = jnp.concatenate([lat_in, cond_in], axis=1).astype(self.dtype)

            def fwd(xb, eb, ib):
                out = wan_transformer(
                    tparams,
                    tcfg,
                    xb,
                    jnp.broadcast_to(t, (xb.shape[0],)).astype(jnp.float32),
                    eb.astype(self.dtype),
                    None if ib is None else ib.astype(self.dtype),
                    rope_cos,
                    rope_sin,
                )
                return out.astype(jnp.float32)

            n = x.shape[0]
            if gmb and 0 < gmb < n and n % gmb == 0:
                # sequential guidance passes: scan over [n/gmb, gmb, ...] stacks
                # so the DiT traces once and only one micro-batch of
                # activations is live at a time (bit-identical per sample —
                # batch is a parallel dim everywhere; tests/test_pipeline_wan)
                def split(a):
                    return None if a is None else a.reshape(n // gmb, gmb, *a.shape[1:])

                _, outs = jax.lax.scan(
                    lambda _, mb: (None, fwd(*mb)),
                    None,
                    (split(x), split(embeds), split(img_embeds)),
                )
                return outs.reshape(n, *outs.shape[2:])
            return fwd(x, embeds, img_embeds)

        # step-cache schedule (beyond-parity; see cogvideox.py _sample): full
        # DiT forward every cache_interval-th step + the final step + every
        # ALG 3-pass step; cached steps reuse the previous prediction
        if use_cache:
            from alg_tpu.alg.schedule import build_cache_schedule

            compute_np = build_cache_schedule(
                len(ts_np), cache_interval, lp_plan.strengths if alg else None
            )

        def step_fn(carry, i, three_pass: bool, data):
            if use_cache:
                latents, state, prev_pred = carry
            else:
                latents, state = carry
                prev_pred = None
            t = jnp.asarray(ts_np)[i].astype(jnp.float32)
            tparams = data["tparams"]
            condition_in = data["condition"]
            img = data["image_embeds"]

            def predict(_):
                cond = lp_condition(i, data)
                if not do_cfg:
                    return dit(tparams, latents, cond, data["embeds2"], img, t)
                if three_pass:
                    lat_in = jnp.concatenate([latents] * 3, axis=0)
                    cond_in = jnp.concatenate([condition_in, cond, cond], axis=0)
                    pred = dit(tparams, lat_in, cond_in, data["embeds3"], jnp.concatenate([img] * 3, axis=0), t)
                    uncond_init, uncond, text = pred[:batch], pred[batch : 2 * batch], pred[2 * batch :]
                    return uncond_init + guidance_scale * (text - uncond)
                # strength-0 steps condition on the *clean* condition (:884-888)
                lat_in = jnp.concatenate([latents] * 2, axis=0)
                cond_in = jnp.concatenate([condition_in, condition_in], axis=0)
                pred = dit(tparams, lat_in, cond_in, data["embeds2"], jnp.concatenate([img] * 2, axis=0), t)
                uncond, text = pred[:batch], pred[batch:]
                return uncond + guidance_scale * (text - uncond)

            if use_cache and not three_pass:
                noise_pred = jax.lax.cond(
                    jnp.asarray(compute_np)[i], predict, lambda _: prev_pred, None
                )
            else:
                noise_pred = predict(None)
            new_latents, new_state = unipc_step(sched_plan, i, noise_pred, latents, state)
            new_carry = (new_latents.astype(jnp.float32), new_state)
            if use_cache:
                new_carry = new_carry + (noise_pred,)
            return new_carry, ()

        import functools as _ft

        from alg_tpu.core.device import seg_chunk

        def _range_runner(tp):
            @_ft.partial(jax.jit, static_argnames=("n",))
            def run_range(carry, data, start, n):
                body = lambda c, i: step_fn(c, i, tp, data)
                return jax.lax.scan(body, carry, start + jnp.arange(n))[0]

            return run_range

        run2, run3 = _range_runner(False), _range_runner(True)

        def init_carry(latents):
            carry = (latents, unipc_init_state(sched_plan, latents.shape))
            if use_cache:
                carry = carry + (jnp.zeros_like(latents),)  # prev noise_pred
            return carry

        def run(data):
            # chunked dispatch (bounded XLA programs, no host fetches between
            # chunks — see core/device.SCAN_CHUNK); UniPC state rides the carry
            carry = init_carry(data["latents0"])
            start = 0
            if checkpoint is not None:
                start, carry = checkpoint.restore(carry)
            for seg in lp_plan.segments:
                if seg.stop <= start:
                    continue
                runner = run3 if (seg.three_pass and do_cfg and alg) else run2
                i = max(seg.start, start)
                chunk = seg_chunk(seg.stop - i)
                while i < seg.stop:
                    if self.interrupt:
                        return carry[0]
                    n = min(chunk, seg.stop - i)
                    carry = runner(carry, data, jnp.int32(i), n)
                    i += n
                    if checkpoint is not None:
                        checkpoint.maybe_save(i, carry)
                    if stop_after is not None and i >= stop_after:
                        # bench warm-up hook (host-side, never traced):
                        # see cogvideox._sample
                        return carry[0]
            if checkpoint is not None:
                checkpoint.complete()
            return carry[0]

        data = {
            "latents0": latents0,
            "condition": condition,
            "embeds2": embeds2,
            "embeds3": embeds3,
            "image_embeds": image_embeds,
            "tparams": self.transformer_params,
            "vae_params": self.vae_params if pixel_mode else None,
            "pixel_image": pixel_image,
            "pixel_vae_noise": pixel_vae_noise,
        }
        import contextlib

        from alg_tpu.ops.attention import attention_mesh_scope

        ctx = (
            attention_mesh_scope(self.attn_mesh, seq_axis="sp", seq_mode=self.sp_mode)
            if self.attn_mesh is not None
            else contextlib.nullcontext()
        )
        with ctx:
            if step_observer is not None:
                # debug/monitoring path (reference callback_on_step_end,
                # ...wan...py:929-941): host-stepped loop, one jitted step per
                # pass-count; each step syncs to invoke the observer
                step2 = jax.jit(lambda c, i, d: step_fn(c, i, False, d)[0])
                step3 = jax.jit(lambda c, i, d: step_fn(c, i, True, d)[0])
                carry = init_carry(data["latents0"])
                start = 0
                if checkpoint is not None:
                    start, carry = checkpoint.restore(carry)
                for seg in lp_plan.segments:
                    if seg.stop <= start:
                        continue
                    f = step3 if (seg.three_pass and do_cfg and alg) else step2
                    for i in range(max(seg.start, start), seg.stop):
                        if self.interrupt:
                            return carry[0]
                        carry = f(carry, i, data)
                        # mutating observer (reference :935): a returned array
                        # or {"latents": ...} replaces the carry
                        ret = step_observer(i, np.asarray(carry[0]))
                        if ret is not None:
                            new_lat = ret.get("latents") if isinstance(ret, dict) else ret
                            if new_lat is not None:
                                carry = (
                                    jnp.asarray(new_lat, carry[0].dtype).reshape(carry[0].shape),
                                ) + carry[1:]
                        if checkpoint is not None:
                            checkpoint.maybe_save(i + 1, carry)
                if checkpoint is not None:
                    checkpoint.complete()
                return carry[0]
            return run(data)

    def decode_latents(self, latents, vae_tiling=None) -> jnp.ndarray:
        """De-normalize + VAE decode (:948-960) → [B, C, F, H, W] in [-1,1].
        Tiled above 48×48 latents (replaces diffusers enable_tiling)."""
        from alg_tpu.models.vae_tiling import tiled_decode

        lm = jnp.asarray(np.asarray(self.vae_cfg.latents_mean, np.float32)).reshape(1, -1, 1, 1, 1)
        ls = jnp.asarray(np.asarray(self.vae_cfg.latents_std, np.float32)).reshape(1, -1, 1, 1, 1)
        z = latents.astype(jnp.float32) * ls + lm
        z = z.transpose(0, 2, 3, 4, 1).astype(self._vae_dtype())  # BFHWC
        fn = jax.jit(lambda params, z: wan_vae_decode(params, self.vae_cfg, z))
        if vae_tiling is None:
            vae_tiling = z.shape[2] * z.shape[3] > 48 * 48
        if vae_tiling:
            frames = tiled_decode(
                lambda zt: fn(self.vae_params, zt), z, self.vae_cfg.spatial_scale,
                mesh=self.attn_mesh,  # tile grid spreads over the serving mesh
            )
        else:
            frames = fn(self.vae_params, z)
        return frames.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
