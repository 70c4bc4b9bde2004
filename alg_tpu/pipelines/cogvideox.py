"""CogVideoX-I2V + ALG pipeline — jit-compiled TPU sampler.

Reproduces the reference ``CogVideoXImageToVideoPipeline`` semantics
(``pipeline_cogvideox_image2video_lowpass.py:727-1158``) with a TPU-native
execution plan:

  * Prompt encoding (T5), VAE image encode, and VAE decode are separate jit
    functions; the *entire* denoising loop is one jit'd function per pass-count
    segment — no host round-trips between steps (replaces the reference's
    per-step Python loop + ``xm.mark_step``, ``:1005-1140``).
  * The per-step adaptive low-pass filter runs as two batched matmuls using
    the trace-time operator stacks from :mod:`alg_tpu.alg.matrices`
    (replaces ``prepare_lp`` → shape-changing resizes, ``:586-703``). The
    2-pass/3-pass CFG switch (``:1029-1070``) is resolved into contiguous step
    segments, each a fixed-shape ``lax.scan``.
  * All stochastic draws (VAE posterior sample, initial noise, DPM per-step
    noise) are generated host-side from one torch-order :class:`NoiseSource`
    (``run.py:94`` parity) and fed in as arrays.

Faithful-quirk policy (SURVEY §2.3): the 2-pass ALG branch conditions on the
*modulated-filtered* latent (identity when strength is exactly 0, non-identity
under the exponential <0.1 shortcut) — reproduced. The reference's unbound-
variable crash for ``use_low_pass_guidance=True, guidance_scale<=1`` (quirk
2.3a, unreachable with shipped configs) is replaced by the sane single-pass
path. ``num_videos_per_prompt`` is forced to 1 (``:903``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, List, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.alg.matrices import apply_filter_matrices
from alg_tpu.alg.schedule import LPConfig, LPPlan, build_lp_plan
from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.cogvideox import (
    CogVideoXTransformerConfig,
    CogVideoXVAEConfig,
    cogvideox_rope,
    cogvideox_transformer,
    cogvideox_vae_decode,
    cogvideox_vae_encode,
)
from alg_tpu.models.t5 import T5Config, t5_encode
from alg_tpu.pipelines import processing
from alg_tpu.schedulers import (
    CogVideoXDDIMConfig,
    ddim_step,
    dpm_step,
    make_ddim_plan,
    make_dpm_plan,
)


@dataclasses.dataclass
class CogVideoXPipeline:
    """Bundled model params/configs + tokenizer hook.

    ``tokenize``: callable ``prompts -> int32 [B, max_seq] ids`` (HF T5
    tokenizer with padding="max_length", truncation; injected so the pipeline
    has no network dependency). Any of the encoders may be ``None`` if the
    corresponding inputs are supplied pre-computed.
    """

    transformer_cfg: CogVideoXTransformerConfig
    transformer_params: Any
    vae_cfg: CogVideoXVAEConfig
    vae_params: Any
    t5_cfg: Optional[T5Config] = None
    t5_params: Any = None
    tokenize: Optional[Callable] = None
    scheduler: str = "ddim"  # "ddim" | "dpm"
    scheduler_cfg: CogVideoXDDIMConfig = dataclasses.field(default_factory=CogVideoXDDIMConfig)
    dtype: Any = jnp.float32
    # multi-chip: mesh for shard_map'd fused attention inside the sampler
    # (set by serving.shard_pipeline; see alg_tpu.ops.attention)
    attn_mesh: Any = None
    # sequence-parallel KV strategy when the mesh has an sp axis: "gather"
    # (all-gathered KV) or "ring" (KV chunks rotate via ppermute — ring
    # attention; O(S/sp) peak KV memory per chip)
    sp_mode: str = "gather"
    # explicit VAE-encode tiling toggle (reference ``enable_vae_tiling``
    # analog): True/False forces it; None = tile only multi-frame clips that
    # are a real HBM risk (see models/vae_tiling.auto_tile_encode)
    vae_encode_tiling: Optional[bool] = None
    # cooperative interruption (reference ``self._interrupt`` checked each
    # step): set True (e.g. from a step_observer or another thread) to stop
    # the run; granularity is one SCAN_CHUNK of steps in the production scan
    # path (per-step when a step_observer is active); the flag is reset at
    # the start of every __call__, matching the reference (:920). The partial
    # latents are returned. NOTE: in the chunked path, dispatch is async — the
    # flag stops further chunk *dispatch*; already-enqueued device work runs
    # to completion.
    interrupt: bool = dataclasses.field(default=False, compare=False)

    # fuse_qkv_projections state (reference :527-539)
    fusing_transformer: bool = dataclasses.field(default=False, compare=False)

    @property
    def vae_scale_factor_spatial(self) -> int:
        return self.vae_cfg.spatial_scale

    @property
    def vae_scale_factor_temporal(self) -> int:
        return self.vae_cfg.temporal_compression_ratio

    # -- reference API passthroughs ----------------------------------------

    def fuse_qkv_projections(self) -> None:
        """Enable fused QKV projections (reference :527-530).

        Functional no-op by design: XLA already emits one fused matmul for
        the q/k/v projections where profitable, so there is no separate
        fused-weight layout to switch to. The flag is tracked for API parity."""
        self.fusing_transformer = True

    def unfuse_qkv_projections(self) -> None:
        """Disable QKV projection fusion if enabled (reference :532-539)."""
        if not self.fusing_transformer:
            import logging

            logging.getLogger(__name__).warning(
                "The Transformer was not initially fused for QKV projections. Doing nothing."
            )
        else:
            self.fusing_transformer = False

    # -- encoders ----------------------------------------------------------

    def encode_prompt_ids(self, input_ids: np.ndarray) -> jnp.ndarray:
        """T5 encode WITHOUT attention mask (reference ``:228-268`` behavior)."""
        fn = jax.jit(lambda params, ids: t5_encode(params, self.t5_cfg, ids))
        return fn(self.t5_params, jnp.asarray(input_ids)).astype(self.dtype)

    def encode_prompt(self, prompt: Union[str, Sequence[str]], max_sequence_length: int = 226):
        if self.tokenize is None:
            raise ValueError("No tokenizer injected; pass prompt_embeds instead")
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        ids = self.tokenize(prompts, max_sequence_length)
        return self.encode_prompt_ids(ids)

    def _vae_dtype(self):
        """Dtype the VAE weights are stored in — convs run in it, like the
        reference (diffusers casts latents/pixels to ``vae.dtype``; running
        a bf16 VAE's convs in promoted fp32 was 4× slower on the MXU)."""
        leaves = jax.tree_util.tree_leaves(self.vae_params)
        return leaves[0].dtype if leaves else jnp.float32

    def vae_encode_sample(self, image_bfchw: np.ndarray, noise: NoiseSource) -> jnp.ndarray:
        """VAE-encode ``[B, F, C, H, W]`` pixels and draw the posterior sample
        with torch-ordered noise. Returns latents in [B, F, C, h, w].

        Large clips encode through overlapping spatial tiles (the reference's
        enable_tiling covers encode too, ``...hunyuan...py:601-628``); the
        posterior draw always happens on the assembled moments."""
        from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

        x = jnp.asarray(image_bfchw, self._vae_dtype()).transpose(0, 1, 3, 4, 2)  # → BFHWC
        fn = jax.jit(lambda params, x: cogvideox_vae_encode(params, self.vae_cfg, x))
        if auto_tile_encode(x.shape[1], x.shape[2], x.shape[3], self.vae_encode_tiling):
            mean, logvar = tiled_encode(
                lambda xt: fn(self.vae_params, xt), x, self.vae_cfg.spatial_scale
            )
        else:
            mean, logvar = fn(self.vae_params, x)
        mean, logvar = mean.astype(jnp.float32), logvar.astype(jnp.float32)
        # torch draws in [B, C, F, h, w] layout (diffusers DiagonalGaussian)
        b, f, h, w, c = mean.shape
        eps = noise.randn((b, c, f, h, w)).transpose(0, 2, 3, 4, 1)  # → BFHWC
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        z = mean + std * jnp.asarray(eps)
        return z.transpose(0, 1, 4, 2, 3)  # → [B, F, C, h, w]

    # -- main entry --------------------------------------------------------

    def __call__(
        self,
        image=None,
        prompt: Optional[Union[str, Sequence[str]]] = None,
        negative_prompt: Optional[Union[str, Sequence[str]]] = None,
        height: Optional[int] = None,
        width: Optional[int] = None,
        num_frames: Optional[int] = None,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        use_dynamic_cfg: bool = False,
        eta: float = 0.0,
        seed: int = 42,
        noise_source: Optional[NoiseSource] = None,
        latents: Optional[np.ndarray] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        timesteps=None,
        max_sequence_length: int = 226,
        output_type: str = "pil",
        attention_kwargs: Optional[dict] = None,
        step_observer: Optional[Callable] = None,
        # preemption-safe resume (beyond-parity; see io/runstate.py): a path
        # (or RunCheckpoint) where the sampler carry is snapshotted every
        # ``checkpoint_every`` steps; an existing snapshot with a matching
        # arg fingerprint resumes the denoise loop bitwise-identically
        checkpoint=None,
        checkpoint_every: int = 8,
        # beyond-parity accelerator (cf. DeepCache/FORA-style step caching):
        # run the full DiT forward only every ``cache_interval``-th step and
        # reuse the previous prediction on the others (ALG-active 3-pass
        # steps and the final step are always computed). 1 = exact (default).
        # >1 trades fidelity for ~cache_interval× fewer DiT FLOPs — an
        # approximation; validate per checkpoint like the int8 modes.
        cache_interval: int = 1,
        # --- ALG kwargs (reference surface, :753-773) ---
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
    ):
        # reset cooperative interruption for this run (reference :920)
        self.interrupt = False
        processing.validate_attention_kwargs(attention_kwargs)
        tcfg = self.transformer_cfg
        height = height or tcfg.sample_height * self.vae_scale_factor_spatial
        width = width or tcfg.sample_width * self.vae_scale_factor_spatial
        num_frames = num_frames or 49

        # check_inputs (reference :463-524): H, W must divide the VAE factor
        if height % 8 != 0 or width % 8 != 0:
            raise ValueError(f"height and width must be divisible by 8 but are {height} and {width}.")
        if image is None:
            raise ValueError("Provide an input image (I2V pipelines condition on it).")
        if prompt is None and prompt_embeds is None:
            raise ValueError("Provide prompt or prompt_embeds.")

        do_cfg = guidance_scale > 1.0
        noise = noise_source or NoiseSource(seed=seed)
        cache_interval = int(cache_interval)
        if cache_interval < 1:
            raise ValueError(f"cache_interval must be >= 1, got {cache_interval}")

        if checkpoint is not None:
            from alg_tpu.io.runstate import as_checkpoint, run_fingerprint

            checkpoint = as_checkpoint(
                checkpoint,
                run_fingerprint(
                    "cogvideox",
                    prompt=prompt,
                    negative_prompt=negative_prompt,
                    seed=seed,
                    height=height,
                    width=width,
                    num_frames=num_frames,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    use_dynamic_cfg=use_dynamic_cfg,
                    eta=eta,
                    timesteps=timesteps,
                    scheduler=self.scheduler,
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

        # ---- prompt embeds: [neg, pos] assembled per reference :948-955
        if prompt_embeds is None:
            prompt_embeds = self.encode_prompt(prompt, max_sequence_length)
        if do_cfg and negative_prompt_embeds is None:
            neg = negative_prompt if negative_prompt is not None else ""
            negative_prompt_embeds = self.encode_prompt(
                [neg] * prompt_embeds.shape[0] if isinstance(neg, str) else neg, max_sequence_length
            )

        batch_size = prompt_embeds.shape[0]

        # ---- frames / latent geometry (:962-968)
        latent_frames = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        patch_size_t = tcfg.patch_size_t
        additional_frames = 0
        if patch_size_t is not None and latent_frames % patch_size_t != 0:
            additional_frames = patch_size_t - latent_frames % patch_size_t
            num_frames += additional_frames * self.vae_scale_factor_temporal
            latent_frames += additional_frames

        # ---- image preprocess + VAE encode (+ zero-pad cond) (:969-985)
        if image is not None and not isinstance(image, np.ndarray):
            image_tensor = processing.preprocess_image(image, height, width)
        else:
            image_tensor = np.asarray(image, np.float32)
        if image_tensor.ndim == 4:
            image_vae_in = image_tensor[:, None]  # [B, 1, C, H, W]
        else:
            image_vae_in = image_tensor
        if image_vae_in.shape[0] < batch_size:
            image_vae_in = np.repeat(image_vae_in, batch_size, axis=0)

        image_latents = self.vae_encode_sample(image_vae_in, noise)  # [B, 1, C, h, w]
        if not self.vae_cfg.invert_scale_latents:
            image_latents = self.vae_cfg.scaling_factor * image_latents
        else:
            image_latents = image_latents / self.vae_cfg.scaling_factor
        h_lat, w_lat = image_latents.shape[-2:]
        c_lat = image_latents.shape[2]
        pad = jnp.zeros((batch_size, latent_frames - image_latents.shape[1], c_lat, h_lat, w_lat), image_latents.dtype)
        image_latents = jnp.concatenate([image_latents, pad], axis=1)
        if patch_size_t is not None:
            front = image_latents[:, : image_latents.shape[1] % patch_size_t]
            image_latents = jnp.concatenate([front, image_latents], axis=1)

        # ---- initial noise (drawn after the VAE posterior draw, :419)
        if latents is None:
            latents0 = noise.randn((batch_size, latent_frames, c_lat, h_lat, w_lat))
        else:
            latents0 = np.asarray(latents, np.float32)
        latents0 = jnp.asarray(latents0, jnp.float32)  # init_noise_sigma == 1.0

        # ---- plans (all host-side, trace-time static)
        if self.scheduler == "dpm":
            sched_plan = make_dpm_plan(self.scheduler_cfg, num_inference_steps, timesteps)
        else:
            # eta > 0: stochastic DDIM (reference prepare_extra_step_kwargs,
            # :446-461,988); per-step variance noise pre-generated below
            sched_plan = make_ddim_plan(self.scheduler_cfg, num_inference_steps, timesteps, eta=eta)
        num_inference_steps = len(np.asarray(sched_plan.timesteps))

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
        lp_plan = build_lp_plan(lp_cfg, num_inference_steps, filter_h, filter_w, exp_shortcut=True)

        # pixel-space mode re-encodes the filtered RGB through the VAE every
        # step (reference prepare_lp pixel branch, :628-680), each with its own
        # torch-ordered posterior draw — pregenerate the noise stack
        pixel_mode = lp_plan.active and not lp_filter_in_latent
        pixel_image = None
        pixel_vae_noise = None
        if pixel_mode:
            pixel_image = jnp.asarray(image_vae_in, jnp.float32)  # [B, 1, C, H, W]
            lat_shape_torch = (batch_size, c_lat, 1, h_lat, w_lat)
            pixel_vae_noise = jnp.asarray(
                np.stack(
                    [
                        noise.randn(lat_shape_torch).transpose(0, 2, 3, 4, 1)  # → BFHWC
                        for _ in range(num_inference_steps)
                    ]
                )
            )

        # per-step dynamic-CFG scale table (:1105-1108), host-precomputed
        ts = np.asarray(sched_plan.timesteps)
        if do_cfg and use_dynamic_cfg:
            g = 1 + guidance_scale * (
                (1 - np.cos(np.pi * ((num_inference_steps - ts) / num_inference_steps) ** 5.0)) / 2
            )
        else:
            g = np.full(num_inference_steps, guidance_scale)
        g_table = g.astype(np.float32)  # host table, embedded at trace time

        rope_cos, rope_sin = (
            cogvideox_rope(tcfg, height, width, latents0.shape[1])
            if tcfg.use_rotary_positional_embeddings
            else (None, None)
        )
        ofs = (
            jnp.full((1,), 2.0, jnp.float32) if tcfg.ofs_embed_dim is not None else None
        )

        # per-step in-scheduler noise stack: DPM-SDE always; DDIM when eta > 0
        # (reference draws inside scheduler.step each step — pre-generated in
        # the same order and fed to the jitted loop)
        dpm_noise = None
        if self.scheduler == "dpm" or eta > 0.0:
            dpm_noise = jnp.asarray(
                np.stack([noise.randn(latents0.shape) for _ in range(num_inference_steps)])
            )

        latents_out = self._sample(
            latents0,
            image_latents.astype(jnp.float32),
            prompt_embeds,
            negative_prompt_embeds,
            sched_plan,
            lp_plan,
            g_table,
            rope_cos,
            rope_sin,
            ofs,
            do_cfg,
            dpm_noise,
            pixel_image=pixel_image,
            pixel_vae_noise=pixel_vae_noise,
            patch_size_t=patch_size_t,
            step_observer=step_observer,
            checkpoint=checkpoint,
            cache_interval=cache_interval,
        )

        if output_type == "latent":
            return np.asarray(latents_out)

        latents_out = latents_out[:, additional_frames:]
        video = self.decode_latents(latents_out)
        return processing.postprocess_video(np.asarray(video), output_type)

    # -- sampler -----------------------------------------------------------

    def _sample(
        self,
        latents0,
        image_latents,
        prompt_embeds,
        negative_prompt_embeds,
        sched_plan,
        lp_plan: LPPlan,
        g_table,
        rope_cos,
        rope_sin,
        ofs,
        do_cfg: bool,
        dpm_noise,
        pixel_image=None,
        pixel_vae_noise=None,
        patch_size_t=None,
        step_observer=None,
        checkpoint=None,
        cache_interval: int = 1,
        stop_after=None,
    ):
        tcfg = self.transformer_cfg
        use_dpm = self.scheduler == "dpm"
        alg = lp_plan.active
        pixel_mode = pixel_image is not None
        use_cache = cache_interval > 1

        if do_cfg:
            embeds2 = jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)
            embeds3 = (
                jnp.concatenate([negative_prompt_embeds, negative_prompt_embeds, prompt_embeds], axis=0)
                if alg
                else None
            )
        else:
            embeds2 = prompt_embeds
            embeds3 = None

        # IMPORTANT: every device array reaches the jit as an ARGUMENT; only
        # host-side numpy tables (filter operators, scheduler coefficients,
        # rope, g-schedule) are closed over. Closed-over device arrays become
        # MLIR constants, whose lowering requires a device->host fetch — which
        # the axon tunnel rejects mid-queue and which would bloat the graph.
        m_h = lp_plan.m_h if alg else None  # numpy
        m_w = lp_plan.m_w if alg else None
        m_idx = lp_plan.m_idx if alg else None
        scale = self.vae_cfg.scaling_factor
        latent_frames_total = image_latents.shape[1]

        def lp_condition(i, data):
            """Per-step filtered conditioning latent (reference prepare_lp)."""
            if not alg:
                return data["image_latents"]
            mh = jnp.asarray(m_h)[jnp.asarray(m_idx)[i]]
            mw = jnp.asarray(m_w)[jnp.asarray(m_idx)[i]]
            if not pixel_mode:
                return apply_filter_matrices(data["image_latents"], mh, mw)
            # pixel branch: filter RGB → VAE encode → posterior sample →
            # scale → zero-pad frames → patch_size_t front-pad (:628-680)
            rgb = apply_filter_matrices(data["pixel_image"], mh, mw)  # [B, 1, C, H, W]
            from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

            rgb_c = rgb.transpose(0, 1, 3, 4, 2).astype(self._vae_dtype())
            if auto_tile_encode(
                rgb_c.shape[1], rgb_c.shape[2], rgb_c.shape[3], self.vae_encode_tiling
            ):
                mean, logvar = tiled_encode(
                    lambda xt: cogvideox_vae_encode(data["vae_params"], self.vae_cfg, xt),
                    rgb_c,
                    self.vae_cfg.spatial_scale,
                )
            else:
                mean, logvar = cogvideox_vae_encode(data["vae_params"], self.vae_cfg, rgb_c)
            mean, logvar = mean.astype(jnp.float32), logvar.astype(jnp.float32)
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = mean + std * data["pixel_vae_noise"][i]
            z = z.transpose(0, 1, 4, 2, 3)  # → [B, 1, C, h, w]
            z = z * scale if not self.vae_cfg.invert_scale_latents else z / scale
            pad = jnp.zeros(
                (z.shape[0], latent_frames_total - z.shape[1]) + z.shape[2:], z.dtype
            )
            z = jnp.concatenate([z, pad], axis=1)
            if patch_size_t is not None and z.shape[1] % patch_size_t != 0:
                n_pre = min(patch_size_t - z.shape[1] % patch_size_t, z.shape[1])
                z = jnp.concatenate([z[:, :n_pre], z], axis=1)
            return z.astype(data["image_latents"].dtype)

        def dit(tparams, latent_in, cond_in, embeds, t, ofs_arr):
            x = jnp.concatenate([latent_in, cond_in], axis=2).astype(self.dtype)
            out = cogvideox_transformer(
                tparams,
                tcfg,
                x,
                embeds,
                jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32),
                rope_cos,
                rope_sin,
                ofs=ofs_arr,
            )
            return out.astype(jnp.float32)

        g_np = np.asarray(g_table, np.float32)
        ts_np = np.asarray(sched_plan.timesteps)

        # step-cache schedule (beyond-parity, cache_interval > 1): full DiT
        # forward on every cache_interval-th step, the final step, and every
        # ALG-active 3-pass step; cached steps reuse the previous prediction
        # through the carry. Host-side static table → runtime lax.cond, so
        # skipped steps execute none of the DiT.
        if use_cache:
            from alg_tpu.alg.schedule import build_cache_schedule

            compute_np = build_cache_schedule(
                len(ts_np), cache_interval, lp_plan.strengths if alg else None
            )

        def step_fn(carry, i, three_pass: bool, data):
            if use_cache:
                latents, old_pred, prev_pred = carry
            else:
                latents, old_pred = carry
                prev_pred = None
            t = jnp.asarray(ts_np)[i]
            g = jnp.asarray(g_np)[i]
            tparams = data["tparams"]
            ofs_arr = data["ofs"]

            def predict(_):
                cond = lp_condition(i, data)
                if not do_cfg:
                    return dit(tparams, latents, cond, data["embeds2"], t, ofs_arr)
                if three_pass:
                    b = latents.shape[0]
                    lat_in = jnp.concatenate([latents] * 3, axis=0)
                    cond_in = jnp.concatenate([data["image_latents"], cond, cond], axis=0)
                    pred = dit(tparams, lat_in, cond_in, data["embeds3"], t, ofs_arr)
                    uncond_init, uncond, text = pred[:b], pred[b : 2 * b], pred[2 * b :]
                    return uncond_init + g * (text - uncond)
                b = latents.shape[0]
                lat_in = jnp.concatenate([latents] * 2, axis=0)
                cond_in = jnp.concatenate([cond, cond], axis=0)
                pred = dit(tparams, lat_in, cond_in, data["embeds2"], t, ofs_arr)
                uncond, text = pred[:b], pred[b:]
                return uncond + g * (text - uncond)

            if use_cache and not three_pass:
                noise_pred = jax.lax.cond(
                    jnp.asarray(compute_np)[i], predict, lambda _: prev_pred, None
                )
            else:
                noise_pred = predict(None)

            if use_dpm:
                new_latents, new_old = dpm_step(
                    sched_plan, i, noise_pred, latents, old_pred, data["dpm_noise"][i]
                )
            else:
                step_noise = data["dpm_noise"][i] if sched_plan.eta > 0.0 else None
                new_latents = ddim_step(
                    sched_plan, i, noise_pred, latents.astype(jnp.float32), noise=step_noise
                )
                new_old = old_pred
            new_carry = (new_latents.astype(jnp.float32), new_old)
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
            carry = (latents, jnp.zeros_like(latents))
            if use_cache:
                carry = carry + (jnp.zeros_like(latents),)  # prev noise_pred
            return carry

        def run(data):
            # chunked dispatch: each chunk is one bounded XLA program (see
            # core/device.SCAN_CHUNK); chunks enqueue without host fetches,
            # so the device queue stays full — numerics identical to one scan
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
                        # bench warm-up hook (host-side, never traced): stop as
                        # soon as every per-pass-count program has executed —
                        # compiles and caches the full run at a fraction of
                        # its device time (VERDICT r3 #2b)
                        return carry[0]
            if checkpoint is not None:
                checkpoint.complete()
            return carry[0]

        data = {
            "latents0": latents0,
            "image_latents": image_latents,
            "embeds2": embeds2,
            "embeds3": embeds3,
            "tparams": self.transformer_params,
            "vae_params": self.vae_params if pixel_mode else None,
            "dpm_noise": dpm_noise,
            "pixel_image": pixel_image,
            "pixel_vae_noise": pixel_vae_noise,
            "ofs": ofs,
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
                # :1126-1134): host-stepped loop, one jitted step per pass-count;
                # each step syncs to invoke the observer — slow by design.
                # MUTATING observers (reference ``_callback_tensor_inputs``):
                # the observer may return replacement latents — either the
                # array itself or a dict with a "latents" key — which become
                # the carry for the next step, exactly like the reference's
                # ``callback_outputs.pop("latents", latents)``.
                step2 = jax.jit(lambda c, i, d: step_fn(c, i, False, d)[0])
                step3 = jax.jit(lambda c, i, d: step_fn(c, i, True, d)[0])

                carry = init_carry(latents0)
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
        """[B, F, C, h, w] → [B, F_pix, C, H, W] fp32 in [-1, 1] (:428-433).

        ``vae_tiling``: None = auto (tile when the latent exceeds 48×48 —
        whole-clip full-res decode activations don't fit HBM; replaces the
        reference's enable_tiling/slicing)."""
        from alg_tpu.models.vae_tiling import tiled_decode

        z = latents.astype(jnp.float32) / self.vae_cfg.scaling_factor
        z = z.transpose(0, 1, 3, 4, 2).astype(self._vae_dtype())  # → BFHWC
        fn = jax.jit(lambda params, z: cogvideox_vae_decode(params, self.vae_cfg, z))
        if vae_tiling is None:
            vae_tiling = z.shape[2] * z.shape[3] > 48 * 48
        if vae_tiling:
            frames = tiled_decode(
                lambda zt: fn(self.vae_params, zt), z, self.vae_cfg.spatial_scale,
                mesh=self.attn_mesh,  # tile grid spreads over the serving mesh
            )
        else:
            frames = fn(self.vae_params, z)
        return frames.transpose(0, 1, 4, 2, 3).astype(jnp.float32)  # → [B, F, C, H, W]
