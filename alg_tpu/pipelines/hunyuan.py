"""HunyuanVideo-I2V + ALG pipeline — jit-compiled TPU sampler.

Reproduces the reference ``HunyuanVideoImageToVideoPipeline`` semantics
(``pipeline_hunyuan_video_image2video_lowpass.py:796-1308``, token_replace
variant — the shipped model):

  * conditioning is *temporal*: model input = ``cat([cond_frame,
    latents[:, :, 1:]], dim=2)`` — the first latent frame is replaced by the
    (possibly low-pass-filtered) image latent (``:1192,1232``); the scheduler
    steps only frames 1+ and frame 0 is re-pinned to the clean image latent
    (``:1266-1270``);
  * HunyuanVideo is CFG-distilled: ``guidance_scale`` feeds the guidance
    embedding (``g·1000``, ``:1115-1119``); true CFG (2/3-pass with negative
    prompts encoded against a black image, ``:1091-1105``) only when
    ``true_cfg_scale > 1``. The shipped ALG config is the single-pass branch
    4: the LP-filtered first-frame latent simply replaces the clean one
    (``:1196-1235``);
  * ``i2v_stable``: init latents = noise·0.999 + image_latent·0.001 broadcast
    over frames (``:591-594``);
  * prompt path: Llava-Llama3 over the chat template with the image, crop
    bookkeeping + interleave (``:88-148,282-419``) + CLIP pooled text;
  * flow-match Euler over explicit sigmas ``linspace(1,0,steps+1)[:-1]``
    (``:1111-1112``).

Quirk policy: pixel-space filtering crashes in the reference (PIL input,
quirk 2.5a, unreachable) — here the preprocessed tensor is used instead.
``enable_lp_img_embeds`` asserts False, as in the reference (``:1153``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional, Sequence, Union

import numpy as np
import jax
import jax.numpy as jnp

from alg_tpu.alg.matrices import apply_filter_matrices
from alg_tpu.alg.schedule import LPConfig, LPPlan, build_lp_plan
from alg_tpu.core.rng import NoiseSource
from alg_tpu.models.clip import CLIPTextConfig, clip_text_encode
from alg_tpu.models.hunyuan import (
    HunyuanVideoTransformerConfig,
    HunyuanVAEConfig,
    hunyuan_rope,
    hunyuan_transformer,
    hunyuan_vae_decode,
    hunyuan_vae_encode,
)
from alg_tpu.models.llama import LlavaConfig, llava_hidden_states
from alg_tpu.pipelines import processing
from alg_tpu.schedulers import FlowMatchEulerConfig, flow_match_euler_step, make_flow_match_euler_plan

DEFAULT_PROMPT_TEMPLATE = {
    "template": (
        "<|start_header_id|>system<|end_header_id|>\n\n<image>\nDescribe the video by detailing the following aspects according to the reference image: "
        "1. The main content and theme of the video."
        "2. The color, shape, size, texture, quantity, text, and spatial relationships of the objects."
        "3. Actions, events, behaviors temporal relationships, physical movement changes of the objects."
        "4. background environment, light, style and atmosphere."
        "5. camera angles, movements, and transitions used in the video:<|eot_id|>\n\n"
        "<|start_header_id|>user<|end_header_id|>\n\n{}<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    ),
    "crop_start": 103,
    "image_emb_start": 5,
    "image_emb_end": 581,
    "image_emb_len": 576,
    "double_return_token_id": 271,
}


@dataclasses.dataclass
class HunyuanVideoPipeline:
    transformer_cfg: HunyuanVideoTransformerConfig
    transformer_params: Any
    vae_cfg: HunyuanVAEConfig
    vae_params: Any
    llava_cfg: Optional[LlavaConfig] = None
    llava_params: Any = None
    clip_cfg: Optional[CLIPTextConfig] = None
    clip_params: Any = None
    tokenize_llama: Optional[Callable] = None  # (texts, max_len) -> (ids, mask)
    tokenize_clip: Optional[Callable] = None  # (texts, max_len=77) -> ids
    scheduler_cfg: FlowMatchEulerConfig = dataclasses.field(
        default_factory=lambda: FlowMatchEulerConfig(shift=7.0, invert_sigmas=False)
    )
    dtype: Any = jnp.float32
    # multi-chip: mesh for shard_map'd fused attention inside the sampler
    attn_mesh: Any = None
    # sequence-parallel KV strategy when the mesh has an sp axis: "gather"
    # (all-gathered KV) or "ring" (KV chunks rotate via ppermute — ring
    # attention; O(S/sp) peak KV memory per chip)
    sp_mode: str = "gather"
    # explicit VAE-encode tiling toggle (reference ``enable_vae_tiling``,
    # :601-628): True/False forces it; None = tile only multi-frame clips that
    # are a real HBM risk (see models/vae_tiling.auto_tile_encode)
    vae_encode_tiling: Optional[bool] = None
    # cooperative interruption (reference ``self._interrupt`` checked each
    # step): set True (e.g. from a step_observer or another thread) to stop
    # the run; chunk-granular in the production scan path, per-step with a
    # step_observer; reset at the start of every __call__ (reference :1127)
    interrupt: bool = dataclasses.field(default=False, compare=False)

    @property
    def vae_scale_factor_spatial(self) -> int:
        return self.vae_cfg.spatial_scale

    @property
    def vae_scale_factor_temporal(self) -> int:
        return self.vae_cfg.temporal_compression_ratio

    def _vae_dtype(self):
        """Dtype the VAE weights are stored in — convs run in it, like the
        reference (diffusers casts latents/pixels to ``vae.dtype``)."""
        leaves = jax.tree_util.tree_leaves(self.vae_params)
        return leaves[0].dtype if leaves else jnp.float32

    # -- prompt encoding -----------------------------------------------------

    @functools.cached_property
    def _llava_forward(self):
        """Jitted Llava forward returning ``hidden_states[-3]`` (reference
        :348-352). Cached on the pipeline so repeated prompts reuse one trace."""
        cfg = self.llava_cfg
        return jax.jit(
            lambda p, ids, px, m, pos: llava_hidden_states(
                p, cfg, ids, px, attention_mask=m, position_ids=pos
            )[-3]
        )

    def _get_llama_prompt_embeds(self, image, prompt, template, max_sequence_length=256, image_embed_interleave=2):
        """Reference ``:282-419``: template+image through Llava, crop the
        template/assistant spans, interleave image embeds, concat."""
        prompts = [template["template"].format(p) for p in ([prompt] if isinstance(prompt, str) else prompt)]
        crop_start = template["crop_start"]
        image_emb_len = template["image_emb_len"]
        image_emb_start = template["image_emb_start"]
        image_emb_end = template["image_emb_end"]
        double_return = template["double_return_token_id"]
        max_len = max_sequence_length + crop_start

        ids, mask = self.tokenize_llama(prompts, max_len)  # [B, max_len]
        from alg_tpu.models.clip import clip_preprocess

        pixels = clip_preprocess(image, self.llava_cfg.vision.image_size)

        # expand <image> token to image_emb_len positions (reference :107-148):
        # non-image tokens scatter to cumsum positions (each image token
        # widens the row by image_emb_len-1), then the image block is
        # force-written at [image_emb_start:image_emb_end] regardless of
        # where the <image> token sat
        cfg = self.llava_cfg
        b = ids.shape[0]
        special = ids == cfg.image_token_index
        max_expanded = max_len + int(special.sum(-1).max()) * (image_emb_len - 1)
        new_pos = np.cumsum(special * (image_emb_len - 1) + 1, axis=-1) - 1
        expanded = np.full((b, max_expanded), cfg.pad_token_id, np.int64)
        bi_idx, tok_idx = np.where(~special)
        expanded[bi_idx, new_pos[bi_idx, tok_idx]] = ids[bi_idx, tok_idx]
        expanded[:, image_emb_start:image_emb_end] = cfg.image_token_index
        exp_mask = (expanded != cfg.pad_token_id).astype(np.int64)
        # masked position ids fill with 1, not 0 (reference :144 masked_fill_)
        position_ids = np.where(exp_mask == 1, np.cumsum(exp_mask, axis=-1) - 1, 1)

        # one compiled Llava forward (32-layer Llama at real scale — an eager
        # op-by-op dispatch here costs seconds per run on the axon tunnel);
        # shapes are fixed by max_len, so repeated prompts reuse the trace
        hidden = np.asarray(
            self._llava_forward(
                self.llava_params,
                jnp.asarray(expanded),
                jnp.asarray(np.repeat(pixels, b, 0)),
                jnp.asarray(exp_mask),
                jnp.asarray(position_ids),
            )
        )

        # crop bookkeeping (reference :355-405)
        text_crop_start = crop_start - 1 + image_emb_len
        # truncated-prompt quirk (reference :360-365): when exactly 3
        # double-return tokens exist in the whole batch (the template's 4th —
        # after the assistant header — was truncated away; only possible at
        # B=1), the reference appends seq_len, so the crop lands at the end
        total_drt = int((ids == double_return).sum())
        embeds_list, mask_list, img_list = [], [], []
        for bi in range(b):
            drt = np.where(ids[bi] == double_return)[0]
            if total_drt == 3 and b == 1:
                last = ids.shape[1]
            else:
                # per-row last occurrence (reference reshape(B,-1)[:, -1]);
                # no-occurrence rows crop at the end (reference would error —
                # reachable only with toy tokenizers)
                last = drt[-1] if len(drt) else ids.shape[1]
            a_start = last - 1 + image_emb_len - 4
            a_end = last - 1 + image_emb_len
            m_start, m_end = last - 4, last
            emb = np.concatenate([hidden[bi, text_crop_start:a_start], hidden[bi, a_end:]])
            msk = np.concatenate([mask[bi, crop_start:m_start], mask[bi, m_end:]])
            embeds_list.append(emb)
            mask_list.append(msk)
            img_list.append(hidden[bi, image_emb_start:image_emb_end])
        embeds = np.stack(embeds_list)
        masks = np.stack(mask_list)
        img = np.stack(img_list)
        if 0 < image_embed_interleave < 6:
            img = img[:, ::image_embed_interleave]
        prompt_embeds = np.concatenate([img, embeds], axis=1)
        prompt_mask = np.concatenate([np.ones(img.shape[:2], masks.dtype), masks], axis=1)
        return jnp.asarray(prompt_embeds, self.dtype), jnp.asarray(prompt_mask, jnp.int32)

    def encode_prompt(self, image, prompt, prompt_2=None, template=DEFAULT_PROMPT_TEMPLATE, max_sequence_length=256, image_embed_interleave=2):
        embeds, mask = self._get_llama_prompt_embeds(image, prompt, template, max_sequence_length, image_embed_interleave)
        # reference max_sequence_length=77 (:421-452) == real CLIP's position
        # table; clamp for smaller test checkpoints
        clip_len = min(77, self.clip_cfg.max_position_embeddings)
        ids = self.tokenize_clip([prompt_2 or prompt] if isinstance(prompt_2 or prompt, str) else (prompt_2 or prompt), clip_len)
        fn = jax.jit(lambda p, i: clip_text_encode(p, self.clip_cfg, i)[1])
        pooled = fn(self.clip_params, jnp.asarray(ids)).astype(self.dtype)
        return embeds, pooled, mask

    # -- main entry ------------------------------------------------------------

    def __call__(
        self,
        image=None,
        prompt: Optional[Union[str, Sequence[str]]] = None,
        prompt_2=None,
        negative_prompt: Optional[str] = None,
        height: int = 720,
        width: int = 1280,
        num_frames: int = 129,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        true_cfg_scale: float = 1.0,
        i2v_stable: bool = True,
        seed: int = 42,
        noise_source: Optional[NoiseSource] = None,
        latents: Optional[np.ndarray] = None,
        sigmas: Optional[Sequence[float]] = None,
        prompt_embeds: Optional[jnp.ndarray] = None,
        pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        prompt_attention_mask: Optional[jnp.ndarray] = None,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_pooled_prompt_embeds: Optional[jnp.ndarray] = None,
        negative_prompt_attention_mask: Optional[jnp.ndarray] = None,
        prompt_template=DEFAULT_PROMPT_TEMPLATE,
        max_sequence_length: int = 256,
        image_embed_interleave: int = 2,
        output_type: str = "pil",
        attention_kwargs: Optional[dict] = None,
        # --- ALG kwargs (reference surface, :830-854) ---
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
        lp_on_noisy_latent: bool = False,
        enable_lp_img_embeds: bool = False,
        image_condition_type: str = "token_replace",
        step_observer=None,
        # preemption-safe resume (beyond-parity; see io/runstate.py)
        checkpoint=None,
        checkpoint_every: int = 8,
        # beyond-parity step caching (see cogvideox.py): DiT forward only
        # every cache_interval-th step, previous prediction reused otherwise
        # (ALG-active/final steps always computed). 1 = exact.
        cache_interval: int = 1,
    ):
        # reset cooperative interruption for this run (reference :1127)
        self.interrupt = False
        cache_interval = int(cache_interval)
        if cache_interval < 1:
            raise ValueError(f"cache_interval must be >= 1, got {cache_interval}")
        if checkpoint is not None:
            from alg_tpu.io.runstate import as_checkpoint, run_fingerprint

            checkpoint = as_checkpoint(
                checkpoint,
                run_fingerprint(
                    "hunyuan",
                    prompt=prompt,
                    prompt_2=prompt_2,
                    negative_prompt=negative_prompt,
                    seed=seed,
                    height=height,
                    width=width,
                    num_frames=num_frames,
                    num_inference_steps=num_inference_steps,
                    guidance_scale=guidance_scale,
                    true_cfg_scale=true_cfg_scale,
                    i2v_stable=i2v_stable,
                    sigmas=None if sigmas is None else tuple(sigmas),
                    image_condition_type=image_condition_type,
                    # only hashed when active — exact-mode checkpoints
                    # written before this key existed stay resumable
                    **({"cache_interval": cache_interval} if cache_interval != 1 else {}),
                    lp_on_noisy_latent=lp_on_noisy_latent,
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
        assert not enable_lp_img_embeds, (
            "Low-pass filter on image embeds is not supported in HunyuanVideo pipeline."
        )
        if image_condition_type not in ("token_replace", "latent_concat"):
            raise ValueError(f"Unknown image_condition_type: {image_condition_type!r}")
        # Faithful-quirk policy (SURVEY 2.5c): the reference's latent_concat
        # assembly concatenates frames (dim 2) for every branch and would feed
        # a (2z+1)-channel model z channels — it cannot run. We implement the
        # working channel-concat semantics of the upstream variant instead:
        # [latents ⧺ cond-latents ⧺ mask] on channels (mask from reference
        # :1069-1070, there built but unused), full scheduler step (no
        # token-replace re-pinning, :1263-1270), first-4-pixel-frame decode
        # drop (:1293-1294), first-latent-frame drop for latent output.
        # check_inputs (reference :494-548)
        if height % 16 != 0 or width % 16 != 0:
            raise ValueError(f"height and width must be divisible by 16 but are {height} and {width}.")
        if true_cfg_scale > 1.0 and guidance_scale > 1.0:
            import logging

            logging.getLogger(__name__).warning(
                "Both true_cfg_scale > 1 and guidance_scale > 1 — distilled "
                "guidance and true CFG are active simultaneously (reference "
                "warns the same, :543-548)."
            )
        do_true_cfg = true_cfg_scale > 1.0
        noise = noise_source or NoiseSource(seed=seed)

        f_lat = (num_frames - 1) // self.vae_scale_factor_temporal + 1
        h_lat = height // self.vae_scale_factor_spatial
        w_lat = width // self.vae_scale_factor_spatial
        zc = self.vae_cfg.latent_channels

        # ---- image preprocess + argmax VAE encode (:1046,:574-585)
        if image is not None and not isinstance(image, np.ndarray):
            image_tensor = processing.preprocess_image(image, height, width)
        else:
            image_tensor = np.asarray(image, np.float32)
        x = jnp.asarray(image_tensor, self._vae_dtype())[:, None].transpose(0, 1, 3, 4, 2)
        enc = jax.jit(lambda p, x: hunyuan_vae_encode(p, self.vae_cfg, x)[0])
        from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

        if auto_tile_encode(x.shape[1], x.shape[2], x.shape[3], self.vae_encode_tiling):
            mean0 = tiled_encode(
                lambda xt: enc(self.vae_params, xt), x, self.vae_cfg.spatial_scale
            )
        else:
            mean0 = enc(self.vae_params, x)
        image_latents = mean0.astype(jnp.float32).transpose(0, 4, 1, 2, 3)  # [B,z,1,h,w]
        image_latents = image_latents * self.vae_cfg.scaling_factor
        batch_img = image_latents.shape[0]

        # ---- prompt embeds
        if prompt_embeds is None:
            prompt_embeds, pooled_prompt_embeds, prompt_attention_mask = self.encode_prompt(
                image, prompt, prompt_2, template=prompt_template,
                max_sequence_length=max_sequence_length,
                image_embed_interleave=image_embed_interleave,
            )
        batch_size = prompt_embeds.shape[0]
        if do_true_cfg and negative_prompt_embeds is None:
            from PIL import Image as PILImage

            black = PILImage.new("RGB", (width, height), 0)
            negative_prompt_embeds, negative_pooled_prompt_embeds, negative_prompt_attention_mask = self.encode_prompt(
                black, negative_prompt or "", None, template=prompt_template,
                max_sequence_length=max_sequence_length,
                image_embed_interleave=image_embed_interleave,
            )

        if batch_img < batch_size:
            image_latents = jnp.repeat(image_latents, batch_size, axis=0)

        # ---- initial latents (:586-598)
        if latents is None:
            latents0 = noise.randn((batch_size, zc, f_lat, h_lat, w_lat))
        else:
            latents0 = np.asarray(latents, np.float32)
        latents0 = jnp.asarray(latents0, jnp.float32)
        if i2v_stable:
            latents0 = latents0 * 0.999 + jnp.broadcast_to(image_latents, latents0.shape) * (1 - 0.999)

        cond_mask = None
        if image_condition_type == "latent_concat":
            # condition = image latent on frame 0, zeros after; mask marks the
            # conditioned frame (reference :1069-1070; diffusers semantics)
            zpad = jnp.zeros((batch_size, zc, f_lat - 1, h_lat, w_lat), image_latents.dtype)
            image_latents = jnp.concatenate([image_latents, zpad], axis=2)
            cond_mask = np.zeros((batch_size, 1, f_lat, h_lat, w_lat), np.float32)
            cond_mask[:, :, 0] = 1.0
            expect_in = 2 * zc + 1
            if self.transformer_cfg.in_channels != expect_in:
                raise ValueError(
                    f"latent_concat needs a transformer with in_channels "
                    f"{expect_in} (2·z+1), got {self.transformer_cfg.in_channels}"
                )

        # ---- plans
        sig = np.linspace(1.0, 0.0, num_inference_steps + 1)[:-1] if sigmas is None else np.asarray(sigmas)
        sched_plan = make_flow_match_euler_plan(self.scheduler_cfg, sigmas=sig)

        alg_on = use_low_pass_guidance  # single-pass branch works without true CFG
        lp_cfg = LPConfig(
            use_low_pass_guidance=alg_on,
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
        lp_plan = build_lp_plan(lp_cfg, num_inference_steps, filter_h, filter_w, exp_shortcut=False)
        if not lp_filter_in_latent and alg_on:
            # reference pixel branch crashes on PIL input (quirk 2.5a); we use
            # the preprocessed tensor — per-step VAE encodes with argmax
            pixel_image = jnp.asarray(image_tensor[:, None], jnp.float32)
        else:
            pixel_image = None

        guidance = (
            jnp.full((1,), guidance_scale * 1000.0, jnp.float32)
            if self.transformer_cfg.guidance_embeds
            else None
        )

        latents_out = self._sample(
            latents0,
            image_latents.astype(jnp.float32),
            prompt_embeds,
            pooled_prompt_embeds,
            prompt_attention_mask,
            negative_prompt_embeds,
            negative_pooled_prompt_embeds,
            negative_prompt_attention_mask,
            sched_plan,
            lp_plan,
            true_cfg_scale,
            do_true_cfg,
            guidance,
            lp_on_noisy_latent,
            pixel_image,
            image_condition_type=image_condition_type,
            cond_mask=cond_mask,
            step_observer=step_observer,
            checkpoint=checkpoint,
            cache_interval=cache_interval,
        )

        if output_type == "latent":
            if image_condition_type == "latent_concat":
                latents_out = latents_out[:, :, 1:]
            return np.asarray(latents_out)
        video = self.decode_latents(latents_out)  # [B,C,F,H,W]
        if image_condition_type == "latent_concat":
            video = video[:, :, 4:]  # reference :1293-1294
        return processing.postprocess_video(np.asarray(video).transpose(0, 2, 1, 3, 4), output_type)

    # -- sampler ---------------------------------------------------------------

    def _sample(
        self,
        latents0,
        image_latents,
        prompt_embeds,
        pooled,
        prompt_mask,
        neg_embeds,
        neg_pooled,
        neg_mask,
        sched_plan,
        lp_plan: LPPlan,
        true_cfg_scale,
        do_true_cfg,
        guidance,
        lp_on_noisy_latent,
        pixel_image,
        image_condition_type: str = "token_replace",
        cond_mask=None,
        step_observer=None,
        checkpoint=None,
        cache_interval: int = 1,
        stop_after=None,
    ):
        tcfg = self.transformer_cfg
        alg = lp_plan.active
        use_cache = cache_interval > 1
        pixel_mode = pixel_image is not None
        latent_concat = image_condition_type == "latent_concat"
        mask_np = None if cond_mask is None else np.asarray(cond_mask, np.float32)
        batch = latents0.shape[0]
        f_lat, h_lat, w_lat = latents0.shape[2:]
        rope_cos, rope_sin = hunyuan_rope(tcfg, f_lat, h_lat, w_lat)

        m_h = lp_plan.m_h if alg else None  # numpy
        m_w = lp_plan.m_w if alg else None
        m_idx = lp_plan.m_idx if alg else None
        ts_np = np.asarray(sched_plan.timesteps)

        # per-step three-pass only in true-cfg+ALG mode, and never when
        # lp_on_noisy_latent (reference :1168)
        if do_true_cfg and alg and not lp_on_noisy_latent:
            segments = lp_plan.segments
        else:
            from alg_tpu.alg.schedule import LPSegment

            segments = (LPSegment(0, lp_plan.num_steps, False),)

        def lp_cond(i, data):
            """Filtered first-frame latent (reference prepare_lp, :650-792)."""
            if not alg:
                return data["image_latents"]
            mh = jnp.asarray(m_h)[jnp.asarray(m_idx)[i]]
            mw = jnp.asarray(m_w)[jnp.asarray(m_idx)[i]]
            if not pixel_mode:
                return apply_filter_matrices(data["image_latents"], mh, mw)
            rgb = apply_filter_matrices(data["pixel_image"], mh, mw)
            from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

            rgb_c = rgb.transpose(0, 1, 3, 4, 2).astype(self._vae_dtype())
            if auto_tile_encode(
                rgb_c.shape[1], rgb_c.shape[2], rgb_c.shape[3], self.vae_encode_tiling
            ):
                mean = tiled_encode(
                    lambda xt: hunyuan_vae_encode(data["vae_params"], self.vae_cfg, xt)[0],
                    rgb_c,
                    self.vae_cfg.spatial_scale,
                )
            else:
                mean, _ = hunyuan_vae_encode(data["vae_params"], self.vae_cfg, rgb_c)
            z = mean.astype(jnp.float32).transpose(0, 4, 1, 2, 3) * self.vae_cfg.scaling_factor
            if latent_concat:
                il = data["image_latents"]
                z = jnp.concatenate(
                    [z, jnp.zeros(z.shape[:2] + (il.shape[2] - z.shape[2],) + z.shape[3:], z.dtype)],
                    axis=2,
                )
            return z.astype(data["image_latents"].dtype)

        def dit(tparams, lat_in, embeds, mask, pool, t):
            out = hunyuan_transformer(
                tparams,
                tcfg,
                lat_in.astype(self.dtype),
                jnp.broadcast_to(t, (lat_in.shape[0],)).astype(jnp.float32),
                embeds.astype(self.dtype),
                mask,
                pool.astype(self.dtype),
                guidance=None if guidance is None else jnp.broadcast_to(guidance, (lat_in.shape[0],)),
                rope_cos=rope_cos,
                rope_sin=rope_sin,
            )
            return out.astype(jnp.float32)

        def assemble(lat_in, img_cond):
            """Model input from (possibly replicated) latents + conditioning.

            token_replace: conditioning latent replaces frame 0 (temporal
            concat, reference :1171,:1192,:1232). latent_concat: channels =
            [latents ⧺ cond ⧺ mask] (the working upstream-variant semantics;
            see __call__ docnote)."""
            if latent_concat:
                m = jnp.broadcast_to(
                    jnp.asarray(mask_np), (lat_in.shape[0],) + mask_np.shape[1:]
                ).astype(lat_in.dtype)
                return jnp.concatenate([lat_in, img_cond, m], axis=1)
            return jnp.concatenate([img_cond, lat_in[:, :, 1:]], axis=2)

        # step-cache schedule (beyond-parity; see cogvideox.py _sample): full
        # DiT forward every cache_interval-th step + the final step + every
        # nonzero-strength ALG step (their conditioning varies per step);
        # cached steps reuse the previous prediction through the carry
        if use_cache:
            from alg_tpu.alg.schedule import build_cache_schedule

            compute_np = build_cache_schedule(
                len(ts_np), cache_interval, lp_plan.strengths if alg else None
            )

        def step_fn(carry, i, three_pass, data):
            if use_cache:
                latents, prev_pred = carry
            else:
                latents = carry
                prev_pred = None
            t = jnp.asarray(ts_np)[i]
            il = data["image_latents"]
            tparams = data["tparams"]

            def predict(_):
                cond = lp_cond(i, data)
                if do_true_cfg and three_pass:
                    lat_in = jnp.concatenate([latents] * 3, axis=0)
                    img_cond = jnp.concatenate([il, cond, cond], axis=0)
                    lat_in = assemble(lat_in, img_cond)
                    embeds = jnp.concatenate([data["neg_embeds"], data["neg_embeds"], data["prompt_embeds"]], axis=0)
                    mask = jnp.concatenate([data["neg_mask"], data["neg_mask"], data["prompt_mask"]], axis=0)
                    pool = jnp.concatenate([data["neg_pooled"], data["neg_pooled"], data["pooled"]], axis=0)
                    pred = dit(tparams, lat_in, embeds, mask, pool, t)
                    uncond_init, uncond, text = pred[:batch], pred[batch : 2 * batch], pred[2 * batch :]
                    return uncond_init + true_cfg_scale * (text - uncond)
                if do_true_cfg:
                    # 2-pass: clean conditioning (strength-0 / lp_on_noisy_latent / no-ALG)
                    lat_in = jnp.concatenate([latents] * 2, axis=0)
                    img_cond = jnp.concatenate([il, il], axis=0)
                    lat_in = assemble(lat_in, img_cond)
                    embeds = jnp.concatenate([data["neg_embeds"], data["prompt_embeds"]], axis=0)
                    mask = jnp.concatenate([data["neg_mask"], data["prompt_mask"]], axis=0)
                    pool = jnp.concatenate([data["neg_pooled"], data["pooled"]], axis=0)
                    pred = dit(tparams, lat_in, embeds, mask, pool, t)
                    uncond, text = pred[:batch], pred[batch:]
                    return uncond + true_cfg_scale * (text - uncond)
                # single pass; ALG replaces the conditioning (:1196-1235)
                lat_in = assemble(latents, cond)
                return dit(
                    tparams, lat_in, data["prompt_embeds"], data["prompt_mask"], data["pooled"], t
                )

            if use_cache and not three_pass:
                noise_pred = jax.lax.cond(
                    jnp.asarray(compute_np)[i], predict, lambda _: prev_pred, None
                )
            else:
                noise_pred = predict(None)

            if latent_concat:
                # full scheduler step, no re-pinning (reference :1264)
                new_latents = flow_match_euler_step(sched_plan, i, noise_pred, latents)
            else:
                # token_replace scheduler step: frames 1+ only, re-pin frame 0
                new_rest = flow_match_euler_step(sched_plan, i, noise_pred[:, :, 1:], latents[:, :, 1:])
                new_latents = jnp.concatenate([il, new_rest], axis=2)
            new_latents = new_latents.astype(jnp.float32)
            if use_cache:
                return (new_latents, noise_pred), ()
            return new_latents, ()

        from alg_tpu.core.device import seg_chunk

        def _range_runner(tp):
            @functools.partial(jax.jit, static_argnames=("n",))
            def run_range(latents, data, start, n):
                body = lambda c, i: step_fn(c, i, tp, data)
                return jax.lax.scan(body, latents, start + jnp.arange(n))[0]

            return run_range

        run2, run3 = _range_runner(False), _range_runner(True)

        def init_carry(latents):
            if use_cache:
                return (latents, jnp.zeros_like(latents))  # + prev noise_pred
            return latents

        def carry_latents(carry):
            return carry[0] if use_cache else carry

        def run(data):
            # chunked dispatch (bounded XLA programs, no host fetches between
            # chunks — see core/device.SCAN_CHUNK)
            carry = init_carry(data["latents0"])
            start = 0
            if checkpoint is not None:
                start, carry = checkpoint.restore(carry)
            for seg in segments:
                if seg.stop <= start:
                    continue
                runner = run3 if seg.three_pass else run2
                i = max(seg.start, start)
                chunk = seg_chunk(seg.stop - i)
                while i < seg.stop:
                    if self.interrupt:
                        return carry_latents(carry)
                    n = min(chunk, seg.stop - i)
                    carry = runner(carry, data, jnp.int32(i), n)
                    i += n
                    if checkpoint is not None:
                        checkpoint.maybe_save(i, carry)
                    if stop_after is not None and i >= stop_after:
                        # bench warm-up hook (host-side, never traced):
                        # see cogvideox._sample
                        return carry_latents(carry)
            if checkpoint is not None:
                checkpoint.complete()
            return carry_latents(carry)

        data = {
            "latents0": latents0,
            "image_latents": image_latents,
            "prompt_embeds": prompt_embeds,
            "prompt_mask": None if prompt_mask is None else jnp.asarray(prompt_mask),
            "pooled": pooled,
            "neg_embeds": neg_embeds,
            "neg_mask": None if neg_mask is None else jnp.asarray(neg_mask),
            "neg_pooled": neg_pooled,
            "tparams": self.transformer_params,
            "vae_params": self.vae_params if pixel_mode else None,
            "pixel_image": pixel_image,
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
                # ...hunyuan...py:1272-1283): host-stepped loop, one jitted
                # step per pass-count; each step syncs to invoke the observer
                step2 = jax.jit(lambda c, i, d: step_fn(c, i, False, d)[0])
                step3 = jax.jit(lambda c, i, d: step_fn(c, i, True, d)[0])
                carry = init_carry(data["latents0"])
                start = 0
                if checkpoint is not None:
                    start, carry = checkpoint.restore(carry)
                for seg in segments:
                    if seg.stop <= start:
                        continue
                    f = step3 if seg.three_pass else step2
                    for i in range(max(seg.start, start), seg.stop):
                        if self.interrupt:
                            return carry_latents(carry)
                        carry = f(carry, i, data)
                        # mutating observer (reference :1278): a returned array
                        # or {"latents": ...} replaces the carry
                        lat = carry_latents(carry)
                        ret = step_observer(i, np.asarray(lat))
                        if ret is not None:
                            new_lat = ret.get("latents") if isinstance(ret, dict) else ret
                            if new_lat is not None:
                                lat = jnp.asarray(new_lat, lat.dtype).reshape(lat.shape)
                                carry = (lat, carry[1]) if use_cache else lat
                        if checkpoint is not None:
                            checkpoint.maybe_save(i + 1, carry)
                if checkpoint is not None:
                    checkpoint.complete()
                return carry_latents(carry)
            return run(data)

    def decode_latents(self, latents, vae_tiling=None) -> jnp.ndarray:
        """Tiled above 48×48 latents (replaces the reference's enable_tiling
        path, :601-628 — whole-clip 720p decode would hold ~30 GB)."""
        from alg_tpu.models.vae_tiling import tiled_decode

        z = latents.astype(jnp.float32) / self.vae_cfg.scaling_factor
        z = z.transpose(0, 2, 3, 4, 1).astype(self._vae_dtype())
        fn = jax.jit(lambda p, z: hunyuan_vae_decode(p, self.vae_cfg, z))
        if vae_tiling is None:
            vae_tiling = z.shape[2] * z.shape[3] > 48 * 48
        if vae_tiling:
            out = tiled_decode(
                lambda zt: fn(self.vae_params, zt), z, self.vae_cfg.spatial_scale,
                mesh=self.attn_mesh,  # tile grid spreads over the serving mesh
            )
        else:
            out = fn(self.vae_params, z)
        return out.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
