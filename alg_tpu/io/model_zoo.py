"""Build pipelines from local HF-layout checkpoints.

The reference does ``from_pretrained(model_path, cache_dir=...)``
(``run.py:45-86``). This environment has no network egress, so checkpoints
must already be on disk in HF repo layout (``transformer/``, ``vae/``,
``text_encoder/``, ``tokenizer/``, ``scheduler/`` with ``config.json`` +
safetensors). This module maps those configs/weights into alg_tpu configs and
param trees.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp

from alg_tpu.io import weights as W


def _load_config(model_dir: str, sub: str) -> Dict[str, Any]:
    with open(os.path.join(model_dir, sub, "config.json")) as f:
        return json.load(f)



def _convert_transformer(convert_fn, state, tcfg, dtype, quantize=None):
    """Transformer conversion, optionally quantized BEFORE streaming.

    With ``quantize`` in {"w8", "w4"} the conversion runs host-side
    (``weights.host_tree``), the block linears quantize on numpy (native C++
    kernel when built), and only the quantized tree is streamed — peak HBM is
    the int8/int4 tree, never bf16+int8 together (the single-chip requirement
    at 5–14B scale; see ``ops/quant.quantize_pipeline``'s HBM caution)."""
    if quantize is None:
        return convert_fn(state, tcfg, dtype)
    from alg_tpu.core.device import stream_tree
    from alg_tpu.ops.quant import quantize_transformer_params

    with W.host_tree():
        host = convert_fn(state, tcfg, dtype)
    return stream_tree(quantize_transformer_params(host, mode=quantize))


def load_cogvideox_pipeline(model_dir: str, dtype=jnp.bfloat16, quantize=None):
    """CogVideoX-I2V checkpoint dir → :class:`CogVideoXPipeline`."""
    from alg_tpu.models.cogvideox import CogVideoXTransformerConfig, CogVideoXVAEConfig
    from alg_tpu.models.t5 import T5Config
    from alg_tpu.pipelines import CogVideoXPipeline
    from alg_tpu.schedulers import CogVideoXDDIMConfig

    tc = _load_config(model_dir, "transformer")
    tcfg = CogVideoXTransformerConfig(
        num_attention_heads=tc["num_attention_heads"],
        attention_head_dim=tc["attention_head_dim"],
        in_channels=tc["in_channels"],
        out_channels=tc["out_channels"],
        time_embed_dim=tc["time_embed_dim"],
        ofs_embed_dim=tc.get("ofs_embed_dim"),
        text_embed_dim=tc["text_embed_dim"],
        num_layers=tc["num_layers"],
        attention_bias=tc.get("attention_bias", True),
        sample_width=tc["sample_width"],
        sample_height=tc["sample_height"],
        patch_size=tc["patch_size"],
        patch_size_t=tc.get("patch_size_t"),
        max_text_seq_length=tc.get("max_text_seq_length", 226),
        norm_eps=tc.get("norm_eps", 1e-5),
        use_rotary_positional_embeddings=tc.get("use_rotary_positional_embeddings", True),
    )
    vc = _load_config(model_dir, "vae")
    vcfg = CogVideoXVAEConfig(
        block_out_channels=tuple(vc["block_out_channels"]),
        latent_channels=vc["latent_channels"],
        layers_per_block=vc["layers_per_block"],
        norm_num_groups=vc.get("norm_num_groups", 32),
        norm_eps=vc.get("norm_eps", 1e-6),
        temporal_compression_ratio=vc.get("temporal_compression_ratio", 4),
        scaling_factor=vc.get("scaling_factor", 0.7),
        invert_scale_latents=vc.get("invert_scale_latents", False),
    )
    te = _load_config(model_dir, "text_encoder")
    t5cfg = T5Config(
        vocab_size=te["vocab_size"],
        d_model=te["d_model"],
        d_kv=te["d_kv"],
        d_ff=te["d_ff"],
        num_layers=te["num_layers"],
        num_heads=te["num_heads"],
        relative_attention_num_buckets=te.get("relative_attention_num_buckets", 32),
        relative_attention_max_distance=te.get("relative_attention_max_distance", 128),
    )
    sc = _load_config(model_dir, "scheduler") if os.path.exists(
        os.path.join(model_dir, "scheduler", "config.json")
    ) else _load_scheduler_cfg(model_dir)
    scfg = CogVideoXDDIMConfig(
        num_train_timesteps=sc.get("num_train_timesteps", 1000),
        beta_start=sc.get("beta_start", 0.00085),
        beta_end=sc.get("beta_end", 0.012),
        beta_schedule=sc.get("beta_schedule", "scaled_linear"),
        snr_shift_scale=sc.get("snr_shift_scale", 3.0),
        rescale_betas_zero_snr=sc.get("rescale_betas_zero_snr", True),
        set_alpha_to_one=sc.get("set_alpha_to_one", True),
        timestep_spacing=sc.get("timestep_spacing", "trailing"),
        steps_offset=sc.get("steps_offset", 0),
        prediction_type=sc.get("prediction_type", "v_prediction"),
    )
    scheduler = "dpm" if "DPM" in sc.get("_class_name", "") else "ddim"

    tparams = _convert_transformer(
        W.convert_cogvideox_transformer,
        W.load_safetensors_dir(os.path.join(model_dir, "transformer")), tcfg, dtype,
        quantize=quantize,
    )
    vparams = W.convert_cogvideox_vae(
        W.load_safetensors_dir(os.path.join(model_dir, "vae")), vcfg, jnp.float32
    )
    t5params = W.convert_t5_encoder(
        W.load_safetensors_dir(os.path.join(model_dir, "text_encoder")), t5cfg, dtype
    )

    tokenize = _make_tokenizer(model_dir)
    return CogVideoXPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        t5_cfg=t5cfg,
        t5_params=t5params,
        tokenize=tokenize,
        scheduler=scheduler,
        scheduler_cfg=scfg,
        dtype=dtype,
    )


def load_wan_pipeline(model_dir: str, dtype=jnp.bfloat16, flow_shift: float = 5.0, quantize=None):
    """Wan2.1-I2V checkpoint dir → :class:`WanPipeline`. Mirrors the reference
    overrides: fp32 CLIP-vision + fp32 VAE, UniPC with flow_shift
    (``run.py:45-63``)."""
    from alg_tpu.models.clip import CLIPVisionConfig
    from alg_tpu.models.t5 import T5Config
    from alg_tpu.models.wan import WanTransformerConfig, WanVAEConfig
    from alg_tpu.pipelines import WanPipeline
    from alg_tpu.schedulers import UniPCConfig

    tc = _load_config(model_dir, "transformer")
    tcfg = WanTransformerConfig(
        num_attention_heads=tc["num_attention_heads"],
        attention_head_dim=tc["attention_head_dim"],
        in_channels=tc["in_channels"],
        out_channels=tc["out_channels"],
        num_layers=tc["num_layers"],
        ffn_dim=tc["ffn_dim"],
        freq_dim=tc["freq_dim"],
        text_dim=tc["text_dim"],
        image_dim=tc.get("image_dim"),
        patch_size=tuple(tc["patch_size"]),
        eps=tc.get("eps", 1e-6),
    )
    vc = _load_config(model_dir, "vae")
    vcfg = WanVAEConfig(
        base_dim=vc.get("base_dim", 96),
        z_dim=vc.get("z_dim", 16),
        dim_mult=tuple(vc.get("dim_mult", (1, 2, 4, 4))),
        num_res_blocks=vc.get("num_res_blocks", 2),
        temperal_downsample=tuple(vc.get("temperal_downsample", (False, True, True))),
        latents_mean=tuple(vc["latents_mean"]),
        latents_std=tuple(vc["latents_std"]),
    )
    te = _load_config(model_dir, "text_encoder")
    t5cfg = T5Config(
        vocab_size=te["vocab_size"],
        d_model=te["d_model"],
        d_kv=te["d_kv"],
        d_ff=te["d_ff"],
        num_layers=te["num_layers"],
        num_heads=te["num_heads"],
        per_layer_relative_bias=True,  # UMT5
    )
    ic = _load_config(model_dir, "image_encoder")
    ccfg = CLIPVisionConfig(
        hidden_size=ic["hidden_size"],
        intermediate_size=ic["intermediate_size"],
        num_hidden_layers=ic["num_hidden_layers"],
        num_attention_heads=ic["num_attention_heads"],
        image_size=ic["image_size"],
        patch_size=ic["patch_size"],
        hidden_act=ic.get("hidden_act", "gelu"),
    )

    tparams = _convert_transformer(
        W.convert_wan_transformer,
        W.load_safetensors_dir(os.path.join(model_dir, "transformer")), tcfg, dtype,
        quantize=quantize,
    )
    vparams = W.convert_wan_vae(
        W.load_safetensors_dir(os.path.join(model_dir, "vae")), vcfg, jnp.float32
    )
    t5params = W.convert_t5_encoder(
        W.load_safetensors_dir(os.path.join(model_dir, "text_encoder")), t5cfg, dtype
    )
    cparams = W.convert_clip_vision(
        W.load_safetensors_dir(os.path.join(model_dir, "image_encoder")), ccfg, jnp.float32
    )

    tok = _make_wan_tokenizer(model_dir)
    return WanPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        t5_cfg=t5cfg,
        t5_params=t5params,
        clip_cfg=ccfg,
        clip_params=cparams,
        tokenize=tok,
        scheduler_cfg=UniPCConfig(flow_shift=flow_shift),
        dtype=dtype,
    )


def _native_tokenize(model_dir: str, sub: str = "tokenizer"):
    """transformers-free ``tokenizer.json`` path (io/hf_tokenizer.py); None
    when the directory or file is absent (caller falls back)."""
    tok_dir = os.path.join(model_dir, sub)
    if not os.path.isdir(tok_dir):
        return None
    from alg_tpu.io.hf_tokenizer import load_tokenizer

    return load_tokenizer(tok_dir)


def _make_wan_tokenizer(model_dir: str):
    tok_dir = os.path.join(model_dir, "tokenizer")
    if not os.path.isdir(tok_dir):
        return None
    native = _native_tokenize(model_dir)
    if native is not None:
        def tokenize(prompts, max_length):
            ids, mask = native(prompts, max_length)
            return ids.astype("int32"), mask.astype("int32")

        return tokenize
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tok_dir)

    def tokenize(prompts, max_length):
        out = tok(
            prompts,
            padding="max_length",
            max_length=max_length,
            truncation=True,
            add_special_tokens=True,
            return_attention_mask=True,
            return_tensors="np",
        )
        return out["input_ids"].astype("int32"), out["attention_mask"].astype("int32")

    return tokenize


def load_hunyuan_pipeline(
    model_dir: str, dtype=jnp.bfloat16, flow_shift: float = 7.0, invert_sigmas: bool = False,
    quantize=None,
):
    """HunyuanVideo-I2V checkpoint dir → :class:`HunyuanVideoPipeline`
    (bf16 transformer, flow-match Euler re-init per ``run.py:71-86``)."""
    from alg_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
    from alg_tpu.models.hunyuan import HunyuanVideoTransformerConfig, HunyuanVAEConfig
    from alg_tpu.models.llama import LlamaConfig, LlavaConfig
    from alg_tpu.pipelines import HunyuanVideoPipeline
    from alg_tpu.schedulers import FlowMatchEulerConfig

    tc = _load_config(model_dir, "transformer")
    tcfg = HunyuanVideoTransformerConfig(
        in_channels=tc["in_channels"],
        out_channels=tc["out_channels"],
        num_attention_heads=tc["num_attention_heads"],
        attention_head_dim=tc["attention_head_dim"],
        num_layers=tc["num_layers"],
        num_single_layers=tc["num_single_layers"],
        num_refiner_layers=tc.get("num_refiner_layers", 2),
        mlp_ratio=tc.get("mlp_ratio", 4.0),
        patch_size=tc.get("patch_size", 2),
        patch_size_t=tc.get("patch_size_t", 1),
        text_embed_dim=tc.get("text_embed_dim", 4096),
        pooled_projection_dim=tc.get("pooled_projection_dim", 768),
        guidance_embeds=tc.get("guidance_embeds", True),
        rope_theta=tc.get("rope_theta", 256.0),
        rope_axes_dim=tuple(tc.get("rope_axes_dim", (16, 56, 56))),
        image_condition_type=tc.get("image_condition_type", "token_replace"),
    )
    vc = _load_config(model_dir, "vae")
    vcfg = HunyuanVAEConfig(
        latent_channels=vc.get("latent_channels", 16),
        block_out_channels=tuple(vc.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=vc.get("layers_per_block", 2),
        norm_num_groups=vc.get("norm_num_groups", 32),
        scaling_factor=vc.get("scaling_factor", 0.476986),
        temporal_compression_ratio=vc.get("temporal_compression_ratio", 4),
    )
    llava_raw = _load_config(model_dir, "text_encoder")
    text_raw = llava_raw.get("text_config", {})
    vision_raw = llava_raw.get("vision_config", {})
    lcfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=text_raw.get("vocab_size", 128320),
            hidden_size=text_raw.get("hidden_size", 4096),
            intermediate_size=text_raw.get("intermediate_size", 14336),
            num_hidden_layers=text_raw.get("num_hidden_layers", 32),
            num_attention_heads=text_raw.get("num_attention_heads", 32),
            num_key_value_heads=text_raw.get("num_key_value_heads", 8),
            rope_theta=text_raw.get("rope_theta", 500000.0),
        ),
        vision=CLIPVisionConfig(
            hidden_size=vision_raw.get("hidden_size", 1024),
            intermediate_size=vision_raw.get("intermediate_size", 4096),
            num_hidden_layers=vision_raw.get("num_hidden_layers", 24),
            num_attention_heads=vision_raw.get("num_attention_heads", 16),
            image_size=vision_raw.get("image_size", 336),
            patch_size=vision_raw.get("patch_size", 14),
            hidden_act=vision_raw.get("hidden_act", "quick_gelu"),
        ),
        image_token_index=llava_raw.get("image_token_index", 128257),
        pad_token_id=llava_raw.get("pad_token_id", 128258),
    )
    c2 = _load_config(model_dir, "text_encoder_2")
    ccfg = CLIPTextConfig(
        vocab_size=c2["vocab_size"],
        hidden_size=c2["hidden_size"],
        intermediate_size=c2["intermediate_size"],
        num_hidden_layers=c2["num_hidden_layers"],
        num_attention_heads=c2["num_attention_heads"],
        max_position_embeddings=c2.get("max_position_embeddings", 77),
        hidden_act=c2.get("hidden_act", "quick_gelu"),
        eos_token_id=c2.get("eos_token_id", 49407),
    )

    tparams = _convert_transformer(
        W.convert_hunyuan_transformer,
        W.load_safetensors_dir(os.path.join(model_dir, "transformer")), tcfg, dtype,
        quantize=quantize,
    )
    vparams = W.convert_hunyuan_vae(
        W.load_safetensors_dir(os.path.join(model_dir, "vae")), vcfg, jnp.float32
    )
    lparams = W.convert_llava(
        W.load_safetensors_dir(os.path.join(model_dir, "text_encoder")), lcfg, dtype
    )
    cparams = W.convert_clip_text(
        W.load_safetensors_dir(os.path.join(model_dir, "text_encoder_2")), ccfg, jnp.float32
    )

    tok_llama = _make_plain_tokenizer(model_dir, "tokenizer", with_mask=True)
    tok_clip = _make_plain_tokenizer(model_dir, "tokenizer_2", with_mask=False)
    return HunyuanVideoPipeline(
        transformer_cfg=tcfg,
        transformer_params=tparams,
        vae_cfg=vcfg,
        vae_params=vparams,
        llava_cfg=lcfg,
        llava_params=lparams,
        clip_cfg=ccfg,
        clip_params=cparams,
        tokenize_llama=tok_llama,
        tokenize_clip=tok_clip,
        scheduler_cfg=FlowMatchEulerConfig(shift=flow_shift, invert_sigmas=invert_sigmas),
        dtype=dtype,
    )


def _make_plain_tokenizer(model_dir: str, sub: str, with_mask: bool):
    tok_dir = os.path.join(model_dir, sub)
    if not os.path.isdir(tok_dir):
        return None
    native = _native_tokenize(model_dir, sub)
    if native is not None:
        def tokenize(prompts, max_length):
            ids, mask = native(prompts, max_length)
            if with_mask:
                return ids.astype("int64"), mask.astype("int64")
            return ids.astype("int64")

        return tokenize
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tok_dir)

    def tokenize(prompts, max_length):
        out = tok(
            prompts,
            padding="max_length",
            max_length=max_length,
            truncation=True,
            return_tensors="np",
        )
        if with_mask:
            return out["input_ids"].astype("int64"), out["attention_mask"].astype("int64")
        return out["input_ids"].astype("int32")

    return tokenize


def _load_scheduler_cfg(model_dir: str) -> Dict[str, Any]:
    path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {}


def _make_tokenizer(model_dir: str):
    tok_dir = os.path.join(model_dir, "tokenizer")
    if not os.path.isdir(tok_dir):
        return None
    native = _native_tokenize(model_dir)
    if native is not None:
        def tokenize(prompts, max_length):
            ids, _ = native(prompts, max_length)
            return ids.astype("int32")

        return tokenize
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(tok_dir)

    def tokenize(prompts, max_length):
        out = tok(
            prompts,
            padding="max_length",
            max_length=max_length,
            truncation=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        return out["input_ids"].astype("int32")

    return tokenize


def resolve_model_dir(model_path: str, cache_dir: Optional[str]) -> str:
    """Find a local checkout for an HF repo id (no network egress)."""
    if os.path.isdir(model_path):
        return model_path
    candidates = []
    if cache_dir:
        candidates.append(os.path.join(cache_dir, model_path))
        candidates.append(
            os.path.join(cache_dir, "models--" + model_path.replace("/", "--"), "snapshots")
        )
    for c in candidates:
        if os.path.isdir(c):
            if c.endswith("snapshots"):
                snaps = sorted(os.listdir(c))
                if snaps:
                    return os.path.join(c, snaps[-1])
            else:
                return c
    raise FileNotFoundError(
        f"Model {model_path!r} not found locally (no network egress). "
        f"Provide --model_cache_dir with an HF-layout checkout."
    )
