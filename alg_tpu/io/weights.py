"""HF checkpoint → alg_tpu parameter-tree converters.

The reference loads every model via ``from_pretrained`` (``run.py:45-86``);
here HF safetensors shards are mapped name-by-name into this framework's
plain-dict pytrees. Conventions:

  * torch ``nn.Linear.weight`` is ``[out, in]`` → stored transposed as
    ``kernel [in, out]``;
  * torch ``Conv3d.weight`` ``[out, in, t, h, w]`` → ``[t, h, w, in, out]``
    (channels-last DHWIO);
  * torch ``Conv2d.weight`` ``[out, in, h, w]`` → ``[h, w, in, out]``;
  * LayerNorm/GroupNorm ``weight``/``bias`` → ``scale``/``bias``.

Converters accept any ``Mapping[str, np.ndarray]`` — a loaded safetensors
index or a torch ``state_dict`` (tensors are converted) — so the same code
path is exercised by the tiny-model parity tests and by real checkpoints.
"""

from __future__ import annotations

import contextlib
import json
import os
from typing import Dict, Mapping

import numpy as np
import jax.numpy as jnp


_HOST_MODE = False


@contextlib.contextmanager
def host_tree():
    """Convert into HOST numpy leaves (ml_dtypes bf16) instead of device
    arrays. Used for quantize-before-streaming: at 5–14B scale the bf16 tree
    plus its int8 copy cannot both be HBM-resident (``ops/quant.py``
    ``quantize_pipeline`` caution), so conversion stays host-side, the
    quantizer runs on numpy (native C++ kernel), and only the quantized tree
    is streamed (``core.device.stream_tree``)."""
    global _HOST_MODE
    prev = _HOST_MODE
    _HOST_MODE = True
    try:
        yield
    finally:
        _HOST_MODE = prev


def _as(x, dtype=None):
    if _HOST_MODE:
        # jnp dtypes (incl. bfloat16) are numpy/ml_dtypes dtypes — np handles them
        return np.asarray(x, dtype=dtype) if dtype is not None else np.asarray(x)
    return jnp.asarray(x, dtype)


def _stack(xs):
    if _HOST_MODE:
        return np.stack(xs)
    return jnp.stack(xs)


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (incl. bf16) without importing torch at module scope
    try:
        import torch

        if isinstance(x, torch.Tensor):
            t = x.detach()
            if t.dtype == torch.bfloat16:
                return t.float().numpy().astype(np.float32)
            return t.numpy()
    except ImportError:
        pass
    return np.asarray(x)


def linear(state: Mapping, prefix: str, dtype=None) -> Dict:
    w = _np(state[f"{prefix}.weight"]).T
    p = {"kernel": _as(w, dtype)}
    if f"{prefix}.bias" in state:
        p["bias"] = _as(_np(state[f"{prefix}.bias"]), dtype)
    return p


def norm(state: Mapping, prefix: str, dtype=None) -> Dict:
    p = {"scale": _as(_np(state[f"{prefix}.weight"]), dtype)}
    if f"{prefix}.bias" in state:
        p["bias"] = _as(_np(state[f"{prefix}.bias"]), dtype)
    return p


def conv3d(state: Mapping, prefix: str, dtype=None) -> Dict:
    w = _np(state[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0)  # OIDHW → DHWIO
    p = {"kernel": _as(w, dtype)}
    if f"{prefix}.bias" in state:
        p["bias"] = _as(_np(state[f"{prefix}.bias"]), dtype)
    return p


def conv2d(state: Mapping, prefix: str, dtype=None) -> Dict:
    w = _np(state[f"{prefix}.weight"]).transpose(2, 3, 1, 0)  # OIHW → HWIO
    p = {"kernel": _as(w, dtype)}
    if f"{prefix}.bias" in state:
        p["bias"] = _as(_np(state[f"{prefix}.bias"]), dtype)
    return p


def embedding(state: Mapping, key: str, dtype=None):
    return _as(_np(state[key]), dtype)


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all ``*.safetensors`` under ``path`` into one name→array dict."""
    from safetensors import safe_open

    state: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                state[k] = f.get_tensor(k)
    return state


# ---------------------------------------------------------------------------
# per-model converters
# ---------------------------------------------------------------------------


def convert_t5_encoder(state: Mapping, cfg, dtype=None) -> Dict:
    """transformers ``T5EncoderModel`` / ``UMT5EncoderModel`` state_dict."""
    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        attn = {
            "q": linear(state, f"{b}.layer.0.SelfAttention.q", dtype),
            "k": linear(state, f"{b}.layer.0.SelfAttention.k", dtype),
            "v": linear(state, f"{b}.layer.0.SelfAttention.v", dtype),
            "o": linear(state, f"{b}.layer.0.SelfAttention.o", dtype),
        }
        rb = f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"
        if rb in state:
            attn["relative_attention_bias"] = _as(_np(state[rb]), dtype)
        blocks.append(
            {
                "attn_norm": norm(state, f"{b}.layer.0.layer_norm", dtype),
                "attn": attn,
                "ff_norm": norm(state, f"{b}.layer.1.layer_norm", dtype),
                "wi_0": linear(state, f"{b}.layer.1.DenseReluDense.wi_0", dtype),
                "wi_1": linear(state, f"{b}.layer.1.DenseReluDense.wi_1", dtype),
                "wo": linear(state, f"{b}.layer.1.DenseReluDense.wo", dtype),
            }
        )
    return {
        "embed": embedding(state, "shared.weight", dtype),
        "blocks": blocks,
        "final_norm": norm(state, "encoder.final_layer_norm", dtype),
    }


def _convert_clip_layers(state: Mapping, prefix: str, n_layers: int, dtype) -> list:
    layers = []
    for i in range(n_layers):
        b = f"{prefix}.encoder.layers.{i}"
        layers.append(
            {
                "layer_norm1": norm(state, f"{b}.layer_norm1", dtype),
                "attn": {
                    "q": linear(state, f"{b}.self_attn.q_proj", dtype),
                    "k": linear(state, f"{b}.self_attn.k_proj", dtype),
                    "v": linear(state, f"{b}.self_attn.v_proj", dtype),
                    "out": linear(state, f"{b}.self_attn.out_proj", dtype),
                },
                "layer_norm2": norm(state, f"{b}.layer_norm2", dtype),
                "mlp": {
                    "fc1": linear(state, f"{b}.mlp.fc1", dtype),
                    "fc2": linear(state, f"{b}.mlp.fc2", dtype),
                },
            }
        )
    return layers


def convert_clip_vision(state: Mapping, cfg, dtype=None) -> Dict:
    """transformers ``CLIPVisionModel`` state_dict."""
    p = "vision_model"
    return {
        "class_embedding": embedding(state, f"{p}.embeddings.class_embedding", dtype),
        "patch_embedding": {
            "kernel": _as(
                _np(state[f"{p}.embeddings.patch_embedding.weight"]).transpose(2, 3, 1, 0), dtype
            )
        },
        "position_embedding": embedding(state, f"{p}.embeddings.position_embedding.weight", dtype),
        "pre_layrnorm": norm(state, f"{p}.pre_layrnorm", dtype),  # [sic] HF name
        "layers": _convert_clip_layers(state, p, cfg.num_hidden_layers, dtype),
        "post_layernorm": norm(state, f"{p}.post_layernorm", dtype),
    }


def convert_clip_text(state: Mapping, cfg, dtype=None) -> Dict:
    """transformers ``CLIPTextModel`` state_dict."""
    p = "text_model"
    return {
        "token_embedding": embedding(state, f"{p}.embeddings.token_embedding.weight", dtype),
        "position_embedding": embedding(state, f"{p}.embeddings.position_embedding.weight", dtype),
        "layers": _convert_clip_layers(state, p, cfg.num_hidden_layers, dtype),
        "final_layer_norm": norm(state, f"{p}.final_layer_norm", dtype),
    }


def convert_llama(state: Mapping, cfg, dtype=None, prefix: str = "model") -> Dict:
    """transformers ``LlamaModel`` state_dict (decoder weights only)."""
    dot = f"{prefix}." if prefix else ""
    blocks = []
    for i in range(cfg.num_hidden_layers):
        b = f"{dot}layers.{i}"
        blocks.append(
            {
                "input_norm": {"scale": _as(_np(state[f"{b}.input_layernorm.weight"]), dtype)},
                "q": linear(state, f"{b}.self_attn.q_proj", dtype),
                "k": linear(state, f"{b}.self_attn.k_proj", dtype),
                "v": linear(state, f"{b}.self_attn.v_proj", dtype),
                "o": linear(state, f"{b}.self_attn.o_proj", dtype),
                "post_norm": {"scale": _as(_np(state[f"{b}.post_attention_layernorm.weight"]), dtype)},
                "gate": linear(state, f"{b}.mlp.gate_proj", dtype),
                "up": linear(state, f"{b}.mlp.up_proj", dtype),
                "down": linear(state, f"{b}.mlp.down_proj", dtype),
            }
        )
    return {
        "embed": embedding(state, f"{dot}embed_tokens.weight", dtype),
        "blocks": blocks,
        "final_norm": {"scale": _as(_np(state[f"{dot}norm.weight"]), dtype)},
    }


def convert_llava(state: Mapping, cfg, dtype=None) -> Dict:
    """transformers ``LlavaForConditionalGeneration`` state_dict. Handles both
    the legacy (``language_model.model.*``) and new (``model.language_model.*``)
    layouts."""
    if any(k.startswith("language_model.model.") for k in state):
        lm_prefix, vt_prefix, mp_prefix = (
            "language_model.model",
            "vision_tower",
            "multi_modal_projector",
        )
    else:
        lm_prefix, vt_prefix, mp_prefix = (
            "model.language_model",
            "model.vision_tower",
            "model.multi_modal_projector",
        )
    vt_state = {k[len(vt_prefix) + 1 :]: v for k, v in state.items() if k.startswith(vt_prefix + ".")}
    return {
        "language_model": convert_llama(state, cfg.text, dtype, prefix=lm_prefix),
        "vision_tower": convert_clip_vision(vt_state, cfg.vision, dtype),
        "projector": {
            "linear_1": linear(state, f"{mp_prefix}.linear_1", dtype),
            "linear_2": linear(state, f"{mp_prefix}.linear_2", dtype),
        },
    }


def convert_cogvideox_transformer(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``CogVideoXTransformer3DModel`` state_dict."""
    import jax

    p = cfg.patch_size
    pt = cfg.patch_size_t

    # patch embed: conv2d for 1.0 ([dim, C, p, p] → [C·p·p, dim] with (c,p,p)
    # flatten order matching our patchify), linear for 1.5
    pe_w = _np(state["patch_embed.proj.weight"])
    if pe_w.ndim == 4:
        w = pe_w.reshape(pe_w.shape[0], -1).T  # [(C·p·p), dim]
    else:
        w = pe_w.T
    patch_embed = {
        "proj": {"kernel": _as(w, dtype), "bias": _as(_np(state["patch_embed.proj.bias"]), dtype)},
        "text_proj": linear(state, "patch_embed.text_proj", dtype),
    }

    def block(i):
        b = f"transformer_blocks.{i}"
        return {
            "norm1": {
                "linear": linear(state, f"{b}.norm1.linear", dtype),
                "norm": norm(state, f"{b}.norm1.norm", dtype),
            },
            "attn": {
                "to_q": linear(state, f"{b}.attn1.to_q", dtype),
                "to_k": linear(state, f"{b}.attn1.to_k", dtype),
                "to_v": linear(state, f"{b}.attn1.to_v", dtype),
                "to_out": linear(state, f"{b}.attn1.to_out.0", dtype),
                "norm_q": norm(state, f"{b}.attn1.norm_q", dtype),
                "norm_k": norm(state, f"{b}.attn1.norm_k", dtype),
            },
            "norm2": {
                "linear": linear(state, f"{b}.norm2.linear", dtype),
                "norm": norm(state, f"{b}.norm2.norm", dtype),
            },
            "ff": {
                "fc_in": linear(state, f"{b}.ff.net.0.proj", dtype),
                "fc_out": linear(state, f"{b}.ff.net.2", dtype),
            },
        }

    import jax as _jax

    blocks = [block(i) for i in range(cfg.num_layers)]
    params = {
        "patch_embed": patch_embed,
        "time_embedding": {
            "linear_1": linear(state, "time_embedding.linear_1", dtype),
            "linear_2": linear(state, "time_embedding.linear_2", dtype),
        },
        "blocks": _jax.tree.map(lambda *xs: _stack(xs), *blocks),
        "norm_final": norm(state, "norm_final", dtype),
        "norm_out": {
            "linear": linear(state, "norm_out.linear", dtype),
            "norm": norm(state, "norm_out.norm", dtype),
        },
        "proj_out": linear(state, "proj_out", dtype),
    }
    if "ofs_embedding.linear_1.weight" in state:
        params["ofs_embedding"] = {
            "linear_1": linear(state, "ofs_embedding.linear_1", dtype),
            "linear_2": linear(state, "ofs_embedding.linear_2", dtype),
        }
    return params


def convert_wan_transformer(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``WanTransformer3DModel`` state_dict.

    NOTE: name map written against diffusers' published module layout; only
    verifiable against a real checkpoint (none downloadable here — zero
    egress). Structure errors surface as KeyErrors at load time, not silent
    corruption."""
    import jax as _jax

    pe_w = _np(state["patch_embedding.weight"])  # [dim, in, pt, ph, pw]
    patch = {
        "kernel": _as(pe_w.reshape(pe_w.shape[0], -1).T, dtype),
        "bias": _as(_np(state["patch_embedding.bias"]), dtype),
    }
    ce = {
        "time_embedder": {
            "linear_1": linear(state, "condition_embedder.time_embedder.linear_1", dtype),
            "linear_2": linear(state, "condition_embedder.time_embedder.linear_2", dtype),
        },
        "time_proj": linear(state, "condition_embedder.time_proj", dtype),
        "text_embedder": {
            "linear_1": linear(state, "condition_embedder.text_embedder.linear_1", dtype),
            "linear_2": linear(state, "condition_embedder.text_embedder.linear_2", dtype),
        },
    }
    if "condition_embedder.image_embedder.norm1.weight" in state:
        ce["image_embedder"] = {
            "norm1": norm(state, "condition_embedder.image_embedder.norm1", dtype),
            "ff_in": linear(state, "condition_embedder.image_embedder.ff.net.0.proj", dtype),
            "ff_out": linear(state, "condition_embedder.image_embedder.ff.net.2", dtype),
            "norm2": norm(state, "condition_embedder.image_embedder.norm2", dtype),
        }

    def attn(prefix, with_added):
        p = {
            "to_q": linear(state, f"{prefix}.to_q", dtype),
            "to_k": linear(state, f"{prefix}.to_k", dtype),
            "to_v": linear(state, f"{prefix}.to_v", dtype),
            "to_out": linear(state, f"{prefix}.to_out.0", dtype),
            "norm_q": {"scale": _as(_np(state[f"{prefix}.norm_q.weight"]), dtype)},
            "norm_k": {"scale": _as(_np(state[f"{prefix}.norm_k.weight"]), dtype)},
        }
        if with_added:
            p["add_k_proj"] = linear(state, f"{prefix}.add_k_proj", dtype)
            p["add_v_proj"] = linear(state, f"{prefix}.add_v_proj", dtype)
            p["norm_added_k"] = {
                "scale": _as(_np(state[f"{prefix}.norm_added_k.weight"]), dtype)
            }
        return p

    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        blocks.append(
            {
                "scale_shift_table": _as(
                    _np(state[f"{b}.scale_shift_table"]).reshape(6, -1), dtype
                ),
                "attn1": attn(f"{b}.attn1", False),
                "attn2": attn(f"{b}.attn2", cfg.image_dim is not None),
                "norm2": norm(state, f"{b}.norm2", dtype),
                "ffn": {
                    "fc_in": linear(state, f"{b}.ffn.net.0.proj", dtype),
                    "fc_out": linear(state, f"{b}.ffn.net.2", dtype),
                },
            }
        )
    return {
        "patch_embedding": patch,
        "condition_embedder": ce,
        "blocks": _jax.tree.map(lambda *xs: _stack(xs), *blocks),
        "scale_shift_table": _as(_np(state["scale_shift_table"]).reshape(2, -1), dtype),
        "proj_out": linear(state, "proj_out", dtype),
    }


def convert_hunyuan_transformer(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``HunyuanVideoTransformer3DModel`` state_dict (same
    verification caveat as :func:`convert_wan_transformer`)."""
    import jax as _jax

    xe_w = _np(state["x_embedder.proj.weight"])  # conv3d [dim, C, pt, p, p]
    params = {
        "x_embedder": {
            "kernel": _as(xe_w.reshape(xe_w.shape[0], -1).T, dtype),
            "bias": _as(_np(state["x_embedder.proj.bias"]), dtype),
        },
        "context_embedder": {
            "input_embedder": linear(state, "context_embedder.proj_in", dtype),
            "t_embedder": {
                "linear_1": linear(state, "context_embedder.time_text_embed.timestep_embedder.linear_1", dtype),
                "linear_2": linear(state, "context_embedder.time_text_embed.timestep_embedder.linear_2", dtype),
            },
            "c_embedder": {
                "linear_1": linear(state, "context_embedder.time_text_embed.text_embedder.linear_1", dtype),
                "linear_2": linear(state, "context_embedder.time_text_embed.text_embedder.linear_2", dtype),
            },
            "blocks": [
                {
                    "norm1": norm(state, f"context_embedder.token_refiner.refiner_blocks.{i}.norm1", dtype),
                    "attn": {
                        "to_q": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_q", dtype),
                        "to_k": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_k", dtype),
                        "to_v": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_v", dtype),
                        "to_out": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_out.0", dtype),
                    },
                    "norm2": norm(state, f"context_embedder.token_refiner.refiner_blocks.{i}.norm2", dtype),
                    "ff": {
                        "fc_in": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.ff.net.0.proj", dtype),
                        "fc_out": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.ff.net.2", dtype),
                    },
                    "ada": linear(state, f"context_embedder.token_refiner.refiner_blocks.{i}.norm_out.linear", dtype),
                }
                for i in range(cfg.num_refiner_layers)
            ],
        },
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": linear(state, "time_text_embed.timestep_embedder.linear_1", dtype),
                "linear_2": linear(state, "time_text_embed.timestep_embedder.linear_2", dtype),
            },
            "text_embedder": {
                "linear_1": linear(state, "time_text_embed.text_embedder.linear_1", dtype),
                "linear_2": linear(state, "time_text_embed.text_embedder.linear_2", dtype),
            },
        },
        "norm_out": {"linear": linear(state, "norm_out.linear", dtype)},
        "proj_out": linear(state, "proj_out", dtype),
    }
    if "time_text_embed.guidance_embedder.linear_1.weight" in state:
        params["time_text_embed"]["guidance_embedder"] = {
            "linear_1": linear(state, "time_text_embed.guidance_embedder.linear_1", dtype),
            "linear_2": linear(state, "time_text_embed.guidance_embedder.linear_2", dtype),
        }

    def rms(prefix):
        return {"scale": _as(_np(state[f"{prefix}.weight"]), dtype)}

    dblocks = []
    for i in range(cfg.num_layers):
        b = f"transformer_blocks.{i}"
        dblocks.append(
            {
                "norm1_linear": linear(state, f"{b}.norm1.linear", dtype),
                "norm1_context_linear": linear(state, f"{b}.norm1_context.linear", dtype),
                "attn": {
                    "to_q": linear(state, f"{b}.attn.to_q", dtype),
                    "to_k": linear(state, f"{b}.attn.to_k", dtype),
                    "to_v": linear(state, f"{b}.attn.to_v", dtype),
                    "to_out": linear(state, f"{b}.attn.to_out.0", dtype),
                    "add_q_proj": linear(state, f"{b}.attn.add_q_proj", dtype),
                    "add_k_proj": linear(state, f"{b}.attn.add_k_proj", dtype),
                    "add_v_proj": linear(state, f"{b}.attn.add_v_proj", dtype),
                    "to_add_out": linear(state, f"{b}.attn.to_add_out", dtype),
                    "norm_q": rms(f"{b}.attn.norm_q"),
                    "norm_k": rms(f"{b}.attn.norm_k"),
                    "norm_added_q": rms(f"{b}.attn.norm_added_q"),
                    "norm_added_k": rms(f"{b}.attn.norm_added_k"),
                },
                "ff": {
                    "fc_in": linear(state, f"{b}.ff.net.0.proj", dtype),
                    "fc_out": linear(state, f"{b}.ff.net.2", dtype),
                },
                "ff_context": {
                    "fc_in": linear(state, f"{b}.ff_context.net.0.proj", dtype),
                    "fc_out": linear(state, f"{b}.ff_context.net.2", dtype),
                },
            }
        )
    params["transformer_blocks"] = _jax.tree.map(lambda *xs: _stack(xs), *dblocks)

    sblocks = []
    for i in range(cfg.num_single_layers):
        b = f"single_transformer_blocks.{i}"
        sblocks.append(
            {
                "norm_linear": linear(state, f"{b}.norm.linear", dtype),
                "attn": {
                    "to_q": linear(state, f"{b}.attn.to_q", dtype),
                    "to_k": linear(state, f"{b}.attn.to_k", dtype),
                    "to_v": linear(state, f"{b}.attn.to_v", dtype),
                    "norm_q": rms(f"{b}.attn.norm_q"),
                    "norm_k": rms(f"{b}.attn.norm_k"),
                },
                "proj_mlp": linear(state, f"{b}.proj_mlp", dtype),
                "proj_out": linear(state, f"{b}.proj_out", dtype),
            }
        )
    params["single_transformer_blocks"] = _jax.tree.map(lambda *xs: _stack(xs), *sblocks)
    return params


def _gamma(state: Mapping, key: str, dtype=None):
    return {"gamma": _as(_np(state[key]).reshape(-1), dtype)}


def convert_wan_vae(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``AutoencoderKLWan`` state_dict (flat down/up block lists:
    resnets interleaved with resamples). Name map verifiable only against a
    real checkpoint (zero egress)."""

    def resnet(prefix):
        p = {
            "norm1": _gamma(state, f"{prefix}.norm1.gamma", dtype),
            "conv1": conv3d(state, f"{prefix}.conv1", dtype),
            "norm2": _gamma(state, f"{prefix}.norm2.gamma", dtype),
            "conv2": conv3d(state, f"{prefix}.conv2", dtype),
        }
        if f"{prefix}.conv_shortcut.weight" in state:
            p["conv_shortcut"] = conv3d(state, f"{prefix}.conv_shortcut", dtype)
        return p

    def attention(prefix):
        def conv1x1_as_3d(key_w):
            w = _np(state[key_w])  # [out, in, 1, 1]
            return _as(w.reshape(w.shape[0], w.shape[1]).T[None, None, None], dtype)

        return {
            "norm": _gamma(state, f"{prefix}.norm.gamma", dtype),
            "to_qkv": {
                "kernel": conv1x1_as_3d(f"{prefix}.to_qkv.weight"),
                "bias": _as(_np(state[f"{prefix}.to_qkv.bias"]), dtype),
            },
            "proj": {
                "kernel": conv1x1_as_3d(f"{prefix}.proj.weight"),
                "bias": _as(_np(state[f"{prefix}.proj.bias"]), dtype),
            },
        }

    n_stages = len(cfg.dim_mult)
    enc = {"conv_in": conv3d(state, "encoder.conv_in", dtype), "down": []}
    idx = 0
    for i in range(n_stages):
        blk = {"resnets": []}
        for _ in range(cfg.num_res_blocks):
            blk["resnets"].append(resnet(f"encoder.down_blocks.{idx}"))
            idx += 1
        if i < n_stages - 1:
            pre = f"encoder.down_blocks.{idx}"
            blk["downsample"] = {"conv": conv2d(state, f"{pre}.resample.1", dtype)}
            if f"{pre}.time_conv.weight" in state:
                blk["downsample"]["time_conv"] = conv3d(state, f"{pre}.time_conv", dtype)
            idx += 1
        enc["down"].append(blk)
    enc["mid"] = {
        "resnet1": resnet("encoder.mid_block.resnets.0"),
        "attn": attention("encoder.mid_block.attentions.0"),
        "resnet2": resnet("encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _gamma(state, "encoder.norm_out.gamma", dtype)
    enc["conv_out"] = conv3d(state, "encoder.conv_out", dtype)

    dec = {"conv_in": conv3d(state, "decoder.conv_in", dtype)}
    dec["mid"] = {
        "resnet1": resnet("decoder.mid_block.resnets.0"),
        "attn": attention("decoder.mid_block.attentions.0"),
        "resnet2": resnet("decoder.mid_block.resnets.1"),
    }
    dec["up"] = []
    idx = 0
    for i in range(n_stages):
        blk = {"resnets": []}
        for _ in range(cfg.num_res_blocks + 1):
            blk["resnets"].append(resnet(f"decoder.up_blocks.{idx}"))
            idx += 1
        if i < n_stages - 1:
            pre = f"decoder.up_blocks.{idx}"
            blk["upsample"] = {"conv": conv2d(state, f"{pre}.resample.1", dtype)}
            if f"{pre}.time_conv.weight" in state:
                blk["upsample"]["time_conv"] = conv3d(state, f"{pre}.time_conv", dtype)
            idx += 1
        dec["up"].append(blk)
    dec["norm_out"] = _gamma(state, "decoder.norm_out.gamma", dtype)
    dec["conv_out"] = conv3d(state, "decoder.conv_out", dtype)
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv3d(state, "quant_conv", dtype),
        "post_quant_conv": conv3d(state, "post_quant_conv", dtype),
    }


def convert_hunyuan_vae(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``AutoencoderKLHunyuanVideo`` state_dict (same verification
    caveat — zero egress)."""

    def resnet(prefix):
        p = {
            "norm1": norm(state, f"{prefix}.norm1", dtype),
            "conv1": conv3d(state, f"{prefix}.conv1", dtype),
            "norm2": norm(state, f"{prefix}.norm2", dtype),
            "conv2": conv3d(state, f"{prefix}.conv2", dtype),
        }
        if f"{prefix}.conv_shortcut.weight" in state:
            p["conv_shortcut"] = conv3d(state, f"{prefix}.conv_shortcut", dtype)
        return p

    def attention(prefix):
        return {
            "group_norm": norm(state, f"{prefix}.group_norm", dtype),
            "to_q": linear(state, f"{prefix}.to_q", dtype),
            "to_k": linear(state, f"{prefix}.to_k", dtype),
            "to_v": linear(state, f"{prefix}.to_v", dtype),
            "to_out": linear(state, f"{prefix}.to_out.0", dtype),
        }

    n = len(cfg.block_out_channels)
    enc = {"conv_in": conv3d(state, "encoder.conv_in", dtype), "down": []}
    for i in range(n):
        blk = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}") for j in range(cfg.layers_per_block)
            ]
        }
        dkey = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{dkey}.weight" in state:
            blk["downsample"] = {"conv": conv3d(state, dkey, dtype)}
        enc["down"].append(blk)
    enc["mid"] = {
        "resnet1": resnet("encoder.mid_block.resnets.0"),
        "attn": attention("encoder.mid_block.attentions.0"),
        "resnet2": resnet("encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = norm(state, "encoder.conv_norm_out", dtype)
    enc["conv_out"] = conv3d(state, "encoder.conv_out", dtype)

    dec = {"conv_in": conv3d(state, "decoder.conv_in", dtype)}
    dec["mid"] = {
        "resnet1": resnet("decoder.mid_block.resnets.0"),
        "attn": attention("decoder.mid_block.attentions.0"),
        "resnet2": resnet("decoder.mid_block.resnets.1"),
    }
    dec["up"] = []
    for i in range(n):
        blk = {
            "resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}")
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        ukey = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{ukey}.weight" in state:
            blk["upsample"] = {"conv": conv3d(state, ukey, dtype)}
        dec["up"].append(blk)
    dec["norm_out"] = norm(state, "decoder.conv_norm_out", dtype)
    dec["conv_out"] = conv3d(state, "decoder.conv_out", dtype)
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": conv3d(state, "quant_conv", dtype),
        "post_quant_conv": conv3d(state, "post_quant_conv", dtype),
    }


def convert_cogvideox_vae(state: Mapping, cfg, dtype=None) -> Dict:
    """diffusers ``AutoencoderKLCogVideoX`` state_dict."""
    n = len(cfg.block_out_channels)

    def conv_block(prefix):
        return conv3d(state, f"{prefix}.conv", dtype)

    def resnet(prefix, spatial: bool):
        p = {
            "conv1": conv3d(state, f"{prefix}.conv1.conv", dtype),
            "conv2": conv3d(state, f"{prefix}.conv2.conv", dtype),
        }
        if spatial:
            for nm in ("norm1", "norm2"):
                p[nm] = {
                    "norm": norm(state, f"{prefix}.{nm}.norm_layer", dtype),
                    "conv_y": conv3d(state, f"{prefix}.{nm}.conv_y.conv", dtype),
                    "conv_b": conv3d(state, f"{prefix}.{nm}.conv_b.conv", dtype),
                }
        else:
            p["norm1"] = norm(state, f"{prefix}.norm1", dtype)
            p["norm2"] = norm(state, f"{prefix}.norm2", dtype)
        if f"{prefix}.conv_shortcut.conv.weight" in state:
            p["conv_shortcut"] = conv3d(state, f"{prefix}.conv_shortcut.conv", dtype)
        return p

    enc = {
        "conv_in": conv3d(state, "encoder.conv_in.conv", dtype),
        "down": [],
        "mid": [resnet(f"encoder.mid_block.resnets.{j}", False) for j in range(2)],
        "norm_out": norm(state, "encoder.norm_out", dtype),
        "conv_out": conv3d(state, "encoder.conv_out.conv", dtype),
    }
    for i in range(n):
        blk = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}", False)
                for j in range(cfg.layers_per_block)
            ]
        }
        dkey = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{dkey}.weight" in state:
            blk["downsample"] = {"conv": conv2d(state, dkey, dtype)}
        enc["down"].append(blk)

    dec = {
        "conv_in": conv3d(state, "decoder.conv_in.conv", dtype),
        "mid": [resnet(f"decoder.mid_block.resnets.{j}", True) for j in range(2)],
        "up": [],
        "norm_out": {
            "norm": norm(state, "decoder.norm_out.norm_layer", dtype),
            "conv_y": conv3d(state, "decoder.norm_out.conv_y.conv", dtype),
            "conv_b": conv3d(state, "decoder.norm_out.conv_b.conv", dtype),
        },
        "conv_out": conv3d(state, "decoder.conv_out.conv", dtype),
    }
    for i in range(n):
        blk = {
            "resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}", True)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        ukey = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{ukey}.weight" in state:
            blk["upsample"] = {"conv": conv2d(state, ukey, dtype)}
        dec["up"].append(blk)
    return {"encoder": enc, "decoder": dec}
