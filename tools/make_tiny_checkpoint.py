"""Build a tiny random CogVideoX-I2V checkpoint in HF repo layout.

Emits exactly the diffusers/transformers tensor names the alg_tpu weight
converters consume, so loading it exercises the full real checkpoint path
(configs → safetensors → converters → pipeline) without network egress.
Used by tests/test_cli.py and handy for manual CLI smoke runs:

    python tools/make_tiny_checkpoint.py /tmp/tiny_cogvideox
    python run.py --config <tiny yaml> --model_cache_dir /tmp
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def _save(path: str, tensors: dict) -> None:
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(tensors, path)


def _w(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def make_transformer(root: str, rng) -> dict:
    cfg = {
        "num_attention_heads": 2,
        "attention_head_dim": 16,
        "in_channels": 8,
        "out_channels": 4,
        "time_embed_dim": 16,
        "text_embed_dim": 16,
        "num_layers": 2,
        "attention_bias": True,
        "sample_width": 8,
        "sample_height": 8,
        "sample_frames": 9,
        "patch_size": 2,
        "patch_size_t": None,
        "max_text_seq_length": 16,
        "norm_eps": 1e-5,
        "use_rotary_positional_embeddings": True,
    }
    dim = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    te = cfg["time_embed_dim"]
    st = {
        "patch_embed.proj.weight": _w(rng, dim, cfg["in_channels"], 2, 2),
        "patch_embed.proj.bias": _w(rng, dim),
        "patch_embed.text_proj.weight": _w(rng, dim, cfg["text_embed_dim"]),
        "patch_embed.text_proj.bias": _w(rng, dim),
        "time_embedding.linear_1.weight": _w(rng, te, dim),
        "time_embedding.linear_1.bias": _w(rng, te),
        "time_embedding.linear_2.weight": _w(rng, te, te),
        "time_embedding.linear_2.bias": _w(rng, te),
        "norm_final.weight": np.ones(dim, np.float32),
        "norm_final.bias": np.zeros(dim, np.float32),
        "norm_out.linear.weight": _w(rng, 2 * dim, te),
        "norm_out.linear.bias": _w(rng, 2 * dim),
        "norm_out.norm.weight": np.ones(dim, np.float32),
        "norm_out.norm.bias": np.zeros(dim, np.float32),
        "proj_out.weight": _w(rng, 2 * 2 * cfg["out_channels"], dim),
        "proj_out.bias": _w(rng, 2 * 2 * cfg["out_channels"]),
    }
    for i in range(cfg["num_layers"]):
        b = f"transformer_blocks.{i}"
        for nm in ("norm1", "norm2"):
            st[f"{b}.{nm}.linear.weight"] = _w(rng, 6 * dim, te)
            st[f"{b}.{nm}.linear.bias"] = _w(rng, 6 * dim)
            st[f"{b}.{nm}.norm.weight"] = np.ones(dim, np.float32)
            st[f"{b}.{nm}.norm.bias"] = np.zeros(dim, np.float32)
        for nm in ("to_q", "to_k", "to_v"):
            st[f"{b}.attn1.{nm}.weight"] = _w(rng, dim, dim)
            st[f"{b}.attn1.{nm}.bias"] = _w(rng, dim)
        st[f"{b}.attn1.to_out.0.weight"] = _w(rng, dim, dim)
        st[f"{b}.attn1.to_out.0.bias"] = _w(rng, dim)
        st[f"{b}.attn1.norm_q.weight"] = np.ones(16, np.float32)
        st[f"{b}.attn1.norm_q.bias"] = np.zeros(16, np.float32)
        st[f"{b}.attn1.norm_k.weight"] = np.ones(16, np.float32)
        st[f"{b}.attn1.norm_k.bias"] = np.zeros(16, np.float32)
        st[f"{b}.ff.net.0.proj.weight"] = _w(rng, 4 * dim, dim)
        st[f"{b}.ff.net.0.proj.bias"] = _w(rng, 4 * dim)
        st[f"{b}.ff.net.2.weight"] = _w(rng, dim, 4 * dim)
        st[f"{b}.ff.net.2.bias"] = _w(rng, dim)
    os.makedirs(os.path.join(root, "transformer"), exist_ok=True)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(cfg, f)
    _save(os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"), st)
    return cfg


def make_vae(root: str, rng) -> dict:
    cfg = {
        "block_out_channels": [8, 16, 16, 16],
        "latent_channels": 4,
        "layers_per_block": 1,
        "norm_num_groups": 4,
        "norm_eps": 1e-6,
        "temporal_compression_ratio": 4,
        "scaling_factor": 0.7,
        "invert_scale_latents": False,
    }
    boc = cfg["block_out_channels"]
    z = cfg["latent_channels"]
    st = {}

    def conv3d(name, cin, cout, k=3):
        st[f"{name}.conv.weight"] = _w(rng, cout, cin, k, k, k)
        st[f"{name}.conv.bias"] = _w(rng, cout)

    def gn(name, ch):
        st[f"{name}.weight"] = np.ones(ch, np.float32)
        st[f"{name}.bias"] = np.zeros(ch, np.float32)

    def resnet(name, cin, cout, spatial=False):
        conv3d(f"{name}.conv1", cin, cout)
        conv3d(f"{name}.conv2", cout, cout)
        if spatial:
            for nm, ch in (("norm1", cin), ("norm2", cout)):
                gn(f"{name}.{nm}.norm_layer", ch)
                conv3d(f"{name}.{nm}.conv_y", z, ch, k=1)
                conv3d(f"{name}.{nm}.conv_b", z, ch, k=1)
        else:
            gn(f"{name}.norm1", cin)
            gn(f"{name}.norm2", cout)
        if cin != cout:
            conv3d(f"{name}.conv_shortcut", cin, cout, k=1)

    conv3d("encoder.conv_in", 3, boc[0])
    ch = boc[0]
    for i, out in enumerate(boc):
        resnet(f"encoder.down_blocks.{i}.resnets.0", ch, out)
        ch = out
        if i < len(boc) - 1:
            st[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = _w(rng, out, out, 3, 3)
            st[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = _w(rng, out)
    for j in range(2):
        resnet(f"encoder.mid_block.resnets.{j}", ch, ch)
    gn("encoder.norm_out", ch)
    conv3d("encoder.conv_out", ch, 2 * z)

    rev = list(reversed(boc))
    conv3d("decoder.conv_in", z, rev[0])
    for j in range(2):
        resnet(f"decoder.mid_block.resnets.{j}", rev[0], rev[0], spatial=True)
    ch = rev[0]
    for i, out in enumerate(rev):
        for j in range(cfg["layers_per_block"] + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ch if j == 0 else out, out, spatial=True)
        ch = out
        if i < len(rev) - 1:
            st[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = _w(rng, out, out, 3, 3)
            st[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = _w(rng, out)
    gn("decoder.norm_out.norm_layer", ch)
    conv3d("decoder.norm_out.conv_y", z, ch, k=1)
    conv3d("decoder.norm_out.conv_b", z, ch, k=1)
    conv3d("decoder.conv_out", ch, 3)

    os.makedirs(os.path.join(root, "vae"), exist_ok=True)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump(cfg, f)
    _save(os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"), st)
    return cfg


def make_text_encoder(root: str, rng) -> dict:
    cfg = {
        "vocab_size": 64,
        "d_model": 16,
        "d_kv": 4,
        "d_ff": 32,
        "num_layers": 2,
        "num_heads": 4,
        "relative_attention_num_buckets": 8,
        "relative_attention_max_distance": 16,
    }
    st = {"shared.weight": _w(rng, cfg["vocab_size"], cfg["d_model"], scale=1.0)}
    for i in range(cfg["num_layers"]):
        b = f"encoder.block.{i}"
        for nm in ("q", "k", "v"):
            st[f"{b}.layer.0.SelfAttention.{nm}.weight"] = _w(rng, 16, 16)
        st[f"{b}.layer.0.SelfAttention.o.weight"] = _w(rng, 16, 16)
        if i == 0:
            st[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] = _w(rng, 8, 4)
        st[f"{b}.layer.0.layer_norm.weight"] = np.ones(16, np.float32)
        st[f"{b}.layer.1.DenseReluDense.wi_0.weight"] = _w(rng, 32, 16)
        st[f"{b}.layer.1.DenseReluDense.wi_1.weight"] = _w(rng, 32, 16)
        st[f"{b}.layer.1.DenseReluDense.wo.weight"] = _w(rng, 16, 32)
        st[f"{b}.layer.1.layer_norm.weight"] = np.ones(16, np.float32)
    st["encoder.final_layer_norm.weight"] = np.ones(16, np.float32)
    os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(cfg, f)
    _save(os.path.join(root, "text_encoder", "model.safetensors"), st)
    return cfg


def make_tokenizer(root: str, vocab_size: int = 64) -> None:
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = {"<pad>": 0, "</s>": 1, "<unk>": 2}
    for i in range(3, vocab_size):
        words[f"tok{i}"] = i
    common = ["a", "red", "double", "decker", "bus", "driving", "down", "street", "the", "panda"]
    for j, w in enumerate(common):
        words[w] = 3 + j
        del words[f"tok{3 + j}"]
    tok = Tokenizer(models.WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok_dir = os.path.join(root, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    tok.save(os.path.join(tok_dir, "tokenizer.json"))
    with open(os.path.join(tok_dir, "tokenizer_config.json"), "w") as f:
        json.dump(
            {
                "tokenizer_class": "PreTrainedTokenizerFast",
                "pad_token": "<pad>",
                "eos_token": "</s>",
                "unk_token": "<unk>",
                "model_max_length": 16,
            },
            f,
        )


def make_scheduler(root: str) -> None:
    os.makedirs(os.path.join(root, "scheduler"), exist_ok=True)
    with open(os.path.join(root, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump(
            {
                "_class_name": "CogVideoXDDIMScheduler",
                "num_train_timesteps": 1000,
                "beta_start": 0.00085,
                "beta_end": 0.012,
                "beta_schedule": "scaled_linear",
                "snr_shift_scale": 3.0,
                "rescale_betas_zero_snr": True,
                "set_alpha_to_one": True,
                "timestep_spacing": "trailing",
                "prediction_type": "v_prediction",
            },
            f,
        )


def build(root: str, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    make_transformer(root, rng)
    make_vae(root, rng)
    make_text_encoder(root, rng)
    make_tokenizer(root)
    make_scheduler(root)


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_cogvideox")
    print("wrote", sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_cogvideox")
