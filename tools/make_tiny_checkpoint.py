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


def make_transformer(root: str, rng, patch_size_t=None) -> dict:
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
        "patch_size_t": patch_size_t,
        "max_text_seq_length": 16,
        "norm_eps": 1e-5,
        "use_rotary_positional_embeddings": True,
    }
    if patch_size_t is not None:
        # 1.5-I2V also carries the ofs conditioning embedding
        cfg["ofs_embed_dim"] = cfg["time_embed_dim"]
    dim = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    te = cfg["time_embed_dim"]
    pt = patch_size_t or 1
    # 1.0 ships a conv2d patch embed [dim, C, p, p]; 1.5 a linear over C*pt*p*p
    if patch_size_t is None:
        pe_w = _w(rng, dim, cfg["in_channels"], 2, 2)
    else:
        pe_w = _w(rng, dim, cfg["in_channels"] * pt * 2 * 2)
    st = {
        "patch_embed.proj.weight": pe_w,
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
        "proj_out.weight": _w(rng, pt * 2 * 2 * cfg["out_channels"], dim),
        "proj_out.bias": _w(rng, pt * 2 * 2 * cfg["out_channels"]),
    }
    if patch_size_t is not None:
        st["ofs_embedding.linear_1.weight"] = _w(rng, te, te)
        st["ofs_embedding.linear_1.bias"] = _w(rng, te)
        st["ofs_embedding.linear_2.weight"] = _w(rng, te, te)
        st["ofs_embedding.linear_2.bias"] = _w(rng, te)
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
    # Llava image slot (Hunyuan tiny config pins image_token_index=60); added
    # as a special token so the Whitespace pre-tokenizer doesn't split it
    words["<image>"] = 60
    del words["tok60"]
    tok = Tokenizer(models.WordLevel(words, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(["<image>"])
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


def build(root: str, seed: int = 0, patch_size_t=None) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    make_transformer(root, rng, patch_size_t=patch_size_t)
    make_vae(root, rng)
    make_text_encoder(root, rng)
    make_tokenizer(root)
    make_scheduler(root)


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_cogvideox")
    print("wrote", sys.argv[1] if len(sys.argv) > 1 else "/tmp/tiny_cogvideox")


# ---------------------------------------------------------------------------
# Wan
# ---------------------------------------------------------------------------


def build_wan(root: str, seed: int = 0) -> None:
    """Tiny Wan2.1-I2V checkpoint matching alg_tpu's Wan converters."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    # transformer
    tcfg = {
        "num_attention_heads": 2,
        "attention_head_dim": 12,
        "in_channels": 12,  # 4 latent + 4 mask + 4 cond
        "out_channels": 4,
        "num_layers": 2,
        "ffn_dim": 32,
        "freq_dim": 16,
        "text_dim": 16,
        "image_dim": 16,  # must equal the image_encoder hidden_size
        "patch_size": [1, 2, 2],
        "eps": 1e-6,
    }
    dim = tcfg["num_attention_heads"] * tcfg["attention_head_dim"]
    st = {
        "patch_embedding.weight": _w(rng, dim, tcfg["in_channels"], 1, 2, 2),
        "patch_embedding.bias": _w(rng, dim),
        "condition_embedder.time_embedder.linear_1.weight": _w(rng, dim, 16),
        "condition_embedder.time_embedder.linear_1.bias": _w(rng, dim),
        "condition_embedder.time_embedder.linear_2.weight": _w(rng, dim, dim),
        "condition_embedder.time_embedder.linear_2.bias": _w(rng, dim),
        "condition_embedder.time_proj.weight": _w(rng, 6 * dim, dim),
        "condition_embedder.time_proj.bias": _w(rng, 6 * dim),
        "condition_embedder.text_embedder.linear_1.weight": _w(rng, dim, 16),
        "condition_embedder.text_embedder.linear_1.bias": _w(rng, dim),
        "condition_embedder.text_embedder.linear_2.weight": _w(rng, dim, dim),
        "condition_embedder.text_embedder.linear_2.bias": _w(rng, dim),
        "condition_embedder.image_embedder.norm1.weight": np.ones(16, np.float32),
        "condition_embedder.image_embedder.norm1.bias": np.zeros(16, np.float32),
        "condition_embedder.image_embedder.ff.net.0.proj.weight": _w(rng, 16, 16),
        "condition_embedder.image_embedder.ff.net.0.proj.bias": _w(rng, 16),
        "condition_embedder.image_embedder.ff.net.2.weight": _w(rng, dim, 16),
        "condition_embedder.image_embedder.ff.net.2.bias": _w(rng, dim),
        "condition_embedder.image_embedder.norm2.weight": np.ones(dim, np.float32),
        "condition_embedder.image_embedder.norm2.bias": np.zeros(dim, np.float32),
        "scale_shift_table": _w(rng, 1, 2, dim),
        "proj_out.weight": _w(rng, 1 * 2 * 2 * tcfg["out_channels"], dim),
        "proj_out.bias": _w(rng, 1 * 2 * 2 * tcfg["out_channels"]),
    }
    for i in range(tcfg["num_layers"]):
        b = f"blocks.{i}"
        st[f"{b}.scale_shift_table"] = _w(rng, 1, 6, dim)
        for an, added in (("attn1", False), ("attn2", True)):
            for nm in ("to_q", "to_k", "to_v"):
                st[f"{b}.{an}.{nm}.weight"] = _w(rng, dim, dim)
                st[f"{b}.{an}.{nm}.bias"] = _w(rng, dim)
            st[f"{b}.{an}.to_out.0.weight"] = _w(rng, dim, dim)
            st[f"{b}.{an}.to_out.0.bias"] = _w(rng, dim)
            st[f"{b}.{an}.norm_q.weight"] = np.ones(dim, np.float32)
            st[f"{b}.{an}.norm_k.weight"] = np.ones(dim, np.float32)
            if added:
                st[f"{b}.{an}.add_k_proj.weight"] = _w(rng, dim, dim)
                st[f"{b}.{an}.add_k_proj.bias"] = _w(rng, dim)
                st[f"{b}.{an}.add_v_proj.weight"] = _w(rng, dim, dim)
                st[f"{b}.{an}.add_v_proj.bias"] = _w(rng, dim)
                st[f"{b}.{an}.norm_added_k.weight"] = np.ones(dim, np.float32)
        st[f"{b}.norm2.weight"] = np.ones(dim, np.float32)
        st[f"{b}.norm2.bias"] = np.zeros(dim, np.float32)
        st[f"{b}.ffn.net.0.proj.weight"] = _w(rng, tcfg["ffn_dim"], dim)
        st[f"{b}.ffn.net.0.proj.bias"] = _w(rng, tcfg["ffn_dim"])
        st[f"{b}.ffn.net.2.weight"] = _w(rng, dim, tcfg["ffn_dim"])
        st[f"{b}.ffn.net.2.bias"] = _w(rng, dim)
    os.makedirs(os.path.join(root, "transformer"), exist_ok=True)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(tcfg, f)
    _save(os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"), st)

    # vae (flat down/up block lists with interleaved resamples)
    vcfg = {
        "base_dim": 8,
        "z_dim": 4,
        "dim_mult": [1, 2, 2, 2],
        "num_res_blocks": 1,
        "temperal_downsample": [False, True, True],
        "latents_mean": list(np.linspace(-0.5, 0.5, 4)),
        "latents_std": list(np.linspace(1.0, 2.0, 4)),
    }
    dims = [vcfg["base_dim"] * m for m in vcfg["dim_mult"]]
    z = vcfg["z_dim"]
    st = {}

    def wconv3(name, cin, cout, kt=3, kh=3, kw=3):
        st[f"{name}.weight"] = _w(rng, cout, cin, kt, kh, kw)
        st[f"{name}.bias"] = _w(rng, cout)

    def wres(name, cin, cout):
        st[f"{name}.norm1.gamma"] = np.ones((cin, 1, 1), np.float32)
        wconv3(f"{name}.conv1", cin, cout)
        st[f"{name}.norm2.gamma"] = np.ones((cout, 1, 1), np.float32)
        wconv3(f"{name}.conv2", cout, cout)
        if cin != cout:
            wconv3(f"{name}.conv_shortcut", cin, cout, 1, 1, 1)

    def wattn(name, ch):
        st[f"{name}.norm.gamma"] = np.ones((ch, 1, 1), np.float32)
        st[f"{name}.to_qkv.weight"] = _w(rng, 3 * ch, ch, 1, 1)
        st[f"{name}.to_qkv.bias"] = _w(rng, 3 * ch)
        st[f"{name}.proj.weight"] = _w(rng, ch, ch, 1, 1)
        st[f"{name}.proj.bias"] = _w(rng, ch)

    wconv3("encoder.conv_in", 3, dims[0])
    idx = 0
    ch = dims[0]
    for i, out in enumerate(dims):
        for _ in range(vcfg["num_res_blocks"]):
            wres(f"encoder.down_blocks.{idx}", ch, out)
            ch = out
            idx += 1
        if i < len(dims) - 1:
            st[f"encoder.down_blocks.{idx}.resample.1.weight"] = _w(rng, out, out, 3, 3)
            st[f"encoder.down_blocks.{idx}.resample.1.bias"] = _w(rng, out)
            if vcfg["temperal_downsample"][i]:
                wconv3(f"encoder.down_blocks.{idx}.time_conv", out, out, 3, 1, 1)
            idx += 1
    wres("encoder.mid_block.resnets.0", ch, ch)
    wattn("encoder.mid_block.attentions.0", ch)
    wres("encoder.mid_block.resnets.1", ch, ch)
    st["encoder.norm_out.gamma"] = np.ones((ch, 1, 1), np.float32)
    wconv3("encoder.conv_out", ch, 2 * z)
    wconv3("quant_conv", 2 * z, 2 * z, 1, 1, 1)
    wconv3("post_quant_conv", z, z, 1, 1, 1)
    rdims = list(reversed(dims))
    wconv3("decoder.conv_in", z, rdims[0])
    wres("decoder.mid_block.resnets.0", rdims[0], rdims[0])
    wattn("decoder.mid_block.attentions.0", rdims[0])
    wres("decoder.mid_block.resnets.1", rdims[0], rdims[0])
    idx = 0
    ch = rdims[0]
    for i, out in enumerate(rdims):
        for j in range(vcfg["num_res_blocks"] + 1):
            wres(f"decoder.up_blocks.{idx}", ch if j == 0 else out, out)
            ch = out
            idx += 1
        if i < len(rdims) - 1:
            half = out // 2
            st[f"decoder.up_blocks.{idx}.resample.1.weight"] = _w(rng, half, out, 3, 3)
            st[f"decoder.up_blocks.{idx}.resample.1.bias"] = _w(rng, half)
            if list(reversed(vcfg["temperal_downsample"]))[i]:
                wconv3(f"decoder.up_blocks.{idx}.time_conv", out, out * 2, 3, 1, 1)
            ch = half
            idx += 1
    st["decoder.norm_out.gamma"] = np.ones((ch, 1, 1), np.float32)
    wconv3("decoder.conv_out", ch, 3)
    os.makedirs(os.path.join(root, "vae"), exist_ok=True)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump(vcfg, f)
    _save(os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"), st)

    # UMT5 text encoder (per-layer relative bias)
    tecfg = {
        "vocab_size": 64,
        "d_model": 16,
        "d_kv": 4,
        "d_ff": 32,
        "num_layers": 2,
        "num_heads": 4,
        "relative_attention_num_buckets": 8,
        "relative_attention_max_distance": 16,
    }
    st = {"shared.weight": _w(rng, 64, 16, scale=1.0)}
    for i in range(2):
        b = f"encoder.block.{i}"
        for nm in ("q", "k", "v", "o"):
            st[f"{b}.layer.0.SelfAttention.{nm}.weight"] = _w(rng, 16, 16)
        st[f"{b}.layer.0.SelfAttention.relative_attention_bias.weight"] = _w(rng, 8, 4)
        st[f"{b}.layer.0.layer_norm.weight"] = np.ones(16, np.float32)
        st[f"{b}.layer.1.DenseReluDense.wi_0.weight"] = _w(rng, 32, 16)
        st[f"{b}.layer.1.DenseReluDense.wi_1.weight"] = _w(rng, 32, 16)
        st[f"{b}.layer.1.DenseReluDense.wo.weight"] = _w(rng, 16, 32)
        st[f"{b}.layer.1.layer_norm.weight"] = np.ones(16, np.float32)
    st["encoder.final_layer_norm.weight"] = np.ones(16, np.float32)
    os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(tecfg, f)
    _save(os.path.join(root, "text_encoder", "model.safetensors"), st)

    # CLIP vision image encoder
    iccfg = {
        "hidden_size": 16,
        "intermediate_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "image_size": 28,
        "patch_size": 14,
        "hidden_act": "gelu",
    }
    p = "vision_model"
    st = {
        f"{p}.embeddings.class_embedding": _w(rng, 16),
        f"{p}.embeddings.patch_embedding.weight": _w(rng, 16, 3, 14, 14),
        f"{p}.embeddings.position_embedding.weight": _w(rng, 5, 16),
        f"{p}.pre_layrnorm.weight": np.ones(16, np.float32),
        f"{p}.pre_layrnorm.bias": np.zeros(16, np.float32),
        f"{p}.post_layernorm.weight": np.ones(16, np.float32),
        f"{p}.post_layernorm.bias": np.zeros(16, np.float32),
    }
    for i in range(2):
        b = f"{p}.encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            st[f"{b}.self_attn.{nm}.weight"] = _w(rng, 16, 16)
            st[f"{b}.self_attn.{nm}.bias"] = _w(rng, 16)
        for nm in ("layer_norm1", "layer_norm2"):
            st[f"{b}.{nm}.weight"] = np.ones(16, np.float32)
            st[f"{b}.{nm}.bias"] = np.zeros(16, np.float32)
        st[f"{b}.mlp.fc1.weight"] = _w(rng, 32, 16)
        st[f"{b}.mlp.fc1.bias"] = _w(rng, 32)
        st[f"{b}.mlp.fc2.weight"] = _w(rng, 16, 32)
        st[f"{b}.mlp.fc2.bias"] = _w(rng, 16)
    os.makedirs(os.path.join(root, "image_encoder"), exist_ok=True)
    with open(os.path.join(root, "image_encoder", "config.json"), "w") as f:
        json.dump(iccfg, f)
    _save(os.path.join(root, "image_encoder", "model.safetensors"), st)

    make_tokenizer(root)


# ---------------------------------------------------------------------------
# HunyuanVideo
# ---------------------------------------------------------------------------


def build_hunyuan(root: str, seed: int = 0) -> None:
    """Tiny HunyuanVideo-I2V checkpoint matching alg_tpu's converters."""
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    tcfg = {
        "in_channels": 4,
        "out_channels": 4,
        "num_attention_heads": 2,
        "attention_head_dim": 8,
        "num_layers": 1,
        "num_single_layers": 2,
        "num_refiner_layers": 1,
        "mlp_ratio": 2.0,
        "patch_size": 2,
        "patch_size_t": 1,
        "text_embed_dim": 16,
        "pooled_projection_dim": 8,
        "guidance_embeds": True,
        "rope_theta": 256.0,
        "rope_axes_dim": [2, 4, 2],
        "image_condition_type": "token_replace",
    }
    dim = tcfg["num_attention_heads"] * tcfg["attention_head_dim"]
    mlp = int(dim * tcfg["mlp_ratio"])
    st = {
        "x_embedder.proj.weight": _w(rng, dim, tcfg["in_channels"], 1, 2, 2),
        "x_embedder.proj.bias": _w(rng, dim),
        "context_embedder.proj_in.weight": _w(rng, dim, 16),
        "context_embedder.proj_in.bias": _w(rng, dim),
        "norm_out.linear.weight": _w(rng, 2 * dim, dim),
        "norm_out.linear.bias": _w(rng, 2 * dim),
        "proj_out.weight": _w(rng, 1 * 2 * 2 * tcfg["out_channels"], dim),
        "proj_out.bias": _w(rng, 1 * 2 * 2 * tcfg["out_channels"]),
    }
    for base in (
        "context_embedder.time_text_embed.timestep_embedder",
        "context_embedder.time_text_embed.text_embedder",
        "time_text_embed.timestep_embedder",
        "time_text_embed.guidance_embedder",
    ):
        d_in = 256 if "timestep" in base or "guidance" in base else 16
        if base == "context_embedder.time_text_embed.text_embedder":
            d_in = 16
        st[f"{base}.linear_1.weight"] = _w(rng, dim, d_in)
        st[f"{base}.linear_1.bias"] = _w(rng, dim)
        st[f"{base}.linear_2.weight"] = _w(rng, dim, dim)
        st[f"{base}.linear_2.bias"] = _w(rng, dim)
    st["time_text_embed.text_embedder.linear_1.weight"] = _w(rng, dim, tcfg["pooled_projection_dim"])
    st["time_text_embed.text_embedder.linear_1.bias"] = _w(rng, dim)
    st["time_text_embed.text_embedder.linear_2.weight"] = _w(rng, dim, dim)
    st["time_text_embed.text_embedder.linear_2.bias"] = _w(rng, dim)
    for i in range(tcfg["num_refiner_layers"]):
        b = f"context_embedder.token_refiner.refiner_blocks.{i}"
        for nm in ("norm1", "norm2"):
            st[f"{b}.{nm}.weight"] = np.ones(dim, np.float32)
            st[f"{b}.{nm}.bias"] = np.zeros(dim, np.float32)
        for nm in ("to_q", "to_k", "to_v"):
            st[f"{b}.attn.{nm}.weight"] = _w(rng, dim, dim)
            st[f"{b}.attn.{nm}.bias"] = _w(rng, dim)
        st[f"{b}.attn.to_out.0.weight"] = _w(rng, dim, dim)
        st[f"{b}.attn.to_out.0.bias"] = _w(rng, dim)
        st[f"{b}.ff.net.0.proj.weight"] = _w(rng, mlp, dim)
        st[f"{b}.ff.net.0.proj.bias"] = _w(rng, mlp)
        st[f"{b}.ff.net.2.weight"] = _w(rng, dim, mlp)
        st[f"{b}.ff.net.2.bias"] = _w(rng, dim)
        st[f"{b}.norm_out.linear.weight"] = _w(rng, 2 * dim, dim)
        st[f"{b}.norm_out.linear.bias"] = _w(rng, 2 * dim)
    hd = tcfg["attention_head_dim"]
    for i in range(tcfg["num_layers"]):
        b = f"transformer_blocks.{i}"
        st[f"{b}.norm1.linear.weight"] = _w(rng, 6 * dim, dim)
        st[f"{b}.norm1.linear.bias"] = _w(rng, 6 * dim)
        st[f"{b}.norm1_context.linear.weight"] = _w(rng, 6 * dim, dim)
        st[f"{b}.norm1_context.linear.bias"] = _w(rng, 6 * dim)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            st[f"{b}.attn.{nm}.weight"] = _w(rng, dim, dim)
            st[f"{b}.attn.{nm}.bias"] = _w(rng, dim)
        st[f"{b}.attn.to_out.0.weight"] = _w(rng, dim, dim)
        st[f"{b}.attn.to_out.0.bias"] = _w(rng, dim)
        st[f"{b}.attn.to_add_out.weight"] = _w(rng, dim, dim)
        st[f"{b}.attn.to_add_out.bias"] = _w(rng, dim)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            st[f"{b}.attn.{nm}.weight"] = np.ones(hd, np.float32)
        for ff in ("ff", "ff_context"):
            st[f"{b}.{ff}.net.0.proj.weight"] = _w(rng, mlp, dim)
            st[f"{b}.{ff}.net.0.proj.bias"] = _w(rng, mlp)
            st[f"{b}.{ff}.net.2.weight"] = _w(rng, dim, mlp)
            st[f"{b}.{ff}.net.2.bias"] = _w(rng, dim)
    for i in range(tcfg["num_single_layers"]):
        b = f"single_transformer_blocks.{i}"
        st[f"{b}.norm.linear.weight"] = _w(rng, 3 * dim, dim)
        st[f"{b}.norm.linear.bias"] = _w(rng, 3 * dim)
        for nm in ("to_q", "to_k", "to_v"):
            st[f"{b}.attn.{nm}.weight"] = _w(rng, dim, dim)
            st[f"{b}.attn.{nm}.bias"] = _w(rng, dim)
        for nm in ("norm_q", "norm_k"):
            st[f"{b}.attn.{nm}.weight"] = np.ones(hd, np.float32)
        st[f"{b}.proj_mlp.weight"] = _w(rng, mlp, dim)
        st[f"{b}.proj_mlp.bias"] = _w(rng, mlp)
        st[f"{b}.proj_out.weight"] = _w(rng, dim, dim + mlp)
        st[f"{b}.proj_out.bias"] = _w(rng, dim)
    os.makedirs(os.path.join(root, "transformer"), exist_ok=True)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        json.dump(tcfg, f)
    _save(os.path.join(root, "transformer", "diffusion_pytorch_model.safetensors"), st)

    # vae
    vcfg = {
        "latent_channels": 4,
        "block_out_channels": [8, 16, 16, 16],
        "layers_per_block": 1,
        "norm_num_groups": 4,
        "scaling_factor": 0.476986,
        "temporal_compression_ratio": 4,
    }
    boc = vcfg["block_out_channels"]
    z = vcfg["latent_channels"]
    st = {}

    def hconv3(name, cin, cout, k=3):
        st[f"{name}.weight"] = _w(rng, cout, cin, k, k, k)
        st[f"{name}.bias"] = _w(rng, cout)

    def hgn(name, ch):
        st[f"{name}.weight"] = np.ones(ch, np.float32)
        st[f"{name}.bias"] = np.zeros(ch, np.float32)

    def hres(name, cin, cout):
        hgn(f"{name}.norm1", cin)
        hconv3(f"{name}.conv1", cin, cout)
        hgn(f"{name}.norm2", cout)
        hconv3(f"{name}.conv2", cout, cout)
        if cin != cout:
            hconv3(f"{name}.conv_shortcut", cin, cout, k=1)

    def hattn(name, ch):
        hgn(f"{name}.group_norm", ch)
        for nm in ("to_q", "to_k", "to_v"):
            st[f"{name}.{nm}.weight"] = _w(rng, ch, ch)
            st[f"{name}.{nm}.bias"] = _w(rng, ch)
        st[f"{name}.to_out.0.weight"] = _w(rng, ch, ch)
        st[f"{name}.to_out.0.bias"] = _w(rng, ch)

    hconv3("encoder.conv_in", 3, boc[0])
    ch = boc[0]
    for i, out in enumerate(boc):
        hres(f"encoder.down_blocks.{i}.resnets.0", ch, out)
        ch = out
        if i < len(boc) - 1:
            hconv3(f"encoder.down_blocks.{i}.downsamplers.0.conv", out, out)
    hres("encoder.mid_block.resnets.0", ch, ch)
    hattn("encoder.mid_block.attentions.0", ch)
    hres("encoder.mid_block.resnets.1", ch, ch)
    hgn("encoder.conv_norm_out", ch)
    hconv3("encoder.conv_out", ch, 2 * z)
    hconv3("quant_conv", 2 * z, 2 * z, k=1)
    hconv3("post_quant_conv", z, z, k=1)
    rev = list(reversed(boc))
    hconv3("decoder.conv_in", z, rev[0])
    hres("decoder.mid_block.resnets.0", rev[0], rev[0])
    hattn("decoder.mid_block.attentions.0", rev[0])
    hres("decoder.mid_block.resnets.1", rev[0], rev[0])
    ch = rev[0]
    for i, out in enumerate(rev):
        for j in range(vcfg["layers_per_block"] + 1):
            hres(f"decoder.up_blocks.{i}.resnets.{j}", ch if j == 0 else out, out)
            ch = out
        if i < len(rev) - 1:
            hconv3(f"decoder.up_blocks.{i}.upsamplers.0.conv", out, out)
    hgn("decoder.conv_norm_out", ch)
    hconv3("decoder.conv_out", ch, 3)
    os.makedirs(os.path.join(root, "vae"), exist_ok=True)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump(vcfg, f)
    _save(os.path.join(root, "vae", "diffusion_pytorch_model.safetensors"), st)

    # llava text encoder (legacy layout: language_model.model.*)
    lcfg = {
        "image_token_index": 60,
        "pad_token_id": 0,
        "text_config": {
            "vocab_size": 64,
            "hidden_size": 16,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "num_key_value_heads": 2,
            "rope_theta": 10000.0,
        },
        "vision_config": {
            "hidden_size": 12,
            "intermediate_size": 24,
            "num_hidden_layers": 2,
            "num_attention_heads": 4,
            "image_size": 28,
            "patch_size": 14,
            "hidden_act": "quick_gelu",
        },
    }
    st = {"language_model.model.embed_tokens.weight": _w(rng, 64, 16, scale=1.0)}
    for i in range(2):
        b = f"language_model.model.layers.{i}"
        st[f"{b}.input_layernorm.weight"] = np.ones(16, np.float32)
        st[f"{b}.post_attention_layernorm.weight"] = np.ones(16, np.float32)
        st[f"{b}.self_attn.q_proj.weight"] = _w(rng, 16, 16)
        st[f"{b}.self_attn.k_proj.weight"] = _w(rng, 8, 16)
        st[f"{b}.self_attn.v_proj.weight"] = _w(rng, 8, 16)
        st[f"{b}.self_attn.o_proj.weight"] = _w(rng, 16, 16)
        st[f"{b}.mlp.gate_proj.weight"] = _w(rng, 32, 16)
        st[f"{b}.mlp.up_proj.weight"] = _w(rng, 32, 16)
        st[f"{b}.mlp.down_proj.weight"] = _w(rng, 16, 32)
    st["language_model.model.norm.weight"] = np.ones(16, np.float32)
    vp = "vision_tower.vision_model"
    st[f"{vp}.embeddings.class_embedding"] = _w(rng, 12)
    st[f"{vp}.embeddings.patch_embedding.weight"] = _w(rng, 12, 3, 14, 14)
    st[f"{vp}.embeddings.position_embedding.weight"] = _w(rng, 5, 12)
    st[f"{vp}.pre_layrnorm.weight"] = np.ones(12, np.float32)
    st[f"{vp}.pre_layrnorm.bias"] = np.zeros(12, np.float32)
    st[f"{vp}.post_layernorm.weight"] = np.ones(12, np.float32)
    st[f"{vp}.post_layernorm.bias"] = np.zeros(12, np.float32)
    for i in range(2):
        b = f"{vp}.encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            st[f"{b}.self_attn.{nm}.weight"] = _w(rng, 12, 12)
            st[f"{b}.self_attn.{nm}.bias"] = _w(rng, 12)
        for nm in ("layer_norm1", "layer_norm2"):
            st[f"{b}.{nm}.weight"] = np.ones(12, np.float32)
            st[f"{b}.{nm}.bias"] = np.zeros(12, np.float32)
        st[f"{b}.mlp.fc1.weight"] = _w(rng, 24, 12)
        st[f"{b}.mlp.fc1.bias"] = _w(rng, 24)
        st[f"{b}.mlp.fc2.weight"] = _w(rng, 12, 24)
        st[f"{b}.mlp.fc2.bias"] = _w(rng, 12)
    st["multi_modal_projector.linear_1.weight"] = _w(rng, 16, 12)
    st["multi_modal_projector.linear_1.bias"] = _w(rng, 16)
    st["multi_modal_projector.linear_2.weight"] = _w(rng, 16, 16)
    st["multi_modal_projector.linear_2.bias"] = _w(rng, 16)
    os.makedirs(os.path.join(root, "text_encoder"), exist_ok=True)
    with open(os.path.join(root, "text_encoder", "config.json"), "w") as f:
        json.dump(lcfg, f)
    _save(os.path.join(root, "text_encoder", "model.safetensors"), st)

    # CLIP text encoder #2 — hidden_size must equal the transformer's
    # pooled_projection_dim (8): encode_prompt feeds the pooled output
    # straight into the DiT's text_embedder (real scale: 768 == 768)
    c2 = {
        "vocab_size": 64,
        "hidden_size": 8,
        "intermediate_size": 16,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "max_position_embeddings": 16,
        "hidden_act": "quick_gelu",
        "eos_token_id": 1,
    }
    tp = "text_model"
    st = {
        f"{tp}.embeddings.token_embedding.weight": _w(rng, 64, 8, scale=1.0),
        f"{tp}.embeddings.position_embedding.weight": _w(rng, 16, 8),
        f"{tp}.final_layer_norm.weight": np.ones(8, np.float32),
        f"{tp}.final_layer_norm.bias": np.zeros(8, np.float32),
    }
    for i in range(2):
        b = f"{tp}.encoder.layers.{i}"
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            st[f"{b}.self_attn.{nm}.weight"] = _w(rng, 8, 8)
            st[f"{b}.self_attn.{nm}.bias"] = _w(rng, 8)
        for nm in ("layer_norm1", "layer_norm2"):
            st[f"{b}.{nm}.weight"] = np.ones(8, np.float32)
            st[f"{b}.{nm}.bias"] = np.zeros(8, np.float32)
        st[f"{b}.mlp.fc1.weight"] = _w(rng, 16, 8)
        st[f"{b}.mlp.fc1.bias"] = _w(rng, 16)
        st[f"{b}.mlp.fc2.weight"] = _w(rng, 8, 16)
        st[f"{b}.mlp.fc2.bias"] = _w(rng, 8)
    os.makedirs(os.path.join(root, "text_encoder_2"), exist_ok=True)
    with open(os.path.join(root, "text_encoder_2", "config.json"), "w") as f:
        json.dump(c2, f)
    _save(os.path.join(root, "text_encoder_2", "model.safetensors"), st)

    make_tokenizer(root)
    # second tokenizer dir for CLIP
    import shutil

    if not os.path.isdir(os.path.join(root, "tokenizer_2")):
        shutil.copytree(os.path.join(root, "tokenizer"), os.path.join(root, "tokenizer_2"))
