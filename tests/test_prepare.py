"""`alg-tpu-prepare` latent precompute: full fine-tuning loop e2e.

prepare (clips+prompts → latent npz) → alg-tpu-train --data → peft merge,
all through subprocesses on tiny checkpoints — the workflow a user runs.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

_CWD = os.path.join(os.path.dirname(__file__), "..")
_ENV = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")


def _write_cfg(tmp_path, root, extra=""):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        f"""
model:
  path: "{root}"
  dtype: "float32"
generation:
  height: 32
  width: 32
  num_frames: 5
  guidance_scale: 6.0
  max_sequence_length: 8
{extra}video:
  fps: 8
"""
    )
    return p


def _clips(tmp_path, n=2, frames=5):
    """One frames-dir clip + one .npy clip; returns manifest path."""
    from PIL import Image

    rng = np.random.RandomState(0)
    items = []
    d = tmp_path / "clip0"
    d.mkdir()
    for f in range(frames):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(d / f"f{f:03d}.png")
    items.append({"video": str(d), "prompt": "a cat"})
    if n > 1:
        npy = tmp_path / "clip1.npy"
        np.save(npy, rng.randint(0, 255, (frames + 2, 32, 32, 3), np.uint8))  # truncates to 4k+1
        items.append({"video": str(npy), "prompt": "a dog"})
    man = tmp_path / "manifest.jsonl"
    man.write_text("".join(json.dumps(it) + "\n" for it in items[:n]))
    return man


def _prepare(cfg_path, man, out_dir):
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.prepare_cli", "--config", str(cfg_path),
         "--manifest", str(man), "--output_dir", str(out_dir)],
        cwd=_CWD, capture_output=True, text=True, env=_ENV, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    return proc.stdout


def test_prepare_then_train_cogvideox(tmp_path):
    import make_tiny_checkpoint

    root = tmp_path / "CogVideoX-tiny"
    make_tiny_checkpoint.build(str(root))
    cfg_path = _write_cfg(tmp_path, root)
    man = _clips(tmp_path, n=2)
    out_dir = tmp_path / "latents"
    _prepare(cfg_path, man, out_dir)

    files = sorted(os.listdir(out_dir))
    assert files == ["example_00000.npz", "example_00001.npz"]
    with np.load(out_dir / files[0]) as z:
        assert sorted(z.files) == ["encoder_hidden_states", "image_latents", "latents"]
        # 5 frames → 2 latent frames; 32×32 → 4×4; latent channels 4 (tiny vae)
        assert z["latents"].shape == z["image_latents"].shape
        assert z["latents"].shape[0] == 2 and z["latents"].shape[-2:] == (4, 4)
        assert z["encoder_hidden_states"].shape[0] == 8
        # first-frame conditioning: only latent frame 0 non-zero
        assert np.abs(z["image_latents"][1:]).max() == 0.0
        assert np.abs(z["image_latents"][0]).max() > 0.0
    with np.load(out_dir / files[1]) as z:
        assert z["latents"].shape[0] == 2  # 7 frames truncated to 5 → 2 latent

    # full loop: train on the prepared latents, merge the adapters
    out = tmp_path / "adapters.npz"
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.train_cli", "--config", str(cfg_path),
         "--data", str(out_dir), "--steps", "3", "--batch_size", "2", "--rank", "2",
         "--lr", "1e-3", "--log_every", "1", "--output", str(out)],
        cwd=_CWD, capture_output=True, text=True, env=_ENV, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "Training complete." in proc.stdout

    from alg_tpu.io.lora import merge_lora_cogvideox
    from alg_tpu.io.model_zoo import load_cogvideox_pipeline

    pipe = load_cogvideox_pipeline(str(root), dtype=jnp.float32)
    merged = merge_lora_cogvideox(pipe.transformer_params, dict(np.load(out)), scale=1.0)
    assert len(list(merged)) == len(list(pipe.transformer_params))


def test_prepare_wan_keys_and_shapes(tmp_path):
    import make_tiny_checkpoint

    root = tmp_path / "Wan-tiny"
    make_tiny_checkpoint.build_wan(str(root))
    cfg_path = _write_cfg(tmp_path, root)
    man = _clips(tmp_path, n=1, frames=9)
    out_dir = tmp_path / "latents"
    _prepare(cfg_path, man, out_dir)

    with np.load(out_dir / "example_00000.npz") as z:
        keys = sorted(z.files)
        assert keys == [
            "condition", "encoder_hidden_states", "encoder_hidden_states_image", "latents",
        ]
        z_ch = z["latents"].shape[0]
        # condition = 4 mask channels + condition latents
        assert z["condition"].shape[0] == z_ch + 4
        assert z["condition"].shape[1:] == z["latents"].shape[1:]
        assert z["latents"].shape[1] == 3  # 9 frames → 3 latent
        # mask block: frame 0 conditioned (ones), rest zero
        mask = z["condition"][:4]
        assert mask[:, 0].min() == 1.0 and np.abs(mask[:, 1:]).max() == 0.0


def test_prepare_wan_flf2v(tmp_path):
    """--flf2v conditions on first AND last frame (mask marks both ends)."""
    import make_tiny_checkpoint

    root = tmp_path / "Wan-tiny"
    make_tiny_checkpoint.build_wan(str(root))
    cfg_path = _write_cfg(tmp_path, root)
    man = _clips(tmp_path, n=1, frames=9)
    out_dir = tmp_path / "latents"
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.prepare_cli", "--config", str(cfg_path),
         "--manifest", str(man), "--output_dir", str(out_dir), "--flf2v"],
        cwd=_CWD, capture_output=True, text=True, env=_ENV, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    with np.load(out_dir / "example_00000.npz") as z:
        mask = z["condition"][:4]
        # first pixel frame repeated ×4 → all t-channels of latent frame 0
        assert mask[:, 0].min() == 1.0
        # last pixel frame lands in the final t-channel of the last latent
        # frame after the [F+3] → [F_lat, t] reshape (reference :436-447)
        assert mask[3, -1].min() == 1.0 and np.abs(mask[:3, -1]).max() == 0.0
        assert np.abs(mask[:, 1:-1]).max() == 0.0
        # the last condition-latent frame is non-zero (last frame encoded)
        assert np.abs(z["condition"][4:, -1]).max() > 0.0


def test_prepare_hunyuan_keys_and_shapes(tmp_path):
    import make_tiny_checkpoint

    root = tmp_path / "HunyuanVideo-tiny"
    make_tiny_checkpoint.build_hunyuan(str(root))
    cfg_path = _write_cfg(tmp_path, root)
    man = _clips(tmp_path, n=1, frames=5)
    out_dir = tmp_path / "latents"
    _prepare(cfg_path, man, out_dir)

    with np.load(out_dir / "example_00000.npz") as z:
        assert sorted(z.files) == [
            "encoder_attention_mask", "encoder_hidden_states", "image_latents",
            "latents", "pooled_projections",
        ]
        assert z["latents"].shape[1] == 2 and z["image_latents"].shape[1] == 1
        assert z["latents"].shape[0] == z["image_latents"].shape[0]
        assert z["encoder_hidden_states"].shape[0] == z["encoder_attention_mask"].shape[0]
        assert z["pooled_projections"].ndim == 1
