"""End-to-end CLI test: fake HF checkpoint → run.py → video file.

Exercises the entire real loading path (configs → safetensors → converters →
tokenizer → pipeline → encode) with the reference CLI surface."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt") / "TinyCogVideoX"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    make_tiny_checkpoint.build(str(root))
    return str(root)


def test_load_pipeline_from_checkpoint(tiny_ckpt):
    import jax.numpy as jnp

    from alg_tpu.io.model_zoo import load_cogvideox_pipeline

    pipe = load_cogvideox_pipeline(tiny_ckpt, dtype=jnp.float32)
    assert pipe.scheduler == "ddim"
    assert pipe.tokenize is not None
    video = pipe(
        image=np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt="a red bus",
        negative_prompt="",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=6.0,
        max_sequence_length=16,
        seed=42,
        output_type="np",
    )
    assert video.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(video).all()


def test_load_cogvideox_1_5_pipeline_from_checkpoint(tmp_path_factory):
    """CogVideoX-1.5 layout: patch_size_t=2 (temporal patching, linear patch
    embed, slice-mode rope). Exercises the latent-frame front-padding path
    (9 frames -> 3 latent frames -> padded to 4)."""
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    from alg_tpu.io.model_zoo import load_cogvideox_pipeline

    root = str(tmp_path_factory.mktemp("ckpt") / "TinyCogVideoX1.5")
    make_tiny_checkpoint.build(root, patch_size_t=2)
    pipe = load_cogvideox_pipeline(root, dtype=jnp.float32)
    video = pipe(
        image=np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt="a red bus",
        negative_prompt="",
        height=32,
        width=32,
        num_frames=9,
        num_inference_steps=2,
        guidance_scale=6.0,
        max_sequence_length=16,
        seed=42,
        output_type="np",
    )
    assert video.shape == (1, 9, 32, 32, 3)
    assert np.isfinite(video).all()


def test_load_wan_pipeline_from_checkpoint(tmp_path_factory):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    from alg_tpu.io.model_zoo import load_wan_pipeline

    root = str(tmp_path_factory.mktemp("ckpt") / "TinyWan")
    make_tiny_checkpoint.build_wan(root)
    pipe = load_wan_pipeline(root, dtype=jnp.float32, flow_shift=5.0)
    video = pipe(
        image=np.random.RandomState(0).rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt="a red bus driving",
        negative_prompt="",
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=5.0,
        max_sequence_length=16,
        seed=42,
        output_type="np",
    )
    assert video.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(video).all()


def test_load_hunyuan_pipeline_from_checkpoint(tmp_path_factory):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    from alg_tpu.io.model_zoo import load_hunyuan_pipeline

    root = str(tmp_path_factory.mktemp("ckpt") / "TinyHunyuanVideo")
    make_tiny_checkpoint.build_hunyuan(root)
    pipe = load_hunyuan_pipeline(root, dtype=jnp.float32, flow_shift=7.0)
    rng = np.random.RandomState(0)
    video = pipe(
        image=rng.rand(1, 3, 32, 32).astype(np.float32) * 2 - 1,
        prompt_embeds=np.asarray(rng.randn(1, 7, 16), np.float32),
        pooled_prompt_embeds=np.asarray(rng.randn(1, 8), np.float32),
        prompt_attention_mask=np.ones((1, 7), np.int32),
        height=32,
        width=32,
        num_frames=5,
        num_inference_steps=2,
        guidance_scale=6.0,
        true_cfg_scale=1.0,
        i2v_stable=True,
        seed=42,
        output_type="np",
        use_low_pass_guidance=True,
        lp_filter_type="down_up",
        lp_filter_in_latent=True,
        lp_resize_factor=0.625,
        lp_strength_schedule_type="interval",
        schedule_interval_start_time=0.0,
        schedule_interval_end_time=0.5,
    )
    assert video.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(video).all()


def test_cli_end_to_end(tiny_ckpt, tmp_path):
    """Full `run.py` invocation with the reference flag surface."""
    from PIL import Image

    img_path = tmp_path / "input.png"
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)).save(img_path)

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        f"""
model:
  path: "{tiny_ckpt}"
  dtype: "float32"

generation:
  height: 32
  width: 32
  num_frames: 5
  num_inference_steps: 2
  guidance_scale: 6.0
  max_sequence_length: 16

alg:
  use_low_pass_guidance: True
  lp_filter_type: "down_up"
  lp_filter_in_latent: True
  lp_resize_factor: 0.25
  lp_strength_schedule_type: "interval"
  schedule_interval_start_time: 0.0
  schedule_interval_end_time: 0.5

video:
  fps: 8
"""
    )
    out_path = tmp_path / "out.mp4"
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    proc = subprocess.run(
        [
            sys.executable,
            "run.py",
            "--config",
            str(cfg_path),
            "--image_path",
            str(img_path),
            "--prompt",
            "a red double decker bus driving down the street",
            "--output_path",
            str(out_path),
        ],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # no ffmpeg in this environment → true-color MJPEG-AVI fallback
    written = out_path if out_path.exists() else tmp_path / "out.avi"
    assert written.exists() and written.stat().st_size > 0
    assert "Run complete" in proc.stdout

    # CLI quirk parity: the reference dispatches on path substring — a path
    # without a known family must fail clearly
    bad_cfg = tmp_path / "bad.yaml"
    bad_cfg.write_text('model:\n  path: "nonexistent/Model"\n  dtype: "float32"\nvideo:\n  fps: 8\n')
    proc2 = subprocess.run(
        [sys.executable, "run.py", "--config", str(bad_cfg), "--image_path", str(img_path),
         "--prompt", "x", "--output_path", str(tmp_path / "x.mp4")],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc2.returncode != 0


def test_cli_lora_flag_merges_trained_adapters(tiny_ckpt, tmp_path):
    """alg-tpu-train → run.py --lora: the trained adapters merge at load and
    the generation completes (the reference's LoRA-loader-mixin surface)."""
    from PIL import Image

    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    cwd = os.path.join(os.path.dirname(__file__), "..")
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        f"""
model:
  path: "{tiny_ckpt}"
  dtype: "float32"
generation:
  height: 32
  width: 32
  num_frames: 5
  num_inference_steps: 2
  guidance_scale: 6.0
  max_sequence_length: 16
video:
  fps: 8
"""
    )
    adapters = tmp_path / "adapters.npz"
    proc = subprocess.run(
        [sys.executable, "-m", "alg_tpu.train_cli", "--config", str(cfg_path),
         "--synthetic", "2", "--steps", "2", "--batch_size", "1", "--rank", "2",
         "--lr", "1e-2", "--log_every", "1", "--output", str(adapters)],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    img_path = tmp_path / "input.png"
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)).save(img_path)
    proc = subprocess.run(
        [sys.executable, "run.py", "--config", str(cfg_path), "--image_path", str(img_path),
         "--prompt", "a red bus", "--output_path", str(tmp_path / "out.mp4"),
         "--lora", str(adapters), "--lora_scale", "1.0"],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "Merged 24 LoRA tensors" in proc.stdout
    assert "Run complete" in proc.stdout

    # guard: --lora with --quantize must fail with the offline-merge hint
    proc = subprocess.run(
        [sys.executable, "run.py", "--config", str(cfg_path), "--image_path", str(img_path),
         "--prompt", "x", "--output_path", str(tmp_path / "y.mp4"),
         "--lora", str(adapters), "--quantize", "w8"],
        cwd=cwd, capture_output=True, text=True, env=env, timeout=300,
    )
    assert proc.returncode != 0 and "unsupported" in proc.stderr


def test_load_pipeline_safetensors_lora(tiny_ckpt, tmp_path):
    """--lora accepts diffusers-published .safetensors adapters (same peft
    naming as the npz path) and actually moves the kernels."""
    import jax

    from alg_tpu.cli import load_pipeline
    from alg_tpu.core.config import load_run_config
    from alg_tpu.training import FAMILY_PEFT, init_lora_params, to_peft_state

    cfg_p = tmp_path / "c.yaml"
    cfg_p.write_text(f'model:\n  path: "{tiny_ckpt}"\n  dtype: "float32"\ngeneration: {{}}\nvideo:\n  fps: 8\n')
    cfg = load_run_config(str(cfg_p))
    pipe0 = load_pipeline(cfg)
    loras = init_lora_params(jax.random.PRNGKey(0), pipe0.transformer_params, rank=2, prefixes=("blocks",))
    # B inits to zero (standard) — perturb so the merge moves the kernels
    loras = {k: {"A": v["A"], "B": v["B"] + 0.1} for k, v in loras.items()}
    state = to_peft_state(loras, FAMILY_PEFT["cogvideox"][1])

    from safetensors.numpy import save_file

    st = tmp_path / "adapters.safetensors"
    save_file({k: np.asarray(v) for k, v in state.items()}, str(st))
    pipe1 = load_pipeline(cfg, lora=str(st), lora_scale=1.0)
    assert jax.tree.structure(pipe1.transformer_params) == jax.tree.structure(pipe0.transformer_params)
    delta = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(pipe1.transformer_params), jax.tree.leaves(pipe0.transformer_params))
    )
    assert delta > 0.0


def test_load_pipeline_quantize_at_load(tiny_ckpt):
    """--quantize wiring: host-side conversion + quantize-before-streaming
    (io/model_zoo._convert_transformer). At tiny dims no linear crosses the
    128-wide quantization threshold, so the loaded tree must be bitwise equal
    to the normal load — which pins exactly the property that matters: the
    host_tree/stream_tree route changes WHERE conversion happens, never the
    values. (Actual int8 code parity: test_quant.test_host_quantize_matches_
    device_quantize.)"""
    import jax
    import jax.numpy as jnp

    from alg_tpu.io.model_zoo import load_cogvideox_pipeline

    plain = load_cogvideox_pipeline(tiny_ckpt, dtype=jnp.float32)
    quant = load_cogvideox_pipeline(tiny_ckpt, dtype=jnp.float32, quantize="w8")
    lp = jax.tree_util.tree_leaves(plain.transformer_params)
    lq = jax.tree_util.tree_leaves(quant.transformer_params)
    assert len(lp) == len(lq)
    for a, b in zip(lp, lq):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
