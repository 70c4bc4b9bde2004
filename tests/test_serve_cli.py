"""Batch-serving CLI (`alg-tpu-serve` / alg_tpu.serve_cli): JSONL requests →
one batched pipeline invocation → per-request video files.

Beyond-parity surface (the reference CLI is single-prompt, ``run.py:137-144``);
the underlying serve_batch/shard_pipeline exactness is covered by
``test_sharding.py`` — this test pins the CLI wiring: request parsing,
config-kwargs merge, per-request seeds/names, and the mesh flags."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("serve")
    ckpt = root / "TinyCogVideoX"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    make_tiny_checkpoint.build(str(ckpt))

    img = root / "input.png"
    Image.fromarray((np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)).save(img)

    cfg = root / "tiny.yaml"
    cfg.write_text(
        f"""
model:
  path: "{ckpt}"
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

    reqs = root / "requests.jsonl"
    reqs.write_text(
        "\n".join(
            [
                json.dumps({"prompt": "a red bus", "image_path": str(img), "seed": 42, "output": "bus.mp4"}),
                json.dumps({"prompt": "a blue tram", "image_path": str(img), "seed": 7}),
            ]
        )
    )
    return root, cfg, reqs


def _run(cfg, reqs, out_dir, extra=()):
    env = dict(
        os.environ,
        JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache",
    )
    return subprocess.run(
        [sys.executable, "-m", "alg_tpu.serve_cli", "--config", str(cfg),
         "--requests", str(reqs), "--output_dir", str(out_dir), *extra],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
    )


def test_serve_cli_end_to_end(setup, tmp_path):
    root, cfg, reqs = setup
    proc = _run(cfg, reqs, tmp_path / "out")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # request-specified name + default indexed name (AVI fallback: no ffmpeg)
    for name in ("bus", "001"):
        written = [p for p in (tmp_path / "out").iterdir() if p.stem == name]
        assert written and written[0].stat().st_size > 0, name
    assert "Batch complete: 2 videos" in proc.stdout


def test_serve_cli_rejects_indivisible_dp(setup, tmp_path):
    root, cfg, reqs = setup
    proc = _run(cfg, reqs, tmp_path / "out2", extra=("--dp", "3"))
    assert proc.returncode != 0
    assert "divisible by dp" in proc.stderr + proc.stdout


def _write_requests(root, img, n=2):
    reqs = root / "requests.jsonl"
    reqs.write_text(
        "\n".join(
            json.dumps(
                {"prompt": p, "image_path": str(img), "seed": 40 + i, "output": f"v{i}.mp4"}
            )
            for i, p in enumerate(["a red bus", "a blue tram"][:n])
        )
    )
    return reqs


@pytest.fixture(scope="module")
def setup_wan(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("serve_wan")
    ckpt = root / "TinyWan"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    make_tiny_checkpoint.build_wan(str(ckpt))
    img = root / "input.png"
    Image.fromarray((np.random.RandomState(1).rand(32, 32, 3) * 255).astype(np.uint8)).save(img)
    cfg = root / "tiny.yaml"
    cfg.write_text(
        f"""
model:
  path: "{ckpt}"
  dtype: "float32"
generation:
  height: 32
  width: 32
  num_frames: 5
  num_inference_steps: 2
  guidance_scale: 5.0
  max_sequence_length: 16
alg:
  use_low_pass_guidance: True
  lp_filter_type: "down_up"
  lp_filter_in_latent: True
  lp_resize_factor: 0.4
  lp_strength_schedule_type: "interval"
  schedule_interval_start_time: 0.0
  schedule_interval_end_time: 0.5
video:
  fps: 16
"""
    )
    return root, cfg, _write_requests(root, img)


def test_serve_cli_wan_end_to_end(setup_wan, tmp_path):
    root, cfg, reqs = setup_wan
    proc = _run(cfg, reqs, tmp_path / "out")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    for name in ("v0", "v1"):
        written = [p for p in (tmp_path / "out").iterdir() if p.stem == name]
        assert written and written[0].stat().st_size > 0, name
    assert "Batch complete: 2 videos" in proc.stdout


@pytest.fixture(scope="module")
def setup_hunyuan(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("serve_hy")
    ckpt = root / "TinyHunyuanVideo"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    make_tiny_checkpoint.build_hunyuan(str(ckpt))
    img = root / "input.png"
    Image.fromarray((np.random.RandomState(2).rand(32, 32, 3) * 255).astype(np.uint8)).save(img)
    # no video.resolution → explicit generation.height/width apply (tiny
    # shapes; shipped configs use the bucketed-resolution path instead)
    cfg = root / "tiny.yaml"
    cfg.write_text(
        f"""
model:
  path: "{ckpt}"
  dtype: "float32"
  flow_shift: 7.0
generation:
  height: 32
  width: 32
  num_frames: 5
  num_inference_steps: 2
  guidance_scale: 6.0
  true_cfg_scale: 2.0
  i2v_stable: True
  max_sequence_length: 16
alg:
  use_low_pass_guidance: True
  lp_filter_type: "down_up"
  lp_filter_in_latent: True
  lp_resize_factor: 0.625
  lp_strength_schedule_type: "interval"
  schedule_interval_start_time: 0.0
  schedule_interval_end_time: 0.5
video:
  fps: 15
"""
    )
    return root, cfg, _write_requests(root, img)


def test_serve_cli_hunyuan_end_to_end(setup_hunyuan, tmp_path):
    """Full Hunyuan serving through the CLI: Llava template encode (incl. the
    black-image negative branch, true_cfg_scale > 1), CLIP pooled embeds,
    token_replace sampling, per-request outputs."""
    root, cfg, reqs = setup_hunyuan
    proc = _run(cfg, reqs, tmp_path / "out")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    for name in ("v0", "v1"):
        written = [p for p in (tmp_path / "out").iterdir() if p.stem == name]
        assert written and written[0].stat().st_size > 0, name
    assert "Batch complete: 2 videos" in proc.stdout


def _run_single(cfg, img, out_path):
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR="/root/.cache/jax_tpu_cache")
    return subprocess.run(
        [sys.executable, "-m", "alg_tpu.cli", "--config", str(cfg),
         "--image_path", str(img), "--prompt", "a red bus driving",
         "--output_path", str(out_path)],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
    )


def test_run_cli_wan_end_to_end(setup_wan, tmp_path):
    """Reference-surface `run.py` flow for the Wan family (test_cli.py covers
    CogVideoX): YAML dispatch → UMT5+CLIP-vision encode → sampler → video."""
    root, cfg, _ = setup_wan
    proc = _run_single(cfg, root / "input.png", tmp_path / "wan.mp4")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = [p for p in tmp_path.iterdir() if p.stem == "wan"]
    assert out and out[0].stat().st_size > 0
    assert "Run complete" in proc.stdout


def test_run_cli_hunyuan_end_to_end(setup_hunyuan, tmp_path):
    root, cfg, _ = setup_hunyuan
    proc = _run_single(cfg, root / "input.png", tmp_path / "hy.mp4")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    out = [p for p in tmp_path.iterdir() if p.stem == "hy"]
    assert out and out[0].stat().st_size > 0
    assert "Run complete" in proc.stdout


def test_serve_cli_wan_flf2v(setup_wan, tmp_path):
    """last_image_path in a request JSONL routes through the FLF2V path."""
    from PIL import Image

    root, cfg, _ = setup_wan
    last = root / "last.png"
    Image.fromarray((np.random.RandomState(9).rand(32, 32, 3) * 255).astype(np.uint8)).save(last)
    reqs = tmp_path / "flf2v.jsonl"
    reqs.write_text(json.dumps({
        "prompt": "a red bus", "image_path": str(root / "input.png"),
        "last_image_path": str(last), "seed": 5, "output": "flf.mp4",
    }))
    proc = _run(cfg, reqs, tmp_path / "out")
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    written = [p for p in (tmp_path / "out").iterdir() if p.stem == "flf"]
    assert written and written[0].stat().st_size > 0
