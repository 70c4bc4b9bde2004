"""Multi-host serving (`alg_tpu.sharding.multihost` + `alg-tpu-serve
--multihost`): real 2-process jax.distributed runs on CPU.

The reference has no distributed backend (SURVEY §5); this is the framework's
DCN tier — each process serves a contiguous slice of the global request list
on its LOCAL devices, so cross-host links carry zero intra-step traffic.
Outputs must be bitwise-identical to a single-process serve of the same
requests (per-request seeds make results placement-independent)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def test_local_request_slice_partition():
    from alg_tpu.sharding.multihost import local_request_slice

    # contiguous cover, remainder to leading processes, sizes differ by <= 1
    for n in (1, 2, 3, 7, 8):
        for pcount in (1, 2, 3, 4):
            slices = [local_request_slice(n, pid, pcount) for pid in range(pcount)]
            covered = []
            for s in slices:
                covered.extend(range(s.start, s.stop))
            assert covered == list(range(n)), (n, pcount, slices)
            sizes = [s.stop - s.start for s in slices]
            assert max(sizes) - min(sizes) <= 1


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("mh")
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
            json.dumps(
                {"prompt": p, "image_path": str(img), "seed": 40 + i, "output": f"v{i}.mp4"}
            )
            for i, p in enumerate(["a red bus", "a blue tram", "a green boat"])
        )
    )
    return root, cfg, reqs


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # bypass the axon plugin: true multi-process CPU
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return env


def _serve(cfg, reqs, out_dir, extra=()):
    return subprocess.Popen(
        [sys.executable, "-m", "alg_tpu.serve_cli", "--config", str(cfg),
         "--requests", str(reqs), "--output_dir", str(out_dir), *extra],
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=_env(),
    )


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_multihost_matches_single_process(setup, tmp_path):
    root, cfg, reqs = setup

    # reference: single process serves all three
    ref = _serve(cfg, reqs, tmp_path / "single")
    out, _ = ref.communicate(timeout=1200)
    assert ref.returncode == 0, out[-2000:]

    # two processes, dp=1 locally (1 device each after forced count of 2 is
    # split? no — each process sees its own 2 forced CPU devices), tp unused:
    # process 0 serves requests [0, 2), process 1 serves [2, 3)
    coord = f"127.0.0.1:{_free_port()}"
    common = ("--multihost", "--coordinator", coord, "--num_processes", "2")
    p0 = _serve(cfg, reqs, tmp_path / "mh", extra=(*common, "--process_id", "0"))
    p1 = _serve(cfg, reqs, tmp_path / "mh", extra=(*common, "--process_id", "1"))
    out0, _ = p0.communicate(timeout=1200)
    out1, _ = p1.communicate(timeout=1200)
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    assert "serves requests [0, 2)" in out0
    assert "serves requests [2, 3)" in out1

    # every video written exactly once, bitwise equal to the single-run output
    for i in range(3):
        single = next((tmp_path / "single").glob(f"v{i}.*"))
        multi = next((tmp_path / "mh").glob(f"v{i}.*"))
        assert single.read_bytes() == multi.read_bytes(), f"v{i} differs"
