"""HTTP serving daemon (`alg-tpu-serve --listen` / alg_tpu.http_serving):
persistent process, fixed-shape micro-batching, JSON-over-HTTP protocol.

Beyond-parity surface (the reference has no serving at all). serve_batch
exactness under meshes is covered by ``test_sharding.py``; this pins the
daemon wiring: request parsing (b64 and path images), micro-batch drain +
padding to the fixed ``max_batch``, per-request seeds, determinism across
requests, error surfacing, and the health endpoint.
"""

import base64
import io
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("httpd")
    ckpt = root / "TinyCogVideoX"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_tiny_checkpoint

    make_tiny_checkpoint.build(str(ckpt))

    img_path = root / "input.png"
    Image.fromarray(
        (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    ).save(img_path)

    cfg_path = root / "tiny.yaml"
    cfg_path.write_text(
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

    from alg_tpu.cli import load_pipeline
    from alg_tpu.core.config import load_run_config
    from alg_tpu.http_serving import serve_http

    cfg = load_run_config(str(cfg_path))
    pipe = load_pipeline(cfg)
    srv = serve_http(pipe, cfg, port=0, max_batch=2, batch_window=0.5)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", str(img_path)
    srv.alg_worker.shutdown()
    srv.shutdown()
    srv.server_close()


def _post(url, obj, expect_error=False):
    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        if not expect_error:
            raise
        return e.code, json.loads(e.read())


def test_healthz(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=60) as resp:
        obj = json.loads(resp.read())
    assert resp.status == 200
    assert obj["ok"] is True
    assert obj["family"] == "cogvideox"
    assert obj["max_batch"] == 2


def test_generate_b64_and_path_images_and_microbatch(server):
    """Three concurrent requests through a max_batch=2 daemon: one full
    micro-batch plus one padded batch; b64 and path image forms agree for
    the same seed; distinct seeds differ."""
    url, img_path = server
    with open(img_path, "rb") as f:
        img_b64 = base64.b64encode(f.read()).decode()

    bodies = [
        {"prompt": "a red bus", "image_b64": img_b64, "seed": 42},
        {"prompt": "a red bus", "image_path": img_path, "seed": 42},
        {"prompt": "a red bus", "image_path": img_path, "seed": 7},
    ]
    results = [None] * 3

    def call(i):
        results[i] = _post(url, bodies[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    for status, obj in results:
        assert status == 200
        assert obj["num_frames"] == 5
        assert base64.b64decode(obj["video_b64"])  # non-empty container bytes
    # same seed + same image (b64 vs path) → byte-identical video;
    # different seed → different video
    assert results[0][1]["video_b64"] == results[1][1]["video_b64"]
    assert results[0][1]["video_b64"] != results[2][1]["video_b64"]

    with urllib.request.urlopen(url + "/healthz", timeout=60) as resp:
        assert json.loads(resp.read())["served"] >= 3


def test_bad_request_and_unknown_path(server):
    url, _ = server
    status, obj = _post(url, {"prompt": "no image"}, expect_error=True)
    assert status == 400 and "image" in obj["error"]
    req = urllib.request.Request(url + "/nope", method="GET")
    try:
        urllib.request.urlopen(req, timeout=60)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404
