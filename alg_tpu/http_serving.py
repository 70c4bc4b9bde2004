"""Persistent HTTP serving daemon with fixed-shape micro-batching.

Beyond the reference surface (choi403/ALG ships a single-prompt ``run.py``
and no serving at all) and beyond this repo's batch CLI: a long-lived
process keeps the — possibly mesh-sharded and/or int8-quantized — pipeline
resident on device, so the checkpoint-streaming / compile cold start is
paid once and every request afterwards costs pure generation.

TPU-native design points:

* **One compiled program.** XLA compiles per input shape, so the batcher
  pads every micro-batch UP to the fixed ``max_batch`` by repeating the
  last request (pad outputs are discarded). Arrival pattern never changes
  the compiled shape; the first request warms the cache and all later
  batches hit it. (HunyuanVideo's aspect-ratio bucketing is the one
  exception: the bucket is computed from each micro-batch's first image,
  and a new aspect ratio compiles — once — for its shape.)
* **Continuous micro-batching.** A single worker drains the queue: it
  blocks for the first request, then waits up to ``batch_window`` seconds
  for up to ``max_batch - 1`` more, and runs them through ONE
  :func:`alg_tpu.serving.serve_batch` invocation — per-request seeds keep
  outputs identical to single-request runs (pinned by the serving
  exactness tests).

Protocol (JSON over HTTP, stdlib-only):

* ``GET /healthz`` → ``{"ok": true, "family": ..., "queue_depth": n,
  "max_batch": k, "served": m}``
* ``POST /generate`` with body ``{"prompt": str, "image_b64": str |
  "image_path": str, "negative_prompt": str?, "seed": int?,
  "last_image_b64"/"last_image_path": ...?}`` → blocks until the video is
  generated → ``{"video_b64": str, "container": "mp4"|"avi"|"gif",
  "num_frames": int, "seed": int}``. ``image_b64`` is the base64 of an
  image FILE (png/jpeg bytes), not raw pixels.

Start it with ``alg-tpu-serve --config ... --listen 8000 [--max_batch 4
--batch_window 0.2] [--dp/--sp/--tp ...] [--quantize w8]``.
"""

from __future__ import annotations

import base64
import io
import json
import logging
import os
import queue
import tempfile
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


def _image_from_request(obj: Dict[str, Any], key: str):
    """PIL image from ``{key}_b64`` (base64 of an image file) or ``{key}_path``."""
    from PIL import Image

    b64 = obj.get(f"{key}_b64")
    if b64 is not None:
        return Image.open(io.BytesIO(base64.b64decode(b64))).convert("RGB")
    path = obj.get(f"{key}_path")
    if path is not None:
        return Image.open(path).convert("RGB")
    return None


@dataclass
class _Pending:
    request: Any  # serving.BatchRequest
    done: threading.Event = field(default_factory=threading.Event)
    result: Any = None  # frames list on success
    error: Optional[str] = None


class BatchingWorker(threading.Thread):
    """Single device-owning thread: drains the queue into padded micro-batches.

    All device work happens here — HTTP threads only enqueue and wait — so
    generation is serialized (one sampler invocation at a time) and the
    pipeline object is never shared across threads.
    """

    def __init__(self, pipeline, gen_kwargs, *, mesh=None, sp_mode="gather",
                 max_batch: int = 1, batch_window: float = 0.2, hunyuan_resolution=None):
        super().__init__(daemon=True, name="alg-tpu-batcher")
        self.pipeline = pipeline
        self.gen_kwargs = dict(gen_kwargs)
        self.mesh = mesh
        self.sp_mode = sp_mode
        self.max_batch = max(1, int(max_batch))
        self.batch_window = float(batch_window)
        self.hunyuan_resolution = hunyuan_resolution
        self.queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self.served = 0
        self._stop = threading.Event()

    def submit(self, request) -> _Pending:
        p = _Pending(request)
        self.queue.put(p)
        return p

    def shutdown(self):
        self._stop.set()
        self.queue.put(None)  # unblock the drain loop

    # -- internals ----------------------------------------------------------

    def _drain_batch(self):
        """Block for one request, then collect up to max_batch within the window."""
        first = self.queue.get()
        if first is None:
            return []
        batch = [first]
        if self.max_batch > 1:
            import time

            deadline = time.monotonic() + self.batch_window
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self.queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                batch.append(nxt)
        return batch

    def _gen_kwargs_for(self, batch):
        kw = dict(self.gen_kwargs)
        if self.hunyuan_resolution is not None:
            # reference run.py:112-113 — bucket from the input aspect ratio;
            # recomputed per micro-batch (one batch shares one shape)
            from alg_tpu.alg.hunyuan_size import get_hunyuan_video_size

            kw["height"], kw["width"] = get_hunyuan_video_size(
                self.hunyuan_resolution, batch[0].request.image
            )
        return kw

    def run(self):
        from alg_tpu.serving import serve_batch

        while not self._stop.is_set():
            batch = self._drain_batch()
            if not batch:
                continue
            n = len(batch)
            requests = [p.request for p in batch]
            # pad to the fixed compiled shape; pad rows are discarded
            requests += [requests[-1]] * (self.max_batch - n)
            try:
                videos = serve_batch(
                    self.pipeline, requests, mesh=self.mesh,
                    sp_mode=self.sp_mode, **self._gen_kwargs_for(batch)
                )
                for p, frames in zip(batch, videos[:n]):
                    p.result = frames
                    p.done.set()
                self.served += n
            except Exception as exc:  # surface the failure to every waiter
                logger.exception("micro-batch of %d failed", n)
                for p in batch:
                    p.error = f"{type(exc).__name__}: {exc}"
                    p.done.set()


def _encode_video_bytes(frames, fps: int):
    """frames → (container bytes, container name) via io.video.write_video."""
    from alg_tpu.io.video import write_video

    with tempfile.TemporaryDirectory() as td:
        out = write_video(os.path.join(td, "out.mp4"), frames, fps=fps)
        with open(out, "rb") as f:
            data = f.read()
        return data, os.path.splitext(out)[1].lstrip(".")


def make_handler(worker: BatchingWorker, fps: int, family: str):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # route through logging, not stderr
            logger.info("%s - %s", self.address_string(), fmt % args)

        def _json(self, code: int, obj: Dict[str, Any]):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True, "family": family,
                    "queue_depth": worker.queue.qsize(),
                    "max_batch": worker.max_batch, "served": worker.served,
                })
            else:
                self._json(404, {"error": "unknown path (GET /healthz, POST /generate)"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "unknown path (GET /healthz, POST /generate)"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                obj = json.loads(self.rfile.read(length) or b"{}")
                from alg_tpu.serving import BatchRequest

                image = _image_from_request(obj, "image")
                if "prompt" not in obj or image is None:
                    self._json(400, {"error": "body needs 'prompt' and 'image_b64' or 'image_path'"})
                    return
                req = BatchRequest(
                    prompt=obj["prompt"],
                    image=image,
                    negative_prompt=obj.get("negative_prompt"),
                    seed=int(obj.get("seed", 42)),
                    last_image=_image_from_request(obj, "last_image"),
                )
            except Exception as exc:
                self._json(400, {"error": f"bad request: {exc}"})
                return
            pending = worker.submit(req)
            pending.done.wait()
            if pending.error is not None:
                self._json(500, {"error": pending.error})
                return
            data, container = _encode_video_bytes(pending.result, fps)
            self._json(200, {
                "video_b64": base64.b64encode(data).decode(),
                "container": container,
                "num_frames": len(pending.result),
                "seed": req.seed,
            })

    return Handler


def serve_http(pipeline, cfg, *, host: str = "127.0.0.1", port: int = 8000,
               mesh=None, sp_mode: str = "gather", max_batch: int = 1,
               batch_window: float = 0.2) -> ThreadingHTTPServer:
    """Build and return the bound server (call ``serve_forever`` to run).

    ``cfg`` is a :func:`alg_tpu.core.config.load_run_config` result — the
    generation/ALG kwargs and fps come from it with the reference's merge
    semantics, exactly like the batch CLI path.
    """
    gen_kwargs = {k: v for k, v in cfg.pipeline_kwargs.items() if v is not None}
    hunyuan_resolution = None
    if cfg.family == "hunyuan" and "resolution" in (cfg.video or {}):
        hunyuan_resolution = cfg.video["resolution"]
        gen_kwargs.pop("height", None)
        gen_kwargs.pop("width", None)
    worker = BatchingWorker(
        pipeline, gen_kwargs, mesh=mesh, sp_mode=sp_mode,
        max_batch=max_batch, batch_window=batch_window,
        hunyuan_resolution=hunyuan_resolution,
    )
    worker.start()
    handler = make_handler(worker, fps=int(cfg.video["fps"]), family=cfg.family)
    server = ThreadingHTTPServer((host, port), handler)
    server.alg_worker = worker  # for tests / clean shutdown
    logger.info(
        "Serving %s on http://%s:%d (max_batch=%d, window=%.2fs)",
        cfg.family, *server.server_address[:2], max_batch, batch_window,
    )
    return server
