"""Batch-serving CLI — N prompts through one jit-compiled sampler invocation.

The reference CLI is strictly single-prompt (``run.py:137-144``); this
beyond-parity entry point exposes :func:`alg_tpu.serving.serve_batch` (and
its ICI mesh sharding) on the command line:

    alg-tpu-serve --config configs/cogvideox_alg.yaml \\
                  --requests requests.jsonl --output_dir out/ \\
                  [--dp 2 --sp 1 --tp 4] [--model_cache_dir ...]

``requests.jsonl`` holds one JSON object per line::

    {"prompt": "...", "image_path": "a.png",
     "negative_prompt": "...", "seed": 7, "output": "bus.mp4",
     "last_image_path": "z.png"}   # optional, Wan FLF2V

``negative_prompt`` defaults to ``""``, ``seed`` to 42 (the reference's fixed
seed, ``run.py:94``), ``output`` to ``{index:03d}.mp4``. Generation/ALG
kwargs come from the YAML config with the reference's merge semantics
(``run.py:102-106``). With any of ``--dp/--sp/--tp`` given, the DiT is placed
on a ``dp×sp×tp`` device mesh (``alg_tpu.sharding``) and the batch lays out
along ``dp`` — per-request outputs are identical to single-device runs
(exactness tests in ``tests/test_sharding.py``).

HunyuanVideo note: resolution bucketing (``lp_utils.py:163-189``) depends on
each image's aspect ratio, but one batch shares one shape — the bucket is
computed from the FIRST request's image and applied to all.
"""

import argparse
import json
import logging
import os
import sys

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", stream=sys.stdout)
logger = logging.getLogger(__name__)


def load_requests(path):
    from alg_tpu.serving import BatchRequest

    requests, outputs = [], []
    with open(path) as f:
        for idx, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            from PIL import Image

            requests.append(
                BatchRequest(
                    prompt=obj["prompt"],
                    image=Image.open(obj["image_path"]).convert("RGB"),
                    negative_prompt=obj.get("negative_prompt"),
                    seed=int(obj.get("seed", 42)),
                    # FLF2V (Wan): also condition the final frame
                    last_image=(
                        Image.open(obj["last_image_path"]).convert("RGB")
                        if obj.get("last_image_path")
                        else None
                    ),
                )
            )
            outputs.append(obj.get("output", f"{idx:03d}.mp4"))
    if not requests:
        raise ValueError(f"no requests found in {path}")
    return requests, outputs


def serve(args):
    pid, pcount = 0, 1
    if args.multihost:
        # must run before any other jax call claims the local backend
        from alg_tpu.sharding.multihost import initialize

        pid, pcount = initialize(args.coordinator, args.num_processes, args.process_id)
        logger.info("Multihost: process %d/%d", pid, pcount)

    import jax

    from alg_tpu.cli import load_pipeline
    from alg_tpu.core.config import load_run_config
    from alg_tpu.core.device import enable_compilation_cache
    from alg_tpu.io.video import write_video
    from alg_tpu.serving import serve_batch

    enable_compilation_cache()
    cfg = load_run_config(args.config)
    logger.info("Devices: %d × %s", len(jax.devices()), jax.devices()[0].platform)
    if args.int8_attn:
        from alg_tpu.ops.attention import set_attention_int8

        set_attention_int8(args.int8_attn)

    if args.listen is not None:
        if args.multihost:
            raise ValueError("--listen is single-process (front it with a router for multihost)")
        from alg_tpu.http_serving import serve_http

        mesh = None
        if args.dp != 1 or args.sp != 1 or args.tp != 0:
            from alg_tpu.sharding import make_mesh

            mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp or None)
            logger.info("Serving on mesh %s", dict(zip(mesh.axis_names, mesh.devices.shape)))
        pipe = load_pipeline(
            cfg, args.model_cache_dir, quantize=args.quantize,
            lora=args.lora, lora_scale=args.lora_scale,
        )
        logger.info("Pipeline loaded successfully.")
        server = serve_http(
            pipe, cfg, host=args.host, port=args.listen, mesh=mesh,
            sp_mode=args.sp_mode, max_batch=args.max_batch,
            batch_window=args.batch_window,
        )
        logger.info("Listening on http://%s:%d", *server.server_address[:2])
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            logger.info("Shutting down.")
        finally:
            server.alg_worker.shutdown()
            server.server_close()
        return

    if args.requests is None:
        raise ValueError("--requests is required unless --listen is given")
    requests, outputs = load_requests(args.requests)
    logger.info("Loaded %d requests from %s", len(requests), args.requests)

    if args.multihost:
        # each process serves a contiguous block on its LOCAL devices — the
        # requests are independent, so DCN carries zero intra-step traffic
        # (sharding/multihost.py rationale)
        from alg_tpu.sharding.multihost import local_request_slice

        sl = local_request_slice(len(requests))
        requests, outputs = requests[sl], outputs[sl]
        logger.info(
            "Multihost: process %d serves requests [%d, %d)", pid, sl.start, sl.stop
        )
        if not requests:
            logger.info("Multihost: no requests for this process. Run complete.")
            return

    use_mesh = args.dp != 1 or args.sp != 1 or args.tp != 0
    if use_mesh and len(requests) % args.dp != 0:
        raise ValueError(
            f"{len(requests)} requests do not lay out on dp={args.dp}; "
            "the batch size must be divisible by dp"
        )

    pipe = load_pipeline(
        cfg, args.model_cache_dir, quantize=args.quantize,
        lora=args.lora, lora_scale=args.lora_scale,
    )
    logger.info("Pipeline loaded successfully.")

    mesh = None
    if use_mesh:
        if args.multihost:
            from alg_tpu.sharding.multihost import local_mesh

            mesh = local_mesh(dp=args.dp, sp=args.sp, tp=args.tp or None)
        else:
            from alg_tpu.sharding import make_mesh

            mesh = make_mesh(dp=args.dp, sp=args.sp, tp=args.tp or None)
        logger.info("Serving on mesh %s", dict(zip(mesh.axis_names, mesh.devices.shape)))

    gen_kwargs = {k: v for k, v in cfg.pipeline_kwargs.items() if v is not None}
    if cfg.family == "hunyuan" and "resolution" in (cfg.video or {}):
        # reference run.py:112-113 — bucketed H/W from the input image's
        # aspect ratio; explicit generation.height/width apply when the
        # config carries no video.resolution
        from alg_tpu.alg.hunyuan_size import get_hunyuan_video_size

        gen_kwargs["height"], gen_kwargs["width"] = get_hunyuan_video_size(
            cfg.video["resolution"], requests[0].image
        )

    logger.info("Starting batched generation (%d requests)...", len(requests))
    import contextlib

    if args.profile_dir:
        from alg_tpu.utils.profiling import trace_to

        prof_ctx = trace_to(args.profile_dir)
        logger.info("Profiling to %s (view with TensorBoard/xprof)", args.profile_dir)
    else:
        prof_ctx = contextlib.nullcontext()
    if args.sp_mode != "gather" and (mesh is None or args.sp == 1):
        logger.warning("--sp_mode %s has no effect without --sp > 1", args.sp_mode)
    with prof_ctx:
        videos = serve_batch(pipe, requests, mesh=mesh, sp_mode=args.sp_mode, **gen_kwargs)

    os.makedirs(args.output_dir, exist_ok=True)
    for name, frames in zip(outputs, videos):
        out = write_video(os.path.join(args.output_dir, name), frames, fps=cfg.video["fps"])
        logger.info("Saved %s (%d frames)", out, len(frames))
    logger.info("Batch complete: %d videos. Run complete.", len(videos))


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Batched multi-prompt serving")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--requests", type=str, default=None,
                        help="JSONL: one request object per line (required unless --listen)")
    parser.add_argument(
        "--listen", type=int, default=None, metavar="PORT",
        help="run a persistent HTTP daemon instead of a one-shot batch: "
        "weights stay resident on device, requests micro-batch up to "
        "--max_batch within --batch_window (alg_tpu.http_serving)",
    )
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--max_batch", type=int, default=1,
                        help="fixed micro-batch size the daemon pads to (one compiled shape)")
    parser.add_argument("--batch_window", type=float, default=0.2,
                        help="seconds to wait for more requests after the first (daemon mode)")
    parser.add_argument("--output_dir", type=str, default="serve_out")
    parser.add_argument("--model_cache_dir", type=str, default=None)
    parser.add_argument(
        "--quantize", type=str, choices=("w8", "w4"), default=None,
        help="quantize DiT blocks at load, host-side before streaming (W8A8/W4A8)",
    )
    parser.add_argument(
        "--int8_attn", type=str, choices=("qk", "full"), default=None,
        help="run DiT self-attention on the int8 MXU (qk = int8 QK^T logits, "
        "full = both attention matmuls int8); composes with --quantize",
    )
    parser.add_argument("--lora", type=str, default=None,
                        help="peft-layout adapter .npz merged into the DiT before serving")
    parser.add_argument("--lora_scale", type=float, default=1.0)
    parser.add_argument("--dp", type=int, default=1, help="data-parallel mesh axis (prompts)")
    parser.add_argument("--sp", type=int, default=1, help="sequence-parallel mesh axis (DiT tokens)")
    parser.add_argument(
        "--sp_mode", type=str, choices=("gather", "ring", "ulysses"), default="gather",
        help="sequence-parallel KV strategy: gather = all-gathered KV; "
        "ring = ring attention (KV chunks rotate via ppermute, O(S/sp) peak "
        "KV memory per chip); ulysses = all-to-all head/sequence exchange "
        "(one full-seq kernel call per rank; needs heads/tp divisible by sp)",
    )
    parser.add_argument(
        "--tp", type=int, default=0,
        help="tensor-parallel mesh axis (0 = fill remaining devices when any mesh flag is set)",
    )
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="write a jax.profiler trace of the batched generation here "
        "(TensorBoard/xprof format)",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="multi-process serving: jax.distributed bring-up, each process "
        "serves a contiguous slice of the request list on its LOCAL devices "
        "(mesh flags then apply per process; DCN carries no intra-step traffic)",
    )
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address (host:port); omit on TPU pods (auto)")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    return parser


def main(argv=None):
    serve(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
