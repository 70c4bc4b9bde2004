"""CLI — drop-in surface of the reference ``run.py``.

Same flags (``--config --image_path --prompt --output_path --model_cache_dir``,
reference ``run.py:137-144``), same YAML schema and kwargs-merge semantics
(``run.py:102-106``), same fixed seed 42 (``run.py:94``), same model-family
dispatch by path substring (``run.py:45-86``), same H.264 encode parameters
when ffmpeg is available (``run.py:127-133``). Installed as the ``alg-tpu``
console script (pyproject ``[project.scripts]``); the repo-root ``run.py``
wraps this module for reference-identical invocation.
"""

import argparse
import logging
import sys

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", stream=sys.stdout)
logger = logging.getLogger(__name__)


def load_pipeline(cfg, model_cache_dir=None, quantize=None, lora=None, lora_scale=1.0):
    """Family-dispatched pipeline load (reference ``run.py:45-86`` semantics),
    shared by the single-run CLI and the batch-serving CLI. ``quantize``
    ("w8" | "w4") quantizes the DiT blocks host-side before streaming
    (HBM-safe int8/int4 serving — beyond-parity). ``lora`` merges a
    peft-layout adapter ``.npz`` (``alg-tpu-train`` output / diffusers LoRA
    converted to npz) into the DiT at ``lora_scale`` — the CLI face of the
    reference's LoRA loader mixins."""
    from alg_tpu.io.model_zoo import resolve_model_dir

    if lora is not None and quantize is not None:
        raise ValueError(
            "--lora with --quantize is unsupported: adapters must merge into "
            "the float kernels before quantization. Merge offline "
            "(alg_tpu.io.lora), save the tree, then quantize that checkpoint."
        )

    model_dir = resolve_model_dir(cfg.model_path, model_cache_dir)
    family = cfg.family

    if family == "cogvideox":
        from alg_tpu.io.model_zoo import load_cogvideox_pipeline

        pipe = load_cogvideox_pipeline(model_dir, dtype=cfg.model_dtype, quantize=quantize)
    elif family == "wan":
        from alg_tpu.io.model_zoo import load_wan_pipeline

        # reference quirk reproduced: flow_shift keyed on a *string* compare
        # against the int config value — always 5.0 with shipped configs
        # (run.py:63)
        flow_shift = 3.0 if cfg.generation.get("height") == "480" else 5.0
        pipe = load_wan_pipeline(model_dir, dtype=cfg.model_dtype, flow_shift=flow_shift, quantize=quantize)
    elif family == "hunyuan":
        from alg_tpu.io.model_zoo import load_hunyuan_pipeline

        pipe = load_hunyuan_pipeline(
            model_dir,
            dtype=cfg.model_dtype,
            flow_shift=cfg.flow_shift,
            invert_sigmas=bool(cfg.flow_reverse),
            quantize=quantize,
        )
    else:  # pragma: no cover
        raise ValueError(family)

    if lora is not None:
        import numpy as np

        from alg_tpu.io import lora as io_lora

        merge = {
            "cogvideox": io_lora.merge_lora_cogvideox,
            "wan": io_lora.merge_lora_wan,
            "hunyuan": io_lora.merge_lora_hunyuan,
        }[family]
        if lora.endswith(".safetensors"):
            # diffusers-published adapter file (same peft naming)
            from safetensors import safe_open

            with safe_open(lora, framework="np") as f:
                state = {k: f.get_tensor(k) for k in f.keys()}
        else:
            state = dict(np.load(lora))
        pipe.transformer_params = merge(pipe.transformer_params, state, scale=lora_scale)
        logger.info("Merged %d LoRA tensors from %s (scale %g)", len(state), lora, lora_scale)
    return pipe


def run(args):
    import jax

    from alg_tpu.core.config import load_run_config
    from alg_tpu.core.device import enable_compilation_cache
    from alg_tpu.io.video import write_video

    enable_compilation_cache()
    cfg = load_run_config(args.config)
    logger.info("Using device: %s", jax.devices()[0])

    family = cfg.family
    if getattr(args, "int8_attn", None):
        from alg_tpu.ops.attention import set_attention_int8

        set_attention_int8(args.int8_attn)
    pipe = load_pipeline(
        cfg, args.model_cache_dir, quantize=args.quantize,
        lora=getattr(args, "lora", None), lora_scale=getattr(args, "lora_scale", 1.0),
    )
    gmb = getattr(args, "guidance_microbatch", 0)
    if gmb and hasattr(pipe, "guidance_microbatch"):
        pipe.guidance_microbatch = gmb

    logger.info("Pipeline loaded successfully.")

    from PIL import Image

    input_image = Image.open(args.image_path).convert("RGB")

    pipe_kwargs = {"image": input_image, "prompt": args.prompt, "seed": 42}
    for key, value in cfg.pipeline_kwargs.items():
        if value is not None:
            pipe_kwargs[key] = value
    if args.checkpoint_path:
        # beyond-parity: preemption-safe resume (io/runstate.py) — snapshots
        # the denoise carry; rerunning the same command resumes automatically
        pipe_kwargs["checkpoint"] = args.checkpoint_path

    if family == "hunyuan" and "resolution" in (cfg.video or {}):
        # reference run.py:112-113 — bucketed H/W from the input image's
        # aspect ratio; explicit generation.height/width apply when the
        # config carries no video.resolution
        from alg_tpu.alg.hunyuan_size import get_hunyuan_video_size

        pipe_kwargs["height"], pipe_kwargs["width"] = get_hunyuan_video_size(
            cfg.video["resolution"], input_image
        )

    logger.info("Starting video generation...")
    log_subset = {k: v for k, v in pipe_kwargs.items() if k not in ["image"]}
    logger.info("Pipeline arguments: %s", log_subset)

    frames = pipe(**pipe_kwargs)[0]  # list of PIL frames for batch 0
    logger.info("Video generation complete. Received %d frames.", len(frames))

    out = write_video(args.output_path, frames, fps=cfg.video["fps"])
    logger.info("Saving video to: %s", out)
    logger.info("Video saved successfully. Run complete.")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Arguments")
    parser.add_argument("--config", type=str, default="./configs/hunyuan_video_alg.yaml")
    parser.add_argument(
        "--image_path", type=str, default="./assets/a red double decker bus driving down a street.jpg"
    )
    parser.add_argument("--prompt", type=str, default="a red double decker bus driving down a street")
    parser.add_argument("--output_path", type=str, default="output.mp4")
    parser.add_argument("--model_cache_dir", type=str, default=None)
    parser.add_argument(
        "--quantize",
        type=str,
        choices=("w8", "w4"),
        default=None,
        help="quantize DiT blocks at load (w8 = W8A8 int8, w4 = W4A8 int4 "
        "storage); host-side before streaming, so peak HBM is the quantized "
        "tree (beyond-parity; validate numerics per checkpoint)",
    )
    parser.add_argument(
        "--int8_attn",
        type=str,
        choices=("qk", "full"),
        default=None,
        help="run DiT self-attention on the int8 MXU (qk = int8 QK^T logits, "
        "full = both attention matmuls int8); composes with --quantize "
        "(beyond-parity; validate numerics per checkpoint)",
    )
    parser.add_argument(
        "--checkpoint_path",
        type=str,
        default=None,
        help="optional denoise-state snapshot file: the run saves progress "
        "here and resumes from it after an interruption (beyond-parity)",
    )
    parser.add_argument(
        "--guidance_microbatch", type=int, default=0,
        help="run CFG/ALG guidance passes sequentially in micro-batches of N "
        "samples instead of one batched forward (Wan family): ~(passes/N)× "
        "lower activation memory, ~free at production sequence lengths — the "
        "knob that fits Wan-14B W4A8 on one 16 GB chip (beyond-parity)",
    )
    parser.add_argument(
        "--lora", type=str, default=None,
        help="peft-layout adapter .npz (alg-tpu-train output) merged into "
        "the DiT before generation",
    )
    parser.add_argument("--lora_scale", type=float, default=1.0)
    return parser


def main(argv=None):
    run(build_parser().parse_args(argv))


if __name__ == "__main__":
    main()
