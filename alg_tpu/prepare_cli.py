"""Latent-precompute CLI — ``alg-tpu-prepare`` (beyond-parity; completes the
fine-tuning workflow end to end: prepare → ``alg-tpu-train`` → merge/serve).

Training runs over precomputed latent batches (frozen VAE/text encoders —
``alg_tpu/training/losses.py``); this tool produces them. It reads a JSONL
manifest of (video, prompt) pairs, runs each clip through the SAME encode
paths the inference pipelines use — deterministic (mode) VAE encode with the
family's scaling/normalization, tiled automatically for HBM-sized clips,
text/image encoders with the reference's exact quirks (UMT5 trim+re-pad,
Llava template crop, CLIP-vision penultimate states) — and writes one
``.npz`` per example with exactly the loss's batch keys:

* cogvideox: ``latents [F',C,h,w]`` (scaled mode-encode of the clip),
  ``image_latents [F',C,h,w]`` (first frame, zero-padded),
  ``encoder_hidden_states [S,text_dim]`` (T5, no mask — reference behavior)
* wan: ``latents [z,F',h,w]`` (latents_mean/std-normalized),
  ``condition [20,F',h,w]`` (mask block + first-frame condition latent),
  ``encoder_hidden_states [S,text_dim]`` (UMT5), optional
  ``encoder_hidden_states_image [257,image_dim]`` (CLIP vision)
* hunyuan: ``latents [z,F',h,w]`` (×0.476986), ``image_latents [z,1,h,w]``,
  ``encoder_hidden_states``/``encoder_attention_mask`` (Llava path),
  ``pooled_projections`` (CLIP pooled)

Clip inputs (no ffmpeg in scope — SURVEY §2.1 video encode is host-side):
a directory of frame images (sorted), a ``.npy``/``.npz`` array
``[F, H, W, 3]`` (uint8 or [0,1]/[-1,1] float), or a single image (warned;
1-frame clip). Frame counts are coerced to the families' ``4k+1`` rule like
the pipelines coerce ``num_frames`` (reference ``...wan...py:764-769``).

Manifest line: ``{"video": <path>, "prompt": <str>}``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s", stream=sys.stdout)
logger = logging.getLogger(__name__)

_IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def load_frames(path: str):
    """Clip → list of PIL images / float array ``[F, H, W, 3]``."""
    from PIL import Image

    if os.path.isdir(path):
        names = sorted(
            n for n in os.listdir(path) if n.lower().endswith(_IMG_EXT)
        )
        if not names:
            raise FileNotFoundError(f"no frame images under {path}")
        return [Image.open(os.path.join(path, n)) for n in names]
    if path.lower().endswith((".npy", ".npz")):
        arr = np.load(path)
        if hasattr(arr, "files"):  # npz: take "frames" or the single array
            key = "frames" if "frames" in arr.files else arr.files[0]
            arr = arr[key]
        if arr.ndim != 4 or arr.shape[-1] != 3:
            raise ValueError(f"{path}: expected [F, H, W, 3], got {arr.shape}")
        return arr
    if path.lower().endswith(_IMG_EXT):
        logger.warning("%s is a single image; writing a 1-frame clip", path)
        return [Image.open(path)]
    raise ValueError(
        f"unsupported clip input {path!r} (frames dir, .npy/.npz, or image)"
    )


def frames_to_tensor(frames, height: int, width: int) -> np.ndarray:
    """→ fp32 ``[F, 3, H, W]`` in [-1, 1] via the pipelines' preprocessing.

    Float arrays are taken as [0, 1] unless they contain negatives ([-1, 1]);
    off-size arrays round-trip through PIL for the lanczos resize."""
    if isinstance(frames, np.ndarray):
        arr = frames.astype(np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.min() >= 0.0:
            arr = arr * 2.0 - 1.0
        if arr.shape[1:3] != (height, width):
            from PIL import Image

            frames = [
                Image.fromarray(
                    ((f + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
                )
                for f in arr
            ]
        else:
            return arr.transpose(0, 3, 1, 2)
    return np.concatenate(
        [np.asarray(frames_to_tensor_one(f, height, width)) for f in frames], axis=0
    )


def frames_to_tensor_one(frame, height, width):
    from alg_tpu.pipelines.processing import preprocess_image

    return preprocess_image(frame, height, width)


def coerce_frames(frames_fchw: np.ndarray) -> np.ndarray:
    """Truncate to the ``4k+1`` frame rule all three families share."""
    f = frames_fchw.shape[0]
    keep = (f - 1) // 4 * 4 + 1
    if keep != f:
        logger.warning("clip has %d frames; truncating to %d (4k+1 rule)", f, keep)
    return frames_fchw[:keep]


class _ZeroNoise:
    """NoiseSource stand-in: zero eps → posterior draw collapses to the mode
    (deterministic latents; the standard precompute choice)."""

    def randn(self, shape, dtype=np.float32):
        return np.zeros(shape, dtype)


def encode_cogvideox(pipe, frames: np.ndarray, prompt: str, max_seq: int) -> dict:
    import jax.numpy as jnp

    scale = pipe.vae_cfg.scaling_factor

    def enc(clip_bfchw):
        z = pipe.vae_encode_sample(clip_bfchw, _ZeroNoise())  # mode ([B,F',C,h,w])
        return z * scale if not pipe.vae_cfg.invert_scale_latents else z / scale

    z = enc(frames[None])
    zi = enc(frames[:1][None])
    pad = jnp.zeros((1, z.shape[1] - 1) + zi.shape[2:], zi.dtype)
    zi = jnp.concatenate([zi, pad], axis=1)
    embeds = pipe.encode_prompt([prompt], max_seq)
    return {
        "latents": np.asarray(z[0], np.float32),
        "image_latents": np.asarray(zi[0], np.float32),
        "encoder_hidden_states": np.asarray(embeds[0], np.float32),
    }


def encode_wan(pipe, frames: np.ndarray, prompt: str, max_seq: int, flf2v: bool = False) -> dict:
    import jax.numpy as jnp

    f, _, height, width = frames.shape
    latents = pipe._encode_video_condition_p(pipe.vae_params, jnp.asarray(frames[None]))
    # FLF2V: condition on first AND last frame (reference last_image path,
    # ...wan...py:403-412) — trains the first-last-frame-to-video objective
    last = frames[-1:] if flf2v else None
    condition = pipe._build_condition(frames[:1], 1, f, height, width, last)
    out = {
        "latents": np.asarray(latents[0], np.float32),
        "condition": np.asarray(condition[0], np.float32),
        "encoder_hidden_states": np.asarray(
            pipe.encode_prompt([prompt], max_seq)[0], np.float32
        ),
    }
    if pipe.transformer_cfg.image_dim is not None:
        out["encoder_hidden_states_image"] = np.asarray(
            pipe.encode_image(frames[:1])[0], np.float32
        )
    return out


def encode_hunyuan(pipe, frames: np.ndarray, prompt: str, max_seq: int) -> dict:
    import jax
    import jax.numpy as jnp

    from alg_tpu.models.hunyuan import hunyuan_vae_encode
    from alg_tpu.models.vae_tiling import auto_tile_encode, tiled_encode

    scale = pipe.vae_cfg.scaling_factor

    def enc(clip_bfchw):
        x = jnp.asarray(clip_bfchw, pipe._vae_dtype()).transpose(0, 1, 3, 4, 2)
        fn = jax.jit(lambda p, xt: hunyuan_vae_encode(p, pipe.vae_cfg, xt)[0])
        if auto_tile_encode(x.shape[1], x.shape[2], x.shape[3], pipe.vae_encode_tiling):
            mean = tiled_encode(lambda xt: fn(pipe.vae_params, xt), x, pipe.vae_cfg.spatial_scale)
        else:
            mean = fn(pipe.vae_params, x)
        return mean.astype(jnp.float32).transpose(0, 4, 1, 2, 3) * scale  # [B,z,F',h,w]

    z = enc(frames[None])
    zi = enc(frames[:1][None])
    embeds, pooled, mask = pipe.encode_prompt(
        frames[:1], prompt, max_sequence_length=max_seq
    )
    return {
        "latents": np.asarray(z[0], np.float32),
        "image_latents": np.asarray(zi[0], np.float32),
        "encoder_hidden_states": np.asarray(embeds[0], np.float32),
        "encoder_attention_mask": np.asarray(mask[0], np.int32),
        "pooled_projections": np.asarray(pooled[0], np.float32),
    }


_ENCODERS = {"cogvideox": encode_cogvideox, "wan": encode_wan, "hunyuan": encode_hunyuan}


def main(argv=None):
    parser = argparse.ArgumentParser(description="alg-tpu latent precompute for fine-tuning")
    parser.add_argument("--config", type=str, required=True, help="run.py-style YAML (model/generation sections)")
    parser.add_argument("--model_cache_dir", type=str, default=None)
    parser.add_argument("--manifest", type=str, default=None, help='JSONL: {"video": path, "prompt": str} per line')
    parser.add_argument("--video", type=str, default=None, help="single clip (instead of --manifest)")
    parser.add_argument("--prompt", type=str, default=None, help="prompt for --video")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--limit", type=int, default=0, help="stop after N examples (0 = all)")
    parser.add_argument("--flf2v", action="store_true", help="Wan: condition on first AND last frame (FLF2V objective); per-item override via manifest key \"flf2v\"")
    args = parser.parse_args(argv)

    from alg_tpu.cli import load_pipeline
    from alg_tpu.core.config import load_run_config
    from alg_tpu.core.device import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_run_config(args.config)
    family = cfg.family
    pipe = load_pipeline(cfg, args.model_cache_dir)
    encode = _ENCODERS[family]

    gen = cfg.generation
    height, width = int(gen.get("height") or 480), int(gen.get("width") or 720)
    if family == "hunyuan" and (cfg.video or {}).get("resolution"):
        # reference bucketing (run.py:112-113) — size from the FIRST clip's
        # first frame aspect; all clips in one dataset share the bucket
        from alg_tpu.alg.hunyuan_size import get_hunyuan_video_size
    max_seq = int(gen.get("max_sequence_length") or {"cogvideox": 226, "wan": 512, "hunyuan": 256}[family])

    if args.manifest:
        with open(args.manifest) as fh:
            items = [json.loads(line) for line in fh if line.strip()]
    elif args.video and args.prompt is not None:
        items = [{"video": args.video, "prompt": args.prompt}]
    else:
        parser.error("pass --manifest, or --video with --prompt")
    if args.limit:
        items = items[: args.limit]

    os.makedirs(args.output_dir, exist_ok=True)
    sized = False
    for i, item in enumerate(items):
        frames = load_frames(item["video"])
        if family == "hunyuan" and (cfg.video or {}).get("resolution") and not sized:
            first = frames[0] if not isinstance(frames, np.ndarray) else frames[0]
            height, width = get_hunyuan_video_size((cfg.video or {})["resolution"], first)
            logger.info("Hunyuan bucket: %dx%d", height, width)
        sized = True
        tensor = coerce_frames(frames_to_tensor(frames, height, width))
        extra = {}
        if family == "wan":
            extra["flf2v"] = bool(item.get("flf2v", args.flf2v))
        example = encode(pipe, tensor, item["prompt"], max_seq, **extra)
        out_path = os.path.join(args.output_dir, f"example_{i:05d}.npz")
        np.savez(out_path, **example)
        shapes = {k: tuple(v.shape) for k, v in example.items()}
        logger.info("[%d/%d] %s → %s %s", i + 1, len(items), item["video"], out_path, shapes)
    logger.info("Wrote %d examples to %s", len(items), args.output_dir)


if __name__ == "__main__":
    main()
