"""Image / video pre- and post-processing (host side).

Mirrors the diffusers ``VideoProcessor`` behavior the reference relies on:
PIL resize to the target size (lanczos), scale to [-1, 1] for VAE input
(``pipeline_cogvideox_image2video_lowpass.py:969-971``); postprocess maps
decoded frames back to [0, 1] then uint8 PIL frames (``:1148``).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:
    from PIL import Image

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _HAS_PIL = False


def preprocess_image(image, height: int, width: int) -> np.ndarray:
    """PIL image / array → fp32 ``[1, 3, H, W]`` in [-1, 1] (torch layout)."""
    if _HAS_PIL and isinstance(image, Image.Image):
        image = image.convert("RGB").resize((width, height), resample=Image.LANCZOS)
        arr = np.asarray(image).astype(np.float32) / 255.0
    else:
        arr = np.asarray(image, dtype=np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.shape[0] == 3 and arr.ndim == 3:
            arr = arr.transpose(1, 2, 0)
        if arr.shape[:2] != (height, width):
            raise ValueError(
                f"Array input must already be {height}x{width} (got {arr.shape[:2]}); pass a PIL image for resizing"
            )
    arr = arr * 2.0 - 1.0
    return arr.transpose(2, 0, 1)[None]  # [1, 3, H, W]


def postprocess_video(frames: np.ndarray, output_type: str = "pil"):
    """``[B, F, C, H, W]`` fp32 in [-1, 1] → list of PIL frame lists / np / raw."""
    if output_type == "latent":
        return frames
    video = np.clip(frames / 2.0 + 0.5, 0.0, 1.0)
    if output_type == "np":
        return video.transpose(0, 1, 3, 4, 2)  # [B, F, H, W, C]
    if output_type == "pil":
        if not _HAS_PIL:
            raise RuntimeError("PIL unavailable; use output_type='np'")
        out = []
        for b in range(video.shape[0]):
            fr = (video[b].transpose(0, 2, 3, 1) * 255).round().astype(np.uint8)
            out.append([Image.fromarray(f) for f in fr])
        return out
    raise ValueError(f"Unknown output_type {output_type!r}")


def validate_attention_kwargs(attention_kwargs) -> None:
    """Reference ``attention_kwargs`` passthrough surface
    (``...cogvideox...py:1088``, ``...wan...py:915``, ``...hunyuan...py:1250``).

    diffusers uses this dict to carry the per-call LoRA ``scale`` down to the
    attention processors. This framework merges LoRA deltas into the weights
    at load time (``alg_tpu.io.lora.merge_lora(..., scale=...)``), so
    ``scale == 1.0`` — the diffusers default, numerically identical to merged
    weights — is accepted as a no-op; any other value must be applied at merge
    time (re-merge with the desired scale). Unknown keys are rejected loudly
    rather than silently dropped (the reference would forward them to the
    attention processors, which this framework does not have)."""
    if attention_kwargs is None:
        return
    kw = dict(attention_kwargs)
    scale = kw.pop("scale", None)
    if kw:
        raise ValueError(
            f"Unsupported attention_kwargs keys {sorted(kw)}; supported: ['scale']"
        )
    if scale is not None and scale != 1.0:
        raise ValueError(
            "attention_kwargs['scale'] != 1.0: per-call LoRA scaling is applied "
            "at merge time in this framework — re-merge with "
            "alg_tpu.io.lora.merge_lora(..., scale=...)"
        )
