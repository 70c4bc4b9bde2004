"""Video export (host side).

The reference encodes H.264 via torchvision/PyAV with ``crf=18, preset=slow``
(``run.py:127-133``). This environment has no ffmpeg/av, so: use the ffmpeg
binary when present (same codec parameters), otherwise fall back to GIF (PIL)
or PNG frames, keyed by the output extension/availability.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import List

import numpy as np


def _frames_to_uint8(frames) -> np.ndarray:
    """List of PIL images or [F, H, W, C] float/uint8 array → uint8 array."""
    if isinstance(frames, (list, tuple)):
        arr = np.stack([np.asarray(f) for f in frames])
    else:
        arr = np.asarray(frames)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).round().astype(np.uint8)
    return arr


def write_video(output_path: str, frames, fps: int) -> str:
    """Write frames; returns the actual path written (extension may change
    when falling back). H.264 crf 18 preset slow when ffmpeg is available."""
    arr = _frames_to_uint8(frames)
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is not None:
        f, h, w, _ = arr.shape
        cmd = [
            ffmpeg, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
            "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
            "-c:v", "libx264", "-crf", "18", "-preset", "slow",
            "-pix_fmt", "yuv420p", output_path,
        ]
        proc = subprocess.run(cmd, input=arr.tobytes(), capture_output=True)
        if proc.returncode == 0:
            return output_path
        raise RuntimeError(f"ffmpeg failed: {proc.stderr.decode()[-500:]}")

    # fallback: GIF via PIL
    try:
        from PIL import Image

        base, _ = os.path.splitext(output_path)
        gif_path = base + ".gif"
        imgs = [Image.fromarray(f) for f in arr]
        imgs[0].save(
            gif_path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0
        )
        return gif_path
    except ImportError:
        base, _ = os.path.splitext(output_path)
        os.makedirs(base, exist_ok=True)
        for i, f in enumerate(arr):
            np.save(os.path.join(base, f"frame_{i:04d}.npy"), f)
        return base
