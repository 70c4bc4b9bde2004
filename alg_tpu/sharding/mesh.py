"""Device mesh construction for ICI-sharded serving.

The reference is strictly single-device (SURVEY §2, §5): its only memory
relief is CPU offload / VAE tiling. The TPU replacement is a 2D
``(dp, tp)`` mesh — data parallel over prompts (batched multi-prompt serving,
BASELINE config #5), tensor parallel over attention heads / MLP width inside
each DiT (Megatron-style, collectives emitted by XLA GSPMD from the weight
shardings in :mod:`alg_tpu.sharding.partition`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(dp: int = 1, tp: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ``("dp", "tp")`` over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // dp
    if dp * tp != len(devices):
        raise ValueError(f"dp*tp = {dp}*{tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def cpu_mesh(n_devices: int, dp: int = 1) -> Mesh:
    """Virtual CPU mesh for sharding tests without TPU hardware
    (requires ``--xla_force_host_platform_device_count``)."""
    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"Only {len(cpus)} CPU devices; set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
        )
    return make_mesh(dp=dp, devices=cpus[:n_devices])
