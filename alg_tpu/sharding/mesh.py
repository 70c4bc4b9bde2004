"""Device mesh construction for ICI-sharded serving.

The reference is strictly single-device (SURVEY §2, §5): its only memory
relief is CPU offload / VAE tiling. The TPU replacement is a
``(dp, sp, tp)`` mesh — data parallel over prompts (batched multi-prompt
serving, BASELINE config #5), optional sequence parallel over DiT tokens
(long-context relief, SURVEY §5), tensor parallel over attention heads / MLP
width inside each DiT (Megatron-style, collectives emitted by XLA GSPMD from
the weight shardings in :mod:`alg_tpu.sharding.partition`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
    sp: int = 1,
    pp: int = 1,
) -> Mesh:
    """Mesh with axes ``("dp", "pp", "sp", "tp")`` over the given (default:
    all) devices. ``sp``/``pp`` default to 1, so existing ``(dp, tp)``
    layouts are the same mesh with unit extra axes (specs address axes by
    name). ``pp`` stages the stacked DiT block layers
    (:mod:`alg_tpu.sharding.pipeline`); it sits between dp and sp/tp so each
    stage's tp group stays ICI-contiguous."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        tp = len(devices) // (dp * sp * pp)
    if dp * pp * sp * tp != len(devices):
        raise ValueError(
            f"dp*pp*sp*tp = {dp}*{pp}*{sp}*{tp} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(dp, pp, sp, tp)
    return Mesh(arr, ("dp", "pp", "sp", "tp"))


def cpu_mesh(n_devices: int, dp: int = 1, sp: int = 1) -> Mesh:
    """Virtual CPU mesh for sharding tests without TPU hardware
    (requires ``--xla_force_host_platform_device_count``)."""
    cpus = jax.local_devices(backend="cpu")
    if len(cpus) < n_devices:
        raise RuntimeError(
            f"Only {len(cpus)} CPU devices; set XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}"
        )
    return make_mesh(dp=dp, sp=sp, devices=cpus[:n_devices])
