"""YAML config surface — identical schema to the reference.

Reference schema (``readme.md:71-136``; loader ``run.py:33-38,102-106``):
sections ``model.{path,dtype[,flow_shift,flow_reverse]}``,
``generation.{...}``, ``alg.{...}``, ``video.{fps[,resolution]}``. Merge
semantics: pipeline kwargs = ``{**generation, **alg}`` with ``None`` values
dropped so pipeline defaults win (``run.py:102-106``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import yaml

import jax.numpy as jnp

_DTYPE_MAP = {
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
    "float32": jnp.float32,
    "float64": jnp.float64,
}


def resolve_dtype(name: str):
    """torch-dtype-string → jnp dtype (reference ``run.py:36-38`` analog)."""
    try:
        return _DTYPE_MAP[name]
    except KeyError:
        raise ValueError(f"Unsupported model dtype {name!r}; expected one of {sorted(_DTYPE_MAP)}")


@dataclasses.dataclass
class RunConfig:
    """Parsed YAML run config with reference merge semantics."""

    model_path: str
    model_dtype: Any
    model_dtype_str: str
    flow_shift: Optional[float]
    flow_reverse: Optional[bool]
    generation: Dict[str, Any]
    alg: Dict[str, Any]
    video: Dict[str, Any]
    raw: Dict[str, Any]

    @property
    def pipeline_kwargs(self) -> Dict[str, Any]:
        """``{**generation, **alg}`` with None dropped (``run.py:102-106``)."""
        merged = {**self.generation, **self.alg}
        return {k: v for k, v in merged.items() if v is not None}

    @property
    def family(self) -> str:
        """Model-family dispatch by substring of ``model.path`` (``run.py:45-86``)."""
        if "Wan" in self.model_path:
            return "wan"
        if "CogVideoX" in self.model_path:
            return "cogvideox"
        if "HunyuanVideo" in self.model_path:
            return "hunyuan"
        raise ValueError(f"Cannot infer model family from path {self.model_path!r}")


def load_run_config(path: str) -> RunConfig:
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    model = raw.get("model", {})
    dtype_str = model.get("dtype", "bfloat16")
    return RunConfig(
        model_path=model["path"],
        model_dtype=resolve_dtype(dtype_str),
        model_dtype_str=dtype_str,
        flow_shift=model.get("flow_shift"),
        flow_reverse=model.get("flow_reverse"),
        generation=dict(raw.get("generation") or {}),
        alg=dict(raw.get("alg") or {}),
        video=dict(raw.get("video") or {}),
        raw=raw,
    )
