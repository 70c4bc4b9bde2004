"""Batched multi-prompt serving (BASELINE config #5) — all three backbones.

The reference is strictly single-prompt, single-device (SURVEY §2/§5). This
module adds the TPU-native serving surface: N prompts batched through one
jit-compiled denoise loop, with the DiT optionally sharded over an ICI mesh
(DP over prompts × TP over heads/MLP — see :mod:`alg_tpu.sharding`).

Multi-chip attention stays fused: ``shard_pipeline`` arms the pipeline with
an attention mesh, and the sampler routes every attention call through a
``shard_map`` whose shards run the Pallas kernel locally (heads/batch are
embarrassingly parallel — see :mod:`alg_tpu.ops.attention`). On CPU meshes
(virtual-device tests) the shards run the XLA reference instead.

Per-family differences are isolated in ``_ENCODERS``:
  * CogVideoX — T5 text only (reference ``...cogvideox...py:271-350``);
  * Wan — UMT5 text + CLIP-vision per-request image embeds (``...wan...py:
    237-316``);
  * Hunyuan — Llava(image, prompt) + CLIP pooled, per request since the
    template crops depend on each request's image (``...hunyuan...py:454-492``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding

from alg_tpu.core.rng import NoiseSource


@dataclasses.dataclass
class BatchRequest:
    prompt: str
    image: Any  # PIL image / preprocessed array
    negative_prompt: Optional[str] = None
    seed: int = 42
    # FLF2V (Wan only): condition the LAST frame too (reference
    # ``...wan...py:403-412``). All requests in a batch must agree on
    # presence (the 20-ch mask/condition layout differs).
    last_image: Any = None


def _preprocess_images(requests, height, width, attr: str = "image") -> np.ndarray:
    from alg_tpu.pipelines import processing

    return np.concatenate(
        [
            processing.preprocess_image(img, height, width)
            if not isinstance(img, np.ndarray)
            else np.asarray(img, np.float32)
            for img in (getattr(r, attr) for r in requests)
        ],
        axis=0,
    )


def _encode_cogvideox(pipeline, requests, gen_kwargs):
    prompts = [r.prompt for r in requests]
    negatives = [r.negative_prompt or "" for r in requests]
    return {
        "prompt_embeds": pipeline.encode_prompt(prompts),
        "negative_prompt_embeds": pipeline.encode_prompt(negatives),
    }


def _encode_wan(pipeline, requests, gen_kwargs):
    prompts = [r.prompt for r in requests]
    negatives = [r.negative_prompt or "" for r in requests]
    out = {
        "prompt_embeds": pipeline.encode_prompt(prompts),
        "negative_prompt_embeds": pipeline.encode_prompt(negatives),
    }
    if pipeline.clip_params is not None:
        out["image_embeds"] = jnp.concatenate(
            [pipeline.encode_image(r.image) for r in requests], axis=0
        )
    return out


def _encode_hunyuan(pipeline, requests, gen_kwargs):
    # Llava prompt embeds depend on each request's image (the template embeds
    # 576 image tokens); encode per request and batch the crops. Encoding
    # honors the config's template/length kwargs (they are legal pipeline
    # kwargs — reference ``__call__`` surface) rather than pinning defaults.
    enc_kwargs = {}
    if gen_kwargs.get("prompt_template") is not None:
        enc_kwargs["template"] = gen_kwargs["prompt_template"]
    if gen_kwargs.get("max_sequence_length") is not None:
        enc_kwargs["max_sequence_length"] = gen_kwargs["max_sequence_length"]
    if gen_kwargs.get("image_embed_interleave") is not None:
        enc_kwargs["image_embed_interleave"] = gen_kwargs["image_embed_interleave"]
    embeds, pooled, masks = [], [], []
    for r in requests:
        e, p, m = pipeline.encode_prompt(r.image, r.prompt, **enc_kwargs)
        embeds.append(e)
        pooled.append(p)
        masks.append(m)
    out = {
        "prompt_embeds": jnp.concatenate(embeds, axis=0),
        "pooled_prompt_embeds": jnp.concatenate(pooled, axis=0),
        "prompt_attention_mask": jnp.concatenate(masks, axis=0),
    }
    if gen_kwargs.get("true_cfg_scale", 1.0) > 1.0:
        from PIL import Image as PILImage

        height = gen_kwargs.get("height", 720)
        width = gen_kwargs.get("width", 1280)
        black = PILImage.new("RGB", (width, height), 0)
        n_embeds, n_pooled, n_masks = [], [], []
        for r in requests:
            e, p, m = pipeline.encode_prompt(black, r.negative_prompt or "", **enc_kwargs)
            n_embeds.append(e)
            n_pooled.append(p)
            n_masks.append(m)
        out["negative_prompt_embeds"] = jnp.concatenate(n_embeds, axis=0)
        out["negative_pooled_prompt_embeds"] = jnp.concatenate(n_pooled, axis=0)
        out["negative_prompt_attention_mask"] = jnp.concatenate(n_masks, axis=0)
    return out


_ENCODERS = {
    "CogVideoXPipeline": _encode_cogvideox,
    "WanPipeline": _encode_wan,
    "HunyuanVideoPipeline": _encode_hunyuan,
}

_DEFAULT_HW = {
    "CogVideoXPipeline": (480, 720),
    "WanPipeline": (480, 832),
    "HunyuanVideoPipeline": (720, 1280),
}


def serve_batch(
    pipeline,
    requests: Sequence[BatchRequest],
    mesh: Optional[Mesh] = None,
    sp_mode: Optional[str] = None,
    **gen_kwargs,
) -> List[Any]:
    """Run a batch of I2V requests through one pipeline invocation.

    Per-request seeds drive per-sample noise (torch-order within each sample);
    prompts are encoded as a batch. Passing a ``mesh`` arms the pipeline via
    :func:`shard_pipeline` (no-op if it is already armed with that mesh and
    ``sp_mode``); the batch then lays out along the ``dp`` axis and the DiT
    runs TP/SP-sharded. ``sp_mode`` ("gather" | "ring" | "ulysses", see
    shard_pipeline) defaults to None = KEEP the pipeline's current mode — a
    ring/ulysses-armed pipeline is never silently downgraded back to
    all-gathered KV.
    """
    family = type(pipeline).__name__
    if family not in _ENCODERS:
        raise ValueError(f"Unsupported pipeline type for serving: {family}")
    if mesh is not None:
        want_mode = pipeline.sp_mode if sp_mode is None else sp_mode
        if pipeline.attn_mesh is not mesh or pipeline.sp_mode != want_mode:
            pipeline = shard_pipeline(pipeline, mesh, sp_mode=want_mode)

    n = len(requests)
    def_h, def_w = _DEFAULT_HW[family]
    height = gen_kwargs.get("height") or def_h
    width = gen_kwargs.get("width") or def_w
    images = _preprocess_images(requests, height, width)

    n_last = sum(r.last_image is not None for r in requests)
    if n_last:
        if family != "WanPipeline":
            raise ValueError("last_image (FLF2V) is only supported by the Wan pipeline")
        if n_last != n:
            raise ValueError(
                "last_image must be set on ALL requests in a batch or on none "
                "(the mask/condition layout differs)"
            )
        gen_kwargs["last_image"] = _preprocess_images(requests, height, width, attr="last_image")

    encoded = _ENCODERS[family](pipeline, requests, gen_kwargs)

    # per-request noise: each sample gets its own torch-order stream
    sources = [NoiseSource(seed=r.seed) for r in requests]

    class _BatchNoise:
        """Draws per-sample from independent streams, stacking along batch."""

        def randn(self, shape, dtype=np.float32):
            if shape[0] != n:
                # every pipeline draw is batch-leading today; a silent
                # fallback to one stream would miscorrelate samples
                raise ValueError(
                    f"batched serving expected a batch-leading draw of {n}, "
                    f"got shape {shape}"
                )
            return np.stack([s.randn(shape[1:], dtype=dtype) for s in sources])

    out = pipeline(
        image=images,
        noise_source=_BatchNoise(),
        **encoded,
        **gen_kwargs,
    )
    return out


def shard_pipeline(pipeline, mesh: Mesh, sp_mode: str = "gather"):
    """Place a pipeline's DiT on the mesh (dp×sp×tp) and return a copy.

    Works for all three backbones — the partition specs are selected by
    pipeline type. Data (latents/conditions) shards along ``dp`` automatically
    once inputs are placed; XLA GSPMD inserts the TP collectives from the
    weight layout; attention inside the sampler runs through a shard_map'd
    fused kernel (``attn_mesh``). A mesh with a non-unit ``sp`` axis
    additionally shards the DiT query tokens in attention (long-context
    relief); the joint sequence length must be divisible by ``sp``.
    ``sp_mode`` picks the KV strategy under sp: ``"gather"`` (all-gathered
    KV), ``"ring"`` (ring attention — KV chunks rotate via ppermute,
    O(S/sp) peak KV memory per chip), or ``"ulysses"`` (all-to-all trades
    the sequence shard for a head shard — one full-sequence kernel call per
    rank; needs heads/tp divisible by sp, degrades to gather otherwise).
    """
    import dataclasses as _dc

    from alg_tpu.sharding import (
        cogvideox_transformer_specs,
        hunyuan_transformer_specs,
        wan_transformer_specs,
    )

    specs_fn = {
        "CogVideoXPipeline": cogvideox_transformer_specs,
        "WanPipeline": wan_transformer_specs,
        "HunyuanVideoPipeline": hunyuan_transformer_specs,
    }[type(pipeline).__name__]

    specs = specs_fn(pipeline.transformer_params)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        pipeline.transformer_params,
        specs,
    )
    return _dc.replace(pipeline, transformer_params=sharded, attn_mesh=mesh, sp_mode=sp_mode)
