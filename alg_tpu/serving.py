"""Batched multi-prompt serving (BASELINE config #5).

The reference is strictly single-prompt, single-device (SURVEY §2/§5). This
module adds the TPU-native serving surface: N prompts batched through one
jit-compiled denoise loop, with the DiT optionally sharded over an ICI mesh
(DP over prompts × TP over heads/MLP — see :mod:`alg_tpu.sharding`).

On multi-chip meshes the XLA attention path is used (a Pallas custom call is
not partitionable by GSPMD; a shard_map'd kernel is tracked for a later
round). Single-chip serving keeps the Pallas kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from alg_tpu.core.rng import NoiseSource


@dataclasses.dataclass
class BatchRequest:
    prompt: str
    image: Any  # PIL image / preprocessed array
    negative_prompt: Optional[str] = None
    seed: int = 42


def serve_batch(
    pipeline,
    requests: Sequence[BatchRequest],
    mesh: Optional[Mesh] = None,
    **gen_kwargs,
) -> List[Any]:
    """Run a batch of I2V requests through one pipeline invocation.

    Per-request seeds drive per-sample noise (torch-order within each sample);
    prompts are encoded as a batch. With a ``mesh``, the pipeline's params are
    expected to be pre-sharded (see ``shard_pipeline``) and the batch is laid
    out along the ``dp`` axis.
    """
    from alg_tpu.pipelines import processing

    n = len(requests)
    prompts = [r.prompt for r in requests]
    negatives = [r.negative_prompt or "" for r in requests]

    height = gen_kwargs.get("height") or 480
    width = gen_kwargs.get("width") or 720
    images = np.concatenate(
        [
            processing.preprocess_image(r.image, height, width)
            if not isinstance(r.image, np.ndarray)
            else np.asarray(r.image, np.float32)
            for r in requests
        ],
        axis=0,
    )

    embeds = pipeline.encode_prompt(prompts)
    neg_embeds = pipeline.encode_prompt(negatives)

    # per-request noise: each sample gets its own torch-order stream
    sources = [NoiseSource(seed=r.seed) for r in requests]

    class _BatchNoise:
        """Draws per-sample from independent streams, stacking along batch."""

        def randn(self, shape, dtype=np.float32):
            if shape[0] == n:
                return np.stack(
                    [s.randn(shape[1:], dtype=dtype) for s in sources]
                )
            # shared draws (e.g. broadcast conditions) come from request 0
            return sources[0].randn(shape, dtype=dtype)

    out = pipeline(
        image=images,
        prompt_embeds=embeds,
        negative_prompt_embeds=neg_embeds,
        noise_source=_BatchNoise(),
        **gen_kwargs,
    )
    return out


def shard_pipeline(pipeline, mesh: Mesh):
    """Place a CogVideoX pipeline's DiT on the mesh (TP) and return a copy.

    Data (latents/conditions) shards along ``dp`` automatically once inputs
    are placed; XLA GSPMD inserts the TP collectives from the weight layout.
    """
    import dataclasses as _dc

    from alg_tpu.ops.attention import set_attention_impl
    from alg_tpu.sharding import cogvideox_transformer_specs

    specs = cogvideox_transformer_specs(pipeline.transformer_params)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        pipeline.transformer_params,
        specs,
    )
    if mesh.devices.size > 1:
        set_attention_impl("xla")
    return _dc.replace(pipeline, transformer_params=sharded)
