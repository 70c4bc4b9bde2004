"""Partition specs (Megatron-style TP + DP) for the model param trees.

Weight-stacked scan blocks have a leading layer axis, so a 2D kernel spec
``P(None, "tp")`` becomes ``P(None, None, "tp")`` on the stacked leaf.
Column-parallel: qkv projections and MLP fc_in (output dim sharded).
Row-parallel: attention out-proj and MLP fc_out (input dim sharded; XLA
inserts the all-reduce). Norms, modulation linears, embeddings: replicated —
they are tiny next to the attention/MLP weights.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def cogvideox_transformer_specs(params) -> dict:
    """PartitionSpec pytree matching ``init_cogvideox_transformer`` output."""

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    blocks = params["blocks"]
    block_specs = rep(blocks)
    block_specs["attn"]["to_q"] = {"kernel": P(None, None, "tp"), "bias": P(None, "tp")}
    block_specs["attn"]["to_k"] = {"kernel": P(None, None, "tp"), "bias": P(None, "tp")}
    block_specs["attn"]["to_v"] = {"kernel": P(None, None, "tp"), "bias": P(None, "tp")}
    block_specs["attn"]["to_out"] = {"kernel": P(None, "tp", None), "bias": P()}
    block_specs["ff"]["fc_in"] = {"kernel": P(None, None, "tp"), "bias": P(None, "tp")}
    block_specs["ff"]["fc_out"] = {"kernel": P(None, "tp", None), "bias": P()}

    specs = rep({k: v for k, v in params.items() if k != "blocks"})
    specs["blocks"] = block_specs
    return specs


def shard_params(params, specs, mesh):
    """Place a param tree on the mesh according to its spec tree."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
