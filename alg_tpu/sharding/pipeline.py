"""Pipeline parallelism (pp): GPipe over the scan-stacked DiT blocks.

The reference is strictly single-device (SURVEY §2 — no parallelism of any
kind), so, like tp/sp, this axis is TPU-native design: the weight-stacked
block scans that every DiT here already uses (one compiled block body,
stacked leaves ``[L, ...]``) shard their LAYER axis over a ``pp`` mesh axis —
each stage holds ``L/pp`` consecutive blocks — and activations flow stage to
stage over ICI via ``lax.ppermute`` in a microbatched GPipe schedule.

TPU-native choices:

* **Hybrid manual/auto partitioning.** The schedule runs under
  ``jax.shard_map(..., axis_names={"pp"})`` — manual over ``pp`` ONLY.
  The dp/sp/tp axes stay under GSPMD inside the shard_map body, so pp
  composes with the Megatron TP specs (``partition.add_pp`` simply prefixes
  ``"pp"`` to each stacked block leaf's spec) and with dp-sharded batches,
  with no hand-written tensor-parallel collectives.
* **One compiled tick.** The schedule is a ``lax.scan`` over
  ``n_micro + pp − 1`` ticks; every stage runs its local block scan each
  tick (SPMD), stage 0 feeds microbatch ``t``, stage ``pp−1`` banks output
  ``t − (pp−1)``, and carries rotate via a single ``ppermute``. Bubble
  fraction is ``(pp−1)/(n_micro+pp−1)``.
* **Differentiable.** ``ppermute``/``psum``/``where`` all have transposes, so
  ``jax.grad`` through the pipeline gives exact GPipe backward — the training
  step (``training/train.py``) enables pp by wrapping its loss in
  :func:`pipeline_blocks`; remat composes (each stage's local scan body is
  checkpointed under ``core.remat``).

Memory: each stage stores only ``L/pp`` of the block weights (and, under
training, ``1/pp`` of their AdamW moments) — the pp lever for models whose
stacked DiT does not fit one chip's HBM.

Protocol: model forwards route their block scans through :func:`run_blocks`
with ``body(carry, block_slice, ctx, consts) → carry`` where ``carry`` and
``ctx`` lead with the batch axis (both are microbatch-split; ``ctx`` is
layer-invariant conditioning like the AdaLN time embedding) and ``consts``
are batch-free tables (RoPE) that replicate. Outside a
:func:`pipeline_blocks` context this is exactly the previous
``lax.scan(maybe_checkpoint(body), ...)`` — bitwise-identical single-device
behavior.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from alg_tpu.core.remat import maybe_checkpoint

_ACTIVE: Optional["_PPContext"] = None


@dataclasses.dataclass(frozen=True)
class _PPContext:
    mesh: Any
    n_micro: Optional[int]


@contextlib.contextmanager
def pipeline_blocks(mesh, n_micro: Optional[int] = None):
    """Run every DiT block scan traced inside as a pp pipeline over ``mesh``.

    ``mesh`` must have a ``pp`` axis (``make_mesh(pp=...)``); stacked block
    params must be sharded with ``partition.add_pp`` specs. ``n_micro``
    (default: the pp degree) microbatches split the batch axis — larger
    values shrink the pipeline bubble at the cost of smaller per-stage
    matmuls. Like ``core.remat.remat_blocks``, the flag is read at TRACE
    time, so it must be active while the jitted computation is being traced.
    """
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = _PPContext(mesh, n_micro)
    try:
        yield
    finally:
        _ACTIVE = prev


def run_blocks(body, carry, blocks, ctx=(), consts=()):
    """Apply the stacked ``blocks`` to ``carry`` sequentially.

    ``body(carry, block_slice, ctx, consts) → carry``. Leaves of ``carry``
    and ``ctx`` lead with the batch axis; leaves of ``blocks`` lead with the
    layer axis; ``consts`` are batch-free. Dispatches to the GPipe pipeline
    inside a :func:`pipeline_blocks` context, otherwise to the plain
    (remat-aware) ``lax.scan``.
    """
    active = _ACTIVE
    if active is None or active.mesh.shape.get("pp", 1) == 1:

        def scan_body(c, bp):
            return body(c, bp, ctx, consts), ()

        out, _ = lax.scan(maybe_checkpoint(scan_body), carry, blocks)
        return out
    return _pp_run(body, carry, blocks, ctx, consts, active)


def _pp_run(body, carry, blocks, ctx, consts, active: _PPContext):
    mesh = active.mesh
    n_stages = mesh.shape["pp"]
    n_micro = active.n_micro or n_stages

    layers = {leaf.shape[0] for leaf in jax.tree.leaves(blocks)}
    if len(layers) != 1:
        raise ValueError(f"stacked block leaves disagree on layer count: {layers}")
    (n_layers,) = layers
    if n_layers % n_stages:
        raise ValueError(f"num_layers={n_layers} not divisible by pp={n_stages}")
    batches = {leaf.shape[0] for leaf in jax.tree.leaves((carry, ctx))}
    if len(batches) != 1:
        raise ValueError(f"carry/ctx leaves disagree on batch axis: {batches}")
    (batch,) = batches
    if batch % n_micro:
        raise ValueError(f"batch={batch} not divisible by n_micro={n_micro}")

    def gpipe(carry, blocks_local, ctx, consts):
        stage = lax.axis_index("pp")

        def split(a):
            return a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:])

        carry_mb = jax.tree.map(split, carry)
        ctx_mb = jax.tree.map(split, ctx)

        def stage_fn(c, cx):
            def scan_body(cc, bp):
                return body(cc, bp, cx, consts), ()

            c, _ = lax.scan(maybe_checkpoint(scan_body), c, blocks_local)
            return c

        state = jax.tree.map(lambda a: jnp.zeros_like(a[0]), carry_mb)
        out = jax.tree.map(jnp.zeros_like, carry_mb)
        perm = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(st, t):
            state, out = st
            # stage 0 feeds microbatch t (clamped past the end; results of
            # the overrun ticks are never banked)
            feed_idx = jnp.minimum(t, n_micro - 1)
            fed = jax.tree.map(
                lambda full, s: jnp.where(
                    stage == 0,
                    lax.dynamic_index_in_dim(full, feed_idx, 0, keepdims=False),
                    s,
                ),
                carry_mb,
                state,
            )
            # stage s is processing microbatch t - s this tick
            ctx_idx = jnp.clip(t - stage, 0, n_micro - 1)
            cx = jax.tree.map(
                lambda full: lax.dynamic_index_in_dim(full, ctx_idx, 0, keepdims=False),
                ctx_mb,
            )
            res = stage_fn(fed, cx)
            out_idx = t - (n_stages - 1)
            valid = jnp.logical_and(out_idx >= 0, stage == n_stages - 1)
            safe = jnp.clip(out_idx, 0, n_micro - 1)
            out = jax.tree.map(
                lambda o, r: jnp.where(
                    valid, lax.dynamic_update_index_in_dim(o, r, safe, 0), o
                ),
                out,
                res,
            )
            state = jax.tree.map(lambda r: lax.ppermute(r, "pp", perm), res)
            return (state, out), ()

        (_, out), _ = lax.scan(
            tick, (state, out), jnp.arange(n_micro + n_stages - 1)
        )
        # bank lives on the last stage; psum replicates it so out_specs=P()
        last = stage == n_stages - 1
        out = jax.tree.map(
            lambda a: lax.psum(jnp.where(last, a, jnp.zeros_like(a)), "pp"), out
        )
        return jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), out)

    fn = jax.shard_map(
        gpipe,
        mesh=mesh,
        axis_names={"pp"},  # dp/sp/tp stay under GSPMD (auto) inside
        in_specs=(
            jax.tree.map(lambda _: P(), carry),
            jax.tree.map(lambda _: P("pp"), blocks),
            jax.tree.map(lambda _: P(), ctx),
            jax.tree.map(lambda _: P(), consts),
        ),
        out_specs=jax.tree.map(lambda _: P(), carry),
        check_vma=False,
    )
    return fn(carry, blocks, ctx, consts)
