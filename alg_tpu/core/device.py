"""Device-queue utilities for the axon TPU tunnel.

The axon backend dispatches fully asynchronously: ``block_until_ready`` is a
no-op, execution errors surface at the next device→host fetch, and the whole
pending queue's buffers (including already-"freed" temporaries) stay resident
until drained. Consequences handled here:

  * :func:`sync` — the only true synchronization point is a host fetch;
  * :func:`streamed_stack` — stacking a 42-layer parameter list doubles
    resident memory unless the originals are freed leaf-by-leaf with drains;
  * :func:`init_streamed` — run per-block init functions with a drain after
    each so RNG fp32 temporaries free before the next block allocates.
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp

# Samplers dispatch their denoise scans in chunks of at most this many steps
# per XLA program. One 48-step scan at full CogVideoX scale executes for
# ~6 device-minutes, which the axon tunnel's worker watchdog kills
# ("TPU worker process crashed or restarted"); 8-step chunks (~1 min) stay
# comfortably inside the envelope, and the host dispatches chunks back-to-back
# without fetches, so the queue never drains and throughput is unchanged.
def _parse_scan_chunk(raw: str) -> int:
    """Parse ALG_TPU_SCAN_CHUNK defensively: malformed values fall back to 8
    (with a warning) and the result is clamped to >= 1 — a non-positive chunk
    would make every chunked sampler loop spin forever."""
    try:
        value = int(raw)
    except ValueError:
        import warnings

        warnings.warn(f"ALG_TPU_SCAN_CHUNK={raw!r} is not an integer; using 8")
        return 8
    return max(value, 1)


SCAN_CHUNK = _parse_scan_chunk(os.environ.get("ALG_TPU_SCAN_CHUNK", "8"))


def seg_chunk(length: int) -> int:
    """Uniform per-segment chunk size: the largest divisor of ``length`` that
    is <= SCAN_CHUNK (>= 1). Dividing a sampler segment into EQUAL chunks
    means every chunk lowers to the SAME XLA program — a greedy
    min(SCAN_CHUNK, remaining) split leaves a ragged tail chunk whose
    one-off program otherwise compiles mid-run (e.g. HunyuanVideo's single
    50-step segment: 6x8+2 → two programs; 10x5 → one), which both bloats
    cold-start compile time and pollutes timed bench runs."""
    for c in range(min(SCAN_CHUNK, length), 0, -1):
        if length % c == 0:
            return c
    return 1


def sync(x=None) -> None:
    """Force the device queue to drain (tiny device→host fetch)."""
    if x is None:
        np.asarray(jnp.zeros((1,)) + 0)
        return
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])


def stream_tree(tree):
    """``device_put`` a host (numpy-leaf) pytree with bounded in-flight bytes.

    Transfers drain every ~1 GiB so the axon tunnel queue never holds more
    than one spill's worth of weight data; peak HBM == the final tree size
    (the host leaves are the only other copy). Non-array leaves pass through.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    pending_bytes = 0
    last_dev = None
    for leaf in leaves:
        if not isinstance(leaf, np.ndarray):
            out.append(leaf)
            continue
        dev = jax.device_put(leaf)
        out.append(dev)
        last_dev = dev
        pending_bytes += dev.size * dev.dtype.itemsize
        if pending_bytes > (1 << 30):
            sync(dev)
            pending_bytes = 0
    if last_dev is not None:
        sync(last_dev)
    return jax.tree_util.tree_unflatten(treedef, out)


def init_streamed(init_fns: Sequence[Callable[[], dict]]) -> List[dict]:
    """Run block-init thunks one at a time, draining the queue after each."""
    out = []
    for fn in init_fns:
        b = fn()
        sync(b)
        out.append(b)
    return out


def host_init_params(init_fn, seed: int = 0, scale: float = 0.02):
    """Random-init a parameter tree HOST-side and stream it to the device.

    ``jax.eval_shape(init_fn)`` provides the leaf shapes/dtypes; leaves are
    generated with numpy and ``device_put`` one at a time, so the device never
    holds RNG temporaries or stacking copies — resident peak == final weight
    size. Naive on-device init (whole leaves at once) exceeds the axon memory
    ceiling — a stacked 42-layer ffn leaf's fp32 RNG temp is ~6 GB next to the
    ~10 GB resident tree; :func:`device_init_params` is the bounded-memory
    on-device alternative (no multi-GB tunnel streaming). Real checkpoints
    take the host→device route through the safetensors loader.
    """
    import ml_dtypes

    shapes = jax.eval_shape(init_fn)
    rng = np.random.default_rng(seed)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    out = []
    pending_bytes = 0
    for leaf in leaves:
        arr = rng.standard_normal(leaf.shape, dtype=np.float32) * scale
        if leaf.dtype == jnp.bfloat16:
            arr = arr.astype(ml_dtypes.bfloat16)
        else:
            arr = arr.astype(leaf.dtype)
        dev = jax.device_put(arr)
        del arr
        out.append(dev)
        pending_bytes += dev.size * dev.dtype.itemsize
        if pending_bytes > (1 << 30):  # drain every ~1 GiB of queued transfers
            sync(dev)
            pending_bytes = 0
    sync(out[-1])
    return jax.tree_util.tree_unflatten(treedef, out)


import functools


@functools.partial(jax.jit, static_argnames=("shape", "dtype", "scale"))
def _gen_normal(key, shape, dtype, scale):
    return jax.random.normal(key, shape, dtype=dtype) * jnp.asarray(scale, dtype)


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("scale",))
def _fill_row(buf, key, i, scale):
    row = jax.random.normal(key, buf.shape[1:], dtype=buf.dtype)
    row = row * jnp.asarray(scale, buf.dtype)
    return jax.lax.dynamic_update_slice_in_dim(buf, row[None], i, axis=0)


def gen_leaf_on_device(leaf, key, scale: float = 0.02, max_slice_bytes: int = 256 << 20):
    """Generate ONE N(0, scale²) array of ``leaf``'s shape/dtype on-device.

    Leaves larger than ``max_slice_bytes`` are filled slice-by-slice along
    axis 0 into a DONATED buffer, so the live temp is one slice + its RNG
    bits rather than a whole-leaf fp32 working set (which, next to a ~10 GB
    resident tree, exceeds the axon memory ceiling)."""
    nbytes = int(np.prod(leaf.shape, dtype=np.int64)) * jnp.dtype(leaf.dtype).itemsize
    if leaf.ndim >= 2 and leaf.shape[0] > 1 and nbytes > max_slice_bytes:
        buf = jnp.zeros(leaf.shape, leaf.dtype)
        row_bytes = max(nbytes // leaf.shape[0], 1)
        drain_every = max((1 << 30) // row_bytes, 1)
        for i in range(leaf.shape[0]):
            buf = _fill_row(buf, jax.random.fold_in(key, i), i, scale)
            if (i + 1) % drain_every == 0:
                sync(buf)  # bound the axon queue's live buffers
        return buf
    return _gen_normal(key, tuple(leaf.shape), jnp.dtype(leaf.dtype), scale)


def device_init_params(
    init_fn, seed: int = 0, scale: float = 0.02, max_slice_bytes: int = 256 << 20
):
    """Random-init a parameter tree ON the device with bounded temp memory.

    The benchmark alternative to :func:`host_init_params`: generating a 5B/14B
    random tree host-side and streaming it through the axon tunnel costs
    ~10 GB of transfers (~11 min of the driver's cold bench budget, measured
    docs/PERF.md r4); generating on-device costs seconds. Memory discipline is
    :func:`gen_leaf_on_device`'s slice-wise donated fills — peak HBM == final
    tree + one slice + its RNG bits. Each leaf/slice is generated directly in
    its final dtype (bf16 ``jax.random.normal`` — same N(0, scale²) family as
    host init; bit-values differ, FLOP graph and memory profile of the
    consuming model are identical).
    """
    shapes = jax.eval_shape(init_fn)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    key = jax.random.PRNGKey(seed)
    out = []
    pending_bytes = 0
    for idx, leaf in enumerate(leaves):
        dev = gen_leaf_on_device(leaf, jax.random.fold_in(key, idx), scale, max_slice_bytes)
        out.append(dev)
        pending_bytes += int(np.prod(leaf.shape, dtype=np.int64)) * jnp.dtype(leaf.dtype).itemsize
        if pending_bytes > (1 << 30):
            sync(dev)
            pending_bytes = 0
    sync(out[-1])
    return jax.tree_util.tree_unflatten(treedef, out)


def streamed_stack(blocks: List[dict]):
    """``jax.tree.map(stack, *blocks)`` with bounded memory: stack one leaf
    across all blocks, drain, then free the originals before the next leaf.

    CONSUMES ``blocks`` (the list is emptied) so the per-layer arrays can
    actually be released while stacking."""
    treedef = jax.tree_util.tree_structure(blocks[0])
    flat = [jax.tree_util.tree_leaves(b) for b in blocks]
    n_blocks = len(flat)
    blocks.clear()  # drop the dict references; `flat` holds the only handles
    n_leaves = len(flat[0])
    stacked = []
    for li in range(n_leaves):
        s = jnp.stack([flat[b][li] for b in range(n_blocks)])
        sync(s)
        for b in range(n_blocks):
            flat[b][li] = None  # free the original
        stacked.append(s)
    return jax.tree_util.tree_unflatten(treedef, stacked)


def enable_compilation_cache(default_dir: str = "~/.cache/alg_tpu/xla_cache") -> str:
    """Turn on JAX's persistent compilation cache for the CLIs.

    First compiles of the full-scale samplers cost 20-40 s each; the cache
    makes every later invocation of the same config start hot. Honors an
    explicit ``JAX_COMPILATION_CACHE_DIR``; otherwise uses ``default_dir``.
    Returns the directory used."""
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(default_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast-compiling programs (the tunnel round-trip, not local
    # compile time, dominates cold starts) — but defer to an explicit env
    # override, like the dir
    if "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS" not in os.environ:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
