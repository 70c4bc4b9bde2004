"""Multi-host serving: scale the batch past one host/slice over DCN.

The reference has no distributed backend at all (SURVEY §5 — its only
accelerator hooks are ``xm.mark_step()`` and CUDA device selection). The
TPU-native scaling story has two tiers:

  * **within a slice (ICI)**: ``make_mesh(dp, sp, tp)`` + GSPMD — tensor/
    sequence parallelism with collectives on the 400+ GB/s ICI links
    (:mod:`alg_tpu.sharding.mesh`, :mod:`alg_tpu.sharding.partition`);
  * **across hosts/slices (DCN)**: THIS module. Serving requests are
    independent, so the right cross-host layout is *no communication at
    all*: each process serves a contiguous slice of the request list on its
    own local-device mesh. DCN carries zero intra-step traffic — which is
    exactly what its ~25 GB/s (vs ICI's ~400) is good for. A global
    DCN-spanning ``Mesh`` would add cross-slice latency to every collective
    for nothing; the 5–14B DiTs here always fit one slice (a v5e-8 holds
    Wan-14B bf16 with room), so TP/SP never need to leave ICI.

Process bring-up is standard ``jax.distributed``: on TPU pods
``initialize()`` auto-detects everything from the runtime; for CPU tests and
manual clusters pass coordinator/num_processes/process_id explicitly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Bring up ``jax.distributed`` and return ``(process_id, process_count)``.

    With no arguments, relies on auto-detection (TPU pod runtime or the
    ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` env
    vars). Safe to call when already initialized (returns the current ids).
    """
    import jax

    # NOTE: must run before ANY backend-initializing jax call (jax.devices()
    # etc.) — so no process_count() probe here; "already initialized" is the
    # one benign failure.
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index(), jax.process_count()


def local_request_slice(n_requests: int, process_id: Optional[int] = None,
                        process_count: Optional[int] = None) -> slice:
    """The contiguous block of the global request list this process serves.

    Contiguous (not strided) so a per-process ``dp`` axis still lays out
    naturally and output indices stay human-readable. Remainders go to the
    leading processes (block sizes differ by at most 1).
    """
    import jax

    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_requests, pcount)
    start = pid * base + min(pid, rem)
    stop = start + base + (1 if pid < rem else 0)
    return slice(start, stop)


def local_mesh(dp: int = 1, sp: int = 1, tp: Optional[int] = None):
    """A ``(dp, sp, tp)`` mesh over THIS process's local devices only.

    The multi-host analog of :func:`alg_tpu.sharding.make_mesh` (which spans
    all global devices): sharded serving collectives stay on local ICI.
    """
    import jax

    from alg_tpu.sharding.mesh import make_mesh

    return make_mesh(dp=dp, sp=sp, tp=tp, devices=jax.local_devices())


def serve_batch_multihost(
    pipeline,
    requests: Sequence,
    mesh=None,
    **gen_kwargs,
):
    """Serve a GLOBAL request list across all processes; every process passes
    the same list and receives ``(videos, indices)`` for its own slice.

    ``mesh`` must be a local mesh (:func:`local_mesh`) or ``None``
    (single local device). Each process's outputs are bitwise-identical to a
    single-host :func:`alg_tpu.serving.serve_batch` of the same requests —
    per-request seeds make results placement-independent.
    """
    from alg_tpu.serving import serve_batch

    sl = local_request_slice(len(requests))
    local = list(requests[sl])
    if not local:
        return [], []
    videos = serve_batch(pipeline, local, mesh=mesh, **gen_kwargs)
    return videos, list(range(sl.start, sl.stop))
