"""Tracing / profiling utilities (SURVEY §5: the reference has only a tqdm
progress bar; the TPU build supplies jax.profiler traces + fetch-bracketed
step timing).

On the axon tunnel ``block_until_ready`` is a no-op (see
``alg_tpu/core/device.py``), so :class:`StepTimer` brackets with tiny
device→host fetches and reports the standalone fetch latency separately.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from typing import Dict, List, Optional

import numpy as np
import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """``jax.profiler`` trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock section timer with true device synchronization.

    Usage::

        timer = StepTimer()
        with timer.section("encode"):
            z = encode(...)
            timer.sync(z)          # force the async queue to drain
        print(timer.report())
    """

    def __init__(self):
        self.sections: Dict[str, List[float]] = {}
        self._fetch_latency: Optional[float] = None

    def sync(self, x=None) -> None:
        if x is None:
            np.asarray(jax.numpy.zeros((1,)) + 0)
        else:
            leaf = jax.tree_util.tree_leaves(x)[0]
            np.asarray(leaf.ravel()[:1])

    def measure_fetch_latency(self, x) -> float:
        """Fetch an already-materialized array to measure pure tunnel latency."""
        self.sync(x)
        t0 = time.perf_counter()
        self.sync(x)
        self._fetch_latency = time.perf_counter() - t0
        return self._fetch_latency

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        yield
        self.sections.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        rows = {
            name: {
                "count": len(ts),
                "total_s": round(sum(ts), 4),
                "mean_s": round(sum(ts) / len(ts), 4),
            }
            for name, ts in self.sections.items()
        }
        if self._fetch_latency is not None:
            rows["_fetch_latency_s"] = round(self._fetch_latency, 4)
        return json.dumps(rows)
