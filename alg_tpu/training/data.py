"""Training input pipeline: latent-batch dataset + host-side prefetch.

The standard video fine-tune recipe trains over precomputed latents (frozen
VAE/text encoders), so an example is one ``.npz`` of small tensors and the
input pipeline is host CPU + PCIe work: read, stack, ``device_put``. On the
axon/TPU backend the device queue is deep and fully async — the one thing
that can stall the accelerator is the HOST being late with the next batch.

:func:`prefetch` therefore overlaps the whole host side with device compute:
a daemon thread pulls batches from the (shuffled-epoch) iterator, stacks and
``device_put``s them — sharded placement when a mesh is armed, so the
host→HBM DMA for batch ``i+1``..``i+depth`` streams while step ``i``
computes — and hands device arrays over a small bounded queue. Exceptions in
the worker propagate to the consumer; the queue depth bounds host memory.

Memory-mapped reads (``np.load(mmap_mode="r")``) keep the resident set at
O(batch) even for datasets far larger than RAM.
"""

from __future__ import annotations

import glob
import os
import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


class LatentDataset:
    """Directory of per-example ``.npz`` files with the loss's batch keys
    (``alg_tpu/training/losses.py``; file list sorted for determinism)."""

    def __init__(self, data_dir: str, mmap: bool = True):
        self.files = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
        if not self.files:
            raise FileNotFoundError(f"no .npz examples under {data_dir}")
        self.mmap = mmap
        with np.load(self.files[0]) as z:
            self.keys = sorted(z.files)

    def __len__(self) -> int:
        return len(self.files)

    def example(self, i: int) -> dict:
        # zipped npz cannot mmap; np.load transparently falls back
        with np.load(self.files[i], mmap_mode="r" if self.mmap else None) as z:
            if sorted(z.files) != self.keys:
                raise ValueError(
                    f"{self.files[i]}: keys {sorted(z.files)} != {self.keys}"
                )
            return {k: np.asarray(z[k]) for k in z.files}

    def batches(
        self, batch_size: int, steps: int, seed: int, start: int = 0
    ) -> Iterator[dict]:
        """``steps`` host batches: shuffled epochs, stacked leading axis.
        ``start`` skips batches without reading files, so a resumed run
        (training/checkpoint.py) sees the exact same data order."""
        rng = np.random.RandomState(seed)
        order: list = []
        for step in range(steps):
            while len(order) < batch_size:
                epoch = list(range(len(self.files)))
                rng.shuffle(epoch)
                order.extend(epoch)
            idx, order = order[:batch_size], order[batch_size:]
            if step < start:
                continue
            examples = [self.example(i) for i in idx]
            yield {k: np.stack([ex[k] for ex in examples]) for k in self.keys}


class _Stop:
    pass


def prefetch(
    batch_iter: Iterator[dict],
    depth: int = 2,
    mesh=None,
) -> Iterator[dict]:
    """Background-thread prefetch: host batches → device arrays, ``depth``
    ahead of the consumer. With ``mesh``, leaves are placed dp-sharded
    (:func:`alg_tpu.training.shard_batch` layout); otherwise default device.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("dp")) if mesh is not None else None
    q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))

    def put(batch):
        if sharding is not None:
            return {k: jax.device_put(v, sharding) for k, v in batch.items()}
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def worker():
        try:
            for batch in batch_iter:
                q.put(put(batch))
            q.put(_Stop)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True, name="alg-tpu-prefetch")
    t.start()
    while True:
        item = q.get()
        if item is _Stop:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
