"""Batching + device prefetch.

The TPU-side replacement for torch DataLoader + ``accelerator.prepare``
(/root/reference/train.py:471-493): a thread assembles numpy batches while the
device computes, and ``device_prefetch`` keeps one batch in flight
(double-buffering via ``jax.device_put`` onto the mesh) so the step never
blocks on input — the reference's known input-pipeline bottleneck
(SURVEY §3.1: per-sample cv2 motion-mask work on the hot path).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, Optional

import numpy as np


def collate(items: list) -> Dict[str, Any]:
    """Stack dict items; strings become lists."""
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    """Shuffled, batched, background-threaded loader over any indexable
    dataset returning dicts."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._epoch = 0
        n = len(dataset)
        if n == 0 or (drop_last and n < batch_size):
            raise ValueError(
                f"dataset yields no batches ({n} items, batch_size={batch_size}"
                f"{', drop_last' if drop_last else ''}) — check train_data.path "
                "and dataset_types; an empty loader would loop forever making "
                "no training steps"
            )

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = self._index_order()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            batch = []
            try:
                for i in order:
                    if stop.is_set():
                        return
                    batch.append(self.dataset[int(i)])
                    if len(batch) == self.batch_size:
                        q.put(collate(batch))
                        batch = []
                if batch and not self.drop_last:
                    q.put(collate(batch))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, mesh=None, axis: str = "data", size: int = 1):
    """Wrap a host-batch iterator: device_put the NEXT batch (sharded over the
    mesh data axis) while the current one computes."""
    import jax

    from animate_anything_tpu.core.mesh import shard_batch

    def put(batch):
        arrays = {k: v for k, v in batch.items() if not isinstance(v, list)}
        rest = {k: v for k, v in batch.items() if isinstance(v, list)}
        if mesh is not None:
            arrays = shard_batch(arrays, mesh, axis)
        else:
            arrays = jax.tree_util.tree_map(jax.device_put, arrays)
        arrays.update(rest)
        return arrays

    buf = []
    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.pop(0)
    yield from buf
