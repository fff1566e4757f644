"""Host data pipeline: dict collation and threaded prefetching.

Replaces the reference's torch DataLoader + collate_func_dict_fix
(reference utils.py:200-224, job_runner.py:636-639; NUM_WORKERS=0 there —
fully serial). Here samples are loaded and transformed by a thread pool
while the TPU computes, and batches are stacked into NumPy arrays ready
for a single H2D transfer.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def merge_dict(list_dict):
    return {k: tuple(d[k] for d in list_dict) for k in list_dict[0].keys()}


def collate_dict(batch):
    """Reference collate semantics: stack array values of `#` keys, tuple-merge
    nested meta dicts, list everything else."""
    merged = {}
    for k in batch[0].keys():
        if isinstance(batch[0][k], dict):
            merged[k] = merge_dict([b[k] for b in batch])
        elif isinstance(batch[0][k], np.ndarray):
            merged[k] = np.stack([b[k] for b in batch], axis=0)
        else:
            merged[k] = [b[k] for b in batch]
    return merged


class DataLoader:
    """Map-style dataset + sampler -> prefetched collated batches.

    num_workers=0 loads synchronously (reference default); otherwise a
    thread pool keeps `prefetch` batches in flight.
    """

    def __init__(self, dataset, sampler, batch_size, drop_last=True,
                 num_workers=4, prefetch=2, collate_fn=collate_dict,
                 row_range=None):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.collate_fn = collate_fn
        # per-process sampler sharding (core/mesh.py local_batch_rows):
        # only rows [lo, hi) of each GLOBAL index batch are loaded by this
        # process — the sampler sequence stays identical across processes
        # (identically seeded), so together the processes cover exactly
        # the global batch while each reads only its share
        self.row_range = row_range

    def __len__(self):
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def _index_batches(self):
        idx = list(iter(self.sampler))
        for i in range(0, len(idx), self.batch_size):
            b = idx[i:i + self.batch_size]
            if len(b) < self.batch_size and self.drop_last:
                return
            if self.row_range is not None:
                lo, hi = self.row_range
                b = b[lo:hi]
            yield b

    def __iter__(self):
        if self.num_workers <= 0:
            for b in self._index_batches():
                yield self.collate_fn([self.dataset[i] for i in b])
            return

        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    pending = []
                    for b in self._index_batches():
                        pending.append(pool.submit(
                            lambda idxs: self.collate_fn(
                                [self.dataset[i] for i in idxs]), b))
                        while len(pending) >= self.prefetch:
                            q.put(pending.pop(0).result())
                    for f in pending:
                        q.put(f.result())
            except Exception as e:  # surface loader errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
