"""Multiprocess batch loading.

Equivalent of the reference's DataLoader(num_workers=N) over its
IterableDataset (train.py:122-137): N worker processes each run a
disjoint worker-shard of the host pipeline (wav IO, resample,
augmentation, batching) and push finished batches through a queue.
Workers use the 'spawn' context so they never inherit live TPU runtime
state.  ``num_workers=0`` degrades to the in-process thread prefetcher.
"""

import multiprocessing as mp
from typing import Iterator

from wekws_tpu.data.prefetch import Prefetcher


def _worker_main(dataset, worker_id, num_workers, epoch, queue):
    try:
        dataset.data_list.set_worker(worker_id, num_workers)
        dataset.set_epoch(epoch)
        for batch in dataset:
            queue.put(batch)
    finally:
        queue.put(None)


class DataLoader:
    """Iterate a Dataset with worker-process parallelism.

    Batches from different workers interleave in arrival order; the
    per-worker shard split reproduces the reference's two-level
    rank/worker slicing, so the union over workers is exactly the rank
    shard."""

    def __init__(self, dataset, num_workers: int = 0, prefetch: int = 8):
        self.dataset = dataset
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        self.dataset.set_epoch(epoch)

    def __iter__(self) -> Iterator:
        if self.num_workers <= 0:
            yield from Prefetcher(self.dataset, self.prefetch)
            return
        ctx = mp.get_context("spawn")
        queue = ctx.Queue(maxsize=max(self.prefetch, self.num_workers))
        procs = []
        for w in range(self.num_workers):
            p = ctx.Process(
                target=_worker_main,
                args=(self.dataset, w, self.num_workers, self._epoch, queue),
                daemon=True,
            )
            p.start()
            procs.append(p)
        finished = 0
        try:
            while finished < self.num_workers:
                item = queue.get()
                if item is None:
                    finished += 1
                else:
                    yield item
        finally:
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()
