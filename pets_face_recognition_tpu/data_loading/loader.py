"""Host-side batching data loader with background prefetch.

Replaces torch ``DataLoader`` usage in the reference configs
(``/root/reference/configs/cat_fe/cat_fe_head.py:119-143``). TPU-first differences:

- batches are **fixed-shape stacked numpy arrays** (detection uses padded batches via
  the collate fns in ``utils/collate.py`` — never torchvision-style lists of
  variable-size tensors);
- ``drop_last`` defaults True for training so every step has a mesh-divisible batch;
- a thread pool maps ``dataset[i]`` (PIL decode + augment) and a one-batch-deep
  prefetch thread overlaps host IO with device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator

import numpy as np


def default_collate(samples: list) -> dict:
    """Stack dict-of-array samples into a dict of batched arrays."""
    if isinstance(samples[0], dict):
        return {
            k: np.stack([np.asarray(s[k]) for s in samples]) for k in samples[0]
        }
    if isinstance(samples[0], (tuple, list)):
        return tuple(
            default_collate([s[i] for s in samples]) for i in range(len(samples[0]))
        )
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    """Map-style dataset → iterator of collated batches.

    Deterministic given ``seed``: epoch ``e`` shuffles with ``RandomState(seed + e)``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool | None = None,
        collate_fn: Callable = default_collate,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last if drop_last is not None else shuffle
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self) -> list[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self._epoch).shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        self._epoch += 1
        if self.num_workers <= 0:
            for idx in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in idx])
            return
        yield from self._prefetch_iter(batches)

    def _prefetch_iter(self, batches):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in batches:
                        samples = list(
                            pool.map(self.dataset.__getitem__, [int(i) for i in idx])
                        )
                        q.put(self.collate_fn(samples))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
                return
            q.put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        thread.join()
