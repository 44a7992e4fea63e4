"""Prefetching batch loader.

Replaces the reference's torch InfiniteDataLoader/_RepeatSampler stack
(mixed_datasets.py:91-152) with a thread-pool pipeline tuned for a jitted
device step: worker threads run the (numpy/cv2, GIL-releasing) augmentation,
batches are assembled into fixed-shape arrays, and an optional `stage`
callback (e.g. device_put with a mesh sharding) runs one batch ahead so the
accelerator never waits on the host (double buffering).

Distributed input: pass rank/world_size to read a strided shard of each
epoch's permutation — equivalent to the reference's DistributedSampler
(train.py:223-226) without the process machinery.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import cv2
import numpy as np


def available_cores() -> int:
    try:
        return len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        return os.cpu_count() or 1

from desenet_tpu.data.dataset import MixedDataset, collate, collate_quad

# our own thread pool provides the parallelism; cv2's internal threading on
# top of it oversubscribes cores (the reference hits the same clash,
# general.py:40 cv2.setNumThreads(0))
cv2.setNumThreads(0)


class DataLoader:
    def __init__(
        self,
        dataset: MixedDataset,
        batch_size: int,
        shuffle: bool = False,
        workers: int = 4,
        max_targets: int = 128,
        rank: int = 0,
        world_size: int = 1,
        drop_last: bool = False,
        stage: Optional[Callable] = None,
        prefetch: int = 2,
        seed: int = 0,
        quad: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle and not dataset.rect
        self.workers = max(1, workers)
        self.max_targets = max_targets
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.stage = stage
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.epoch = 0
        # quad collate (reference --quad / collate_fn4): groups of 4 samples
        # become one 2x-size image; output batch is (batch_size//4, 2s, 2s)
        self.quad = quad
        if quad:
            assert batch_size % 4 == 0, "--quad needs batch_size % 4 == 0"

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.dataset.set_epoch(epoch)

    def _epoch_positions(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            ).permutation(n)
        return order[self.rank::self.world_size]

    def __len__(self):
        n = len(self._epoch_positions())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        positions = self._epoch_positions()
        nb = len(self)
        batches = [
            positions[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(nb)
        ]

        def make_batch(pos_list, bidx):
            samples = [self.dataset.get_sample(int(p)) for p in pos_list]
            if self.quad:
                rng = np.random.default_rng(np.random.SeedSequence(
                    [self.seed, self.epoch, int(bidx)]))
                batch = collate_quad(samples, self.max_targets, rng=rng)
            else:
                batch = collate(samples, self.max_targets)
            if self.stage is not None:
                batch = self.stage(batch)
            return batch

        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            futures = queue.Queue()
            depth = min(self.prefetch * max(1, self.workers // 2), nb)
            it = iter(enumerate(batches))
            submitted = 0
            for _ in range(depth):
                try:
                    bi, bp = next(it)
                    futures.put(pool.submit(make_batch, bp, bi))
                    submitted += 1
                except StopIteration:
                    break
            produced = 0
            while produced < nb:
                fut = futures.get()
                try:
                    bi, bp = next(it)
                    futures.put(pool.submit(make_batch, bp, bi))
                except StopIteration:
                    pass
                yield fut.result()
                produced += 1


def create_mixed_dataloader(
    path,
    img_size: int = 640,
    batch_size: int = 16,
    augment: bool = False,
    hyp=None,
    rect: bool = False,
    stride: int = 32,
    pad: float = 0.0,
    single_cls: bool = False,
    workers: int = 8,
    max_targets: int = 128,
    rank: int = 0,
    world_size: int = 1,
    shuffle: Optional[bool] = None,
    stage=None,
    seed: int = 0,
    fast_decode: bool = False,
    cache_images=None,
    quad: bool = False,
):
    """Reference create_mixed_dataloader equivalent (mixed_datasets.py:91-118):
    returns (loader, dataset)."""
    dataset = MixedDataset(
        path, img_size=img_size, batch_size=batch_size, augment=augment,
        hyp=hyp, rect=rect, stride=stride, pad=pad, single_cls=single_cls,
        max_targets=max_targets, seed=seed, fast_decode=fast_decode,
        cache_images=cache_images,
    )
    # cap at 2x the cores actually schedulable: decode/aug threads release
    # the GIL but oversubscribing a small host REGRESSES throughput (1-core
    # container: 8 workers run 2x slower than 2 — context-switch + allocator
    # thrash on the mosaic canvases)
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=augment if shuffle is None else shuffle,
        workers=min(workers, batch_size, 8, 2 * available_cores()),
        max_targets=max_targets,
        rank=rank,
        world_size=world_size,
        drop_last=augment,
        stage=stage,
        seed=seed,
        quad=quad,
    )
    return loader, dataset
