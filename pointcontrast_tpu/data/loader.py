"""Prefetching loaders.

Replaces torch DataLoader + worker processes
(/root/reference/pretrain/pointcontrast/lib/ddp_data_loaders.py:272-309)
with a thread-pool pipeline: sample indices -> __getitem__ in parallel ->
collate to a static-shaped batch -> bounded prefetch queue.  The heavy
per-sample work (quantize, hash join, pyramid build) is numpy, which
releases the GIL inside its C kernels, so threads scale adequately without
process fork overhead; ``num_shards``/``shard_id`` reproduce the reference's
rank-strided sharding for multi-host feeding.

``PrefetchLoaderBase`` carries all the pipeline machinery; subclasses
(``PairLoader`` here, ``SemsegLoader`` in semseg.dataset) provide the
collate step.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from pointcontrast_tpu.data.collate import PadScheme, collate_pair
from pointcontrast_tpu.data.sampler import DistributedInfSampler


class PrefetchLoaderBase:
    """Infinite threaded loader: sampler -> pooled ``__getitem__`` with
    per-task RNGs -> subclass ``_collate`` -> bounded queue.

    Subclasses set their config fields, then call ``_start_pipeline``.
    Exceptions from the dataset or collator are forwarded to the consumer
    (raised from ``__next__``) and the producer keeps going — a transient
    per-sample failure must not leave later ``__next__`` calls blocking
    forever on a dead producer thread.
    """

    def _start_pipeline(
        self,
        dataset,
        batch_size: int,
        num_device_batches: int,
        shuffle: bool,
        seed: int,
        num_shards: int,
        shard_id: int,
        num_workers: int,
        prefetch: int,
        rng_salt: int,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_device_batches = num_device_batches
        self.sampler = DistributedInfSampler(
            len(dataset), num_shards, shard_id, shuffle, seed
        )
        self.rng = np.random.RandomState(seed + rng_salt * shard_id)
        self._pool = ThreadPoolExecutor(max_workers=max(1, num_workers))
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _collate(self, samples):
        raise NotImplementedError

    def _one_device_batch(self):
        import os

        idxs = [next(self.sampler) for _ in range(self.batch_size)]
        # np.random.RandomState is not thread-safe: hand each pool task its
        # own RNG seeded from the (single-threaded) producer stream.
        seeds = [int(self.rng.randint(0, 2**31 - 1)) for _ in idxs]
        samples = list(
            self._pool.map(
                lambda iv: self.dataset.__getitem__(
                    iv[0], rng=np.random.RandomState(iv[1])
                ),
                zip(idxs, seeds),
            )
        )
        batch = self._collate(samples)
        if os.environ.get("PC_TPU_VALIDATE") == "1":
            from pointcontrast_tpu.utils.debug import validate_batch

            validate_batch(batch)
        return batch

    def _produce(self):
        import jax

        while not self._stop.is_set():
            try:
                if self.num_device_batches == 1:
                    batch = self._one_device_batch()
                else:
                    parts = [
                        self._one_device_batch()
                        for _ in range(self.num_device_batches)
                    ]
                    batch = jax.tree.map(lambda *xs: np.stack(xs), *parts)
            except Exception as e:
                # propagate to the consumer but KEEP PRODUCING (see class doc)
                batch = e
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=1.0)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if isinstance(item, Exception):
            raise item
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False)


class PairLoader(PrefetchLoaderBase):
    def __init__(
        self,
        dataset,
        batch_size: int,
        scheme: PadScheme,
        mode: str = "nce",
        npos: int = 4096,
        num_pos: int = 4096,
        num_hn: int = 1024,
        num_device_batches: int = 1,
        num_workers: int = 2,
        prefetch: int = 2,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        fuse_frames: bool = False,
        conv0_kernel_size: int = 3,
        layout: str = "voxel",
    ):
        """num_device_batches > 1 stacks that many independent per-device
        batches along a leading axis (the data-parallel mesh axis)."""
        self.layout = layout
        self.scheme = scheme
        self.mode = mode
        self.npos = npos
        self.num_pos = num_pos
        self.num_hn = num_hn
        self.fuse_frames = fuse_frames
        self.conv0_kernel_size = conv0_kernel_size
        self._start_pipeline(
            dataset, batch_size, num_device_batches, shuffle, seed,
            num_shards, shard_id, num_workers, prefetch, rng_salt=13,
        )

    def _collate(self, samples):
        return collate_pair(
            samples,
            self.scheme,
            mode=self.mode,
            npos=self.npos,
            num_pos=self.num_pos,
            num_hn=self.num_hn,
            rng=self.rng,
            fuse_frames=self.fuse_frames,
            conv0_kernel_size=self.conv0_kernel_size,
            layout=self.layout,
        )
