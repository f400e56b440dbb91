"""Batching, host->device transfer, and prefetch.

Replaces the reference's torch DataLoader (+ pin_memory/prefetch_factor,
/root/reference/train_dit.py:1068-1085) with a TPU-native pipeline:

  - worker threads pull samples from the dataset and assemble numpy batches
    (JPEG decode / resize release the GIL in PIL/cv2, so threads scale);
  - a double-buffered device-put stage moves batches to device asynchronously
    so host IO overlaps device compute;
  - in multi-host runs each process builds only its slice of the global batch
    and device_puts with the mesh's batch sharding.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Optional

import jax
import numpy as np


@dataclass
class Batch:
    video: np.ndarray                 # (B, T, 3, H, W) float32 pixels — OR
    #                                   (B, T, C, h, w) pre-encoded latents
    #                                   when is_latents (LatentCacheDataset)
    actions: Optional[np.ndarray]     # (B, T, A) float32 or None
    is_latents: bool = False


def make_dataset(dataset_type: str, split: str, return_actions: bool, **kw):
    """Factory over the three interchangeable backends
    (reference train_dit.py:1049-1066)."""
    if dataset_type == "dummy":
        from gtax.data.dummy import DummyDataset

        return DummyDataset(split=split, return_actions=return_actions, **kw)
    if dataset_type == "hfdataset":
        from gtax.data.hf import HFDataset

        return HFDataset(split=split, return_actions=return_actions, **kw)
    if dataset_type == "webdataset":
        from gtax.data.webtar import WebTarDataset

        return WebTarDataset(split=split, return_actions=return_actions, **kw)
    raise ValueError(
        f"Invalid dataset type: {dataset_type}. "
        "Must be 'webdataset', 'hfdataset' or 'dummy'."
    )


class DataLoader:
    """Threaded batch assembler with bounded prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        shuffle: bool | None = None,
        rank: int = 0,
        world: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.seed = seed
        self.rank = rank
        self.world = max(1, world)
        is_iterable = not hasattr(dataset, "__getitem__")
        self.shuffle = (
            shuffle if shuffle is not None else not is_iterable
        )
        self.is_iterable = is_iterable
        self.epoch = 0  # bumped after each full __iter__ over a map-style ds

    def __len__(self):
        """Per-rank batches per epoch. Matches _sample_iter exactly: the
        permutation is padded so every rank sees ceil(n/world) samples."""
        n = len(self.dataset)
        per_rank = -(-n // self.world)
        return (per_rank // self.batch_size if self.drop_last
                else -(-per_rank // self.batch_size))

    def set_epoch(self, epoch: int) -> None:
        """Pin the next __iter__'s shuffle epoch (torch
        DistributedSampler.set_epoch). The trainer calls this on resume so
        the replayed epoch uses the SAME permutation the interrupted run
        used — otherwise skip_batches would skip a prefix of a permutation
        that was never trained on."""
        self.epoch = int(epoch)

    def _sample_iter(self) -> Iterator[dict]:
        """One pass over the dataset per call (torch-DataLoader epoch
        semantics, reference train_dit.py:920-934). Map-style datasets
        reshuffle each epoch with a per-epoch seed; with world > 1 each rank
        takes a disjoint stride of the SAME permutation, PADDED by wrapping
        so all ranks yield the same count (torch DistributedSampler
        semantics — unequal per-rank counts would deadlock the collective
        train step; the reference gets this from
        accelerator.prepare(dataloader), train_dit.py:854).
        Resampled/iterable streams (webdataset) yield whatever the stream
        yields — possibly infinite; they shard internally."""
        if self.is_iterable:
            yield from iter(self.dataset)
        else:
            for i in self._epoch_order():
                yield self.dataset[int(i)]

    def _epoch_order(self) -> np.ndarray:
        """This rank's sample indices for the next epoch (advances epoch)."""
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        self.epoch += 1
        if self.world > 1:
            total = -(-n // self.world) * self.world
            if total > n:  # pad by wrapping (DistributedSampler)
                order = np.concatenate([order, order[: total - n]])
        return order[self.rank::self.world]

    def _decoded_iter(self) -> Iterator[dict]:
        """Samples in deterministic order, decoded by a thread pool when the
        dataset is map-style (JPEG decode/resize release the GIL). Iterable
        datasets stay sequential: their stream order IS the contract and the
        resumable cursor must advance with consumption."""
        if self.is_iterable or self.num_workers <= 1:
            yield from self._sample_iter()
            return
        import collections
        from concurrent.futures import ThreadPoolExecutor

        order = self._epoch_order()
        with ThreadPoolExecutor(self.num_workers) as ex:
            futs: collections.deque = collections.deque()
            for i in order:
                futs.append(ex.submit(self.dataset.__getitem__, int(i)))
                if len(futs) > 2 * self.num_workers:
                    yield futs.popleft().result()  # ordered: FIFO pop
            while futs:
                yield futs.popleft().result()

    def __iter__(self) -> Iterator[Batch]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # stop-aware put: never block forever on a consumer that left
            # (run_validation reads only max_batches; max_steps ends epochs
            # early) — an unbounded q.put would pin the thread + its batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                batch_vid, batch_act = [], []
                is_latents = False
                for sample in self._decoded_iter():
                    if stop.is_set():
                        return
                    is_latents = "latents" in sample
                    if "video_u8" in sample:
                        # uint8 channel-last pixels: stacked as-is; the
                        # float cast + CHW transpose happen ON DEVICE
                        # (gtax.train.trainer.as_float_video) — 4x less
                        # host->device transfer than float32
                        batch_vid.append(np.asarray(sample["video_u8"],
                                                    np.uint8))
                    else:
                        batch_vid.append(np.asarray(
                            sample["latents" if is_latents else "video"],
                            np.float32))
                    if "actions" in sample:
                        batch_act.append(np.asarray(sample["actions"], np.float32))
                    if len(batch_vid) == self.batch_size:
                        if not put(Batch(
                            video=np.stack(batch_vid),
                            actions=np.stack(batch_act) if batch_act else None,
                            is_latents=is_latents,
                        )):
                            return
                        batch_vid, batch_act = [], []
                if batch_vid and not self.drop_last:
                    put(Batch(
                        video=np.stack(batch_vid),
                        actions=np.stack(batch_act) if batch_act else None,
                        is_latents=is_latents,
                    ))
            except BaseException as e:  # surface in the consumer, not stderr
                put(e)
            finally:
                put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer stuck between its stop checks
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(batches: Iterator[Batch], sharding=None, depth: int = 2):
    """Asynchronously device_put up to `depth` batches ahead; yields device
    arrays. With a NamedSharding, each host transfers its local shard: in
    multi-process runs the incoming batch is this PROCESS'S slice and the
    yielded arrays are global (jax.make_array_from_process_local_data)."""
    import collections

    from gtax.parallel.mesh import global_batch_from_local

    buf = collections.deque()

    def put(b: Batch):
        if sharding is not None:
            video = global_batch_from_local(sharding, b.video)
            actions = (
                global_batch_from_local(sharding, b.actions)
                if b.actions is not None else None
            )
        else:
            video = jax.device_put(b.video)
            actions = jax.device_put(b.actions) if b.actions is not None else None
        return Batch(video=video, actions=actions, is_latents=b.is_latents)

    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        nxt = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield nxt
