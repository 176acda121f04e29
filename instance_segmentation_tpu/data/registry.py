"""Dataset registry + batched loader (ref data/__init__.py:18-102).

`get_dataloader` returns an iterator of static-shape batches:

    images:  uint8 [B, H, W, 3]
    labels:  PackedLabels (padded polys/n_verts/cls_ids) or None
    infos:   list[TransInfo]

replacing the reference's torch DataLoader + ragged-list collate
(ref :42-64). A background thread prefetches the next batch while the
device is busy (double buffering; the reference used DataLoader workers).
"""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from instance_segmentation_tpu.data import cityscapes, coco
from instance_segmentation_tpu.data.cityscapes import CityscapesDatasetBuilder
from instance_segmentation_tpu.data.coco import COCODatasetBuilder
from instance_segmentation_tpu.data.dataset import is_train_phase
from instance_segmentation_tpu.data.dir import DirDatasetBuilder
from instance_segmentation_tpu.data.packing import PackedLabels, pack_batch

from instance_segmentation_tpu.data.packed_dataset import PackedCityscapesDatasetBuilder

datasetBuildersMap = {
    "cityscapes": CityscapesDatasetBuilder,
    "cityscapes_packed": PackedCityscapesDatasetBuilder,
    "coco": COCODatasetBuilder,
    "dir": DirDatasetBuilder,
}

datasetClsNumMap = {
    "cityscapes": cityscapes.num_cls,
    "coco": coco.num_cls,
}

datasetEvalLabelMap = {
    "cityscapes": cityscapes.class_labels,
}


def get_eval_labels(dataset_type: str):
    return datasetEvalLabelMap[dataset_type]


def get_cls_num(dataset_type: str) -> int:
    return datasetClsNumMap[dataset_type]


class BatchLoader:
    """Iterable over packed batches with optional shuffling and prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, drop_last: bool,
                 max_instances: int, max_verts: int, with_label: bool = True,
                 seed: int = 0, prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.max_instances = max_instances
        self.max_verts = max_verts
        self.with_label = with_label
        self.prefetch = prefetch
        self.num_workers = num_workers
        self._seed = seed
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, indices) -> tuple:
        images, labels, infos = [], [], []
        for i in indices:
            img, label, info = self.dataset[i]
            images.append(np.ascontiguousarray(img))
            labels.append(label)
            infos.append(info)
        images = np.stack(images)
        packed: Optional[PackedLabels] = None
        if self.with_label and labels[0] is not None:
            if isinstance(labels[0], tuple) and len(labels[0]) == 4 \
                    and labels[0][0] == "packed":
                # offline pre-packed labels (data/packed_dataset.py)
                packed = PackedLabels(
                    np.stack([l[1] for l in labels]),
                    np.stack([l[2] for l in labels]),
                    np.stack([l[3] for l in labels]))
            else:
                packed = pack_batch(labels, self.max_instances, self.max_verts)
        return images, packed, infos

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for s in range(0, n, self.batch_size):
            chunk = order[s:s + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            yield chunk

    def __iter__(self) -> Iterator:
        if self.num_workers > 0:
            yield from self._iter_pool()
            return
        if self.prefetch <= 0:
            for idx in self._index_batches():
                yield self._make_batch(idx)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()
        failure: List[BaseException] = []

        def put_stop_aware(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for idx in self._index_batches():
                    if stop.is_set():
                        return
                    if not put_stop_aware(self._make_batch(idx)):
                        return
            except BaseException as e:
                # a raising batch must fail the epoch, not end it early: a
                # swallowed error here would truncate eval sweeps silently
                # (and the {epoch}_dets.json cache would pin the truncation)
                failure.append(e)
            finally:
                put_stop_aware(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if failure:
                        raise RuntimeError(
                            "data prefetch worker failed") from failure[0]
                    break
                yield item
        finally:
            # consumer abandoned the epoch early (e.g. trainer max_iter):
            # unblock and join the worker so threads/batches don't accumulate
            stop.set()
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    pass
                t.join(timeout=0.05)

    # -- multi-process loading (the reference trains with torch DataLoader
    # num_workers>0, ref data/__init__.py:42-64; a thread can't parallelize
    # PNG decode/augment past the GIL, a fork pool can) ------------------

    def _worker_main(self, wid: int, epoch: int, task_q, result_q):
        # decorrelate per-sample augmentation RNG across workers AND epochs
        # (each fork inherits the same CommonTransforms._rng state; a fresh
        # pool is forked per epoch, so the seed must mix the epoch counter
        # or every epoch would replay the same augmentation draws)
        t = (getattr(self.dataset, "_transforms", None)
             or getattr(self.dataset, "transforms", None))
        if t is not None and hasattr(t, "_rng"):
            t._rng = np.random.default_rng([self._seed, wid, epoch])
        while True:
            task = task_q.get()
            if task is None:
                return
            bid, idx = task
            try:
                result_q.put((bid, self._make_batch(idx)))
            except BaseException as e:  # surface the failure, don't hang
                result_q.put((bid, ("__worker_error__", repr(e))))
                raise

    def _iter_pool(self) -> Iterator:
        """Ordered multi-process batch loading.

        A fork pool pulls (batch_id, indices) tasks from a shared queue;
        the parent reorders results so delivery matches the serial order.
        In-flight depth is num_workers + prefetch (bounded memory).
        """
        ctx = mp.get_context("fork")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        self._pool_epoch = getattr(self, "_pool_epoch", -1) + 1
        procs = [ctx.Process(target=self._worker_main,
                             args=(w, self._pool_epoch, task_q, result_q),
                             daemon=True)
                 for w in range(self.num_workers)]
        for p in procs:
            p.start()
        try:
            batches = enumerate(self._index_batches())
            inflight, limit = 0, self.num_workers + max(self.prefetch, 0)
            buf, next_out, submitted_all = {}, 0, False

            def submit():
                nonlocal inflight, submitted_all
                while inflight < limit and not submitted_all:
                    try:
                        bid, idx = next(batches)
                    except StopIteration:
                        submitted_all = True
                        return
                    task_q.put((bid, idx))
                    inflight += 1

            submit()
            while inflight > 0 or buf:
                while next_out not in buf:
                    try:
                        bid, batch = result_q.get(timeout=10.0)
                    except queue.Empty:
                        # a worker that died mid-task (segfault, OOM-kill)
                        # never posts a result; fail instead of hanging
                        if any(not p.is_alive() for p in procs):
                            raise RuntimeError(
                                "data worker died without delivering its "
                                "batch (see worker stderr)")
                        continue
                    if (isinstance(batch, tuple) and len(batch) == 2
                            and batch[0] == "__worker_error__"):
                        raise RuntimeError(
                            f"data worker failed on batch {bid}: {batch[1]}")
                    buf[bid] = batch
                    inflight -= 1
                    submit()
                yield buf.pop(next_out)
                next_out += 1
        finally:
            for _ in procs:
                task_q.put(None)
            for p in procs:
                p.join(timeout=5)
                if p.is_alive():
                    p.terminate()


def device_prefetch(loader, size: int = 2):
    """Double-buffer batches onto the device: host->HBM transfers of the next
    batches overlap the current step's compute (replaces the reference's
    DataLoader worker prefetch, which still paid a synchronous `.to(device)`
    per step, ref train.py:199)."""
    import collections
    import jax

    queue = collections.deque()

    def put(batch):
        images, packed, infos = batch
        images = jax.device_put(images)
        if packed is not None:
            packed = type(packed)(*(jax.device_put(a) for a in packed))
        return images, packed, infos

    it = iter(loader)
    try:
        try:
            for _ in range(size):
                queue.append(put(next(it)))
        except StopIteration:
            pass
        while queue:
            yield queue.popleft()
            try:
                queue.append(put(next(it)))
            except StopIteration:
                pass
    finally:
        # propagate early consumer exit into the loader so its prefetch
        # worker shuts down instead of leaking (trainer breaks on max_iter)
        if hasattr(it, "close"):
            it.close()


def get_dataloader(batch_size: int, dataset_type: str, data_dir: str, phase: str,
                   transforms=None, max_instances: int = 96, max_verts: int = 256,
                   random: bool = True, with_label: bool = True, seed: int = 0,
                   prefetch: int = 2, num_workers: int | None = None) -> BatchLoader:
    builder_cls = datasetBuildersMap[dataset_type]
    builder = builder_cls(data_dir, phase)
    dataset = builder.get_dataset(transforms=transforms)
    train = is_train_phase(phase)
    if num_workers is None:
        num_workers = int(os.environ.get("ISEG_DATA_WORKERS", "0"))
    return BatchLoader(
        dataset, batch_size,
        shuffle=train and random, drop_last=train,
        max_instances=max_instances, max_verts=max_verts,
        with_label=with_label, seed=seed, prefetch=prefetch,
        num_workers=num_workers)
