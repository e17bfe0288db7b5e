"""Host input pipeline: threaded decode/resize -> device batched transforms.

Replaces the reference's 4-process torch DataLoader (fgvc/train.py:315-320).
Division of labor is TPU-shaped: the host only decodes JPEGs and resizes to
the pre-crop size (size/0.875); every stochastic transform runs on device over
the whole batch (saspa_tpu.ops.augment).  A double-buffered prefetch queue
overlaps host IO with device compute.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Tuple

import numpy as np
from PIL import Image

from saspa_tpu.data.datasets import FGVCDataset
from saspa_tpu.ops.augment import cutmix_batch, train_transform_batch, val_transform_batch
from saspa_tpu.utils import rng as rngs


def _decode_resize(path: str, pre_h: int, pre_w: int) -> np.ndarray:
    img = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    from saspa_tpu.native import resize_bilinear_u8

    return resize_bilinear_u8(img, pre_h, pre_w)


class InputPipeline:
    """Yields transformed device-ready batches from an FGVCDataset."""

    def __init__(
        self,
        dataset: FGVCDataset,
        batch_size: int,
        resize: Tuple[int, int] = (224, 224),
        train_transform: Optional[str] = "classic",
        use_cutmix: bool = False,
        num_classes: Optional[int] = None,
        seed: int = 1,
        num_threads: int = 8,
        prefetch: int = 2,
        drop_last: bool = True,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.resize = resize
        self.pre_size = (int(resize[0] / 0.875), int(resize[1] / 0.875))
        self.train_transform = train_transform
        self.use_cutmix = use_cutmix
        self.num_classes = num_classes or dataset.num_classes
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.drop_last = drop_last
        self._pool = ThreadPoolExecutor(max_workers=num_threads)

    def __len__(self):
        n = len(self.ds)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # ---- raw host batches --------------------------------------------------
    def _index_order(self, epoch: int, shuffle: bool) -> np.ndarray:
        idx = np.arange(len(self.ds))
        if shuffle:
            np.random.RandomState(self.seed * 100003 + epoch).shuffle(idx)
        return idx

    def _load_batch(self, indices) -> Tuple[np.ndarray, np.ndarray]:
        pre_h, pre_w = self.pre_size
        items = [self.ds.item_path(int(i)) for i in indices]
        arrays = list(self._pool.map(lambda it: _decode_resize(it[0], pre_h, pre_w), items))
        X = np.stack(arrays)
        y = np.asarray([it[1] for it in items], np.int32)
        return X, y

    def host_batches(self, epoch: int, shuffle: bool) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        idx = self._index_order(epoch, shuffle)
        n_full = len(idx) // self.batch_size
        bounds = [(i * self.batch_size, (i + 1) * self.batch_size) for i in range(n_full)]
        if not self.drop_last and n_full * self.batch_size < len(idx):
            bounds.append((n_full * self.batch_size, len(idx)))

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # bounded put that re-checks stop: an abandoned iterator (early
            # break from the consumer) must not leave this thread parked
            # forever on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # a decode failure must surface in the consumer, not end the
            # epoch silently looking like exhaustion
            try:
                for lo, hi in bounds:
                    if stop.is_set():
                        return
                    if not _put(("batch", self._load_batch(idx[lo:hi]))):
                        return
                _put(("done", None))
            except BaseException as e:  # noqa: BLE001 — reraised consumer-side
                _put(("error", e))

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                kind, item = q.get()
                if kind == "error":
                    raise RuntimeError("input pipeline producer failed") from item
                if kind == "done":
                    break
                yield item
        finally:
            stop.set()

    # ---- transformed device batches -----------------------------------------
    def iter_train(self, epoch: int):
        """Yields (X normalized f32, y, y_soft or None)."""
        import jax.numpy as jnp

        th, tw = self.resize
        for i, (Xu8, y) in enumerate(self.host_batches(epoch, shuffle=True)):
            key = rngs.item_key(self.seed, "augment", epoch, i)
            X = train_transform_batch(jnp.asarray(Xu8), key, self.train_transform, th, tw)
            y_soft = None
            if self.use_cutmix:
                ck = rngs.item_key(self.seed, "cutmix", epoch, i)
                X, y, y_soft = cutmix_batch(X, jnp.asarray(y), ck, self.num_classes)
            yield X, y, y_soft

    def iter_eval(self):
        import jax.numpy as jnp

        th, tw = self.resize
        for Xu8, y in self.host_batches(0, shuffle=False):
            yield val_transform_batch(jnp.asarray(Xu8), th, tw), y
