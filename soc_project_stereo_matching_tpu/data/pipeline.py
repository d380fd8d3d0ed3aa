"""Asynchronous input pipeline: overlap host IO/preprocessing with TPU
compute.

The reference overlaps network RX with processing via its two-slot shared
memory (main.c:224-233).  The TPU-native analogue is a background producer
thread loading + converting the next batch through a FrameRing while the
device crunches the current one — host->HBM transfer hides behind compute.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .datasets import StereoPair, load_pair
from ..runtime.framebuffer import FrameRing


class PrefetchIterator:
    """Wrap any sample iterator with an N-deep background prefetcher."""

    def __init__(self, source: Iterable, depth: int = 2):
        self._it = iter(source)
        self._depth = depth
        self._cv = threading.Condition()
        self._buf: List = []
        self._done = False
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                with self._cv:
                    self._cv.wait_for(lambda: len(self._buf) < self._depth)
                    self._buf.append(item)
                    self._cv.notify_all()
        except BaseException as e:  # propagate into consumer
            with self._cv:
                self._err = e
                self._cv.notify_all()
            return
        with self._cv:
            self._done = True
            self._cv.notify_all()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        with self._cv:
            self._cv.wait_for(lambda: self._buf or self._done or self._err)
            if self._buf:
                item = self._buf.pop(0)
                self._cv.notify_all()
                return item
            if self._err is not None:
                raise self._err
            raise StopIteration


def batched_pair_stream(
    folders: Sequence,
    batch_size: int,
    to_gray: Callable[[StereoPair], Tuple[np.ndarray, np.ndarray]] = None,
    prefetch_depth: int = 2,
) -> Iterator[Tuple[np.ndarray, np.ndarray, List[StereoPair]]]:
    """Yield (lefts, rights, pairs) uint8 batches with background loading.

    Pairs within a batch must share a shape (the loader groups consecutive
    same-shape folders; pad-and-mask batching can be layered on top)."""
    to_gray = to_gray or (lambda p: (p.img_left, p.img_right))

    def gen():
        for f in folders:
            pair = load_pair(f)
            g = to_gray(pair)
            yield pair, g[0], g[1]

    batch: List = []
    for pair, l, r in PrefetchIterator(gen(), prefetch_depth):
        if batch and batch[-1][1].shape != l.shape:
            lefts = np.stack([b[1] for b in batch])
            rights = np.stack([b[2] for b in batch])
            yield lefts, rights, [b[0] for b in batch]
            batch = []
        batch.append((pair, l, r))
        if len(batch) == batch_size:
            lefts = np.stack([b[1] for b in batch])
            rights = np.stack([b[2] for b in batch])
            yield lefts, rights, [b[0] for b in batch]
            batch = []
    if batch:
        lefts = np.stack([b[1] for b in batch])
        rights = np.stack([b[2] for b in batch])
        yield lefts, rights, [b[0] for b in batch]
