"""Asynchronous input pipeline: overlap host IO/preprocessing with TPU
compute.

The reference overlaps network RX with processing via its two-slot shared
memory (main.c:224-233).  The TPU-native analogue is a background producer
thread loading + converting upcoming pairs into a bounded buffer while the
device crunches the current batch — host->HBM transfer hides behind compute.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .datasets import StereoPair, load_pair


class PrefetchIterator:
    """Wrap any sample iterator with an N-deep background prefetcher.

    Supports ``close()`` (also via context manager / generator ``close``
    propagation) so an abandoned stream releases its producer thread and
    buffered items instead of leaking them for the process lifetime."""

    def __init__(self, source: Iterable, depth: int = 2):
        if depth < 1:
            raise ValueError(f"prefetch depth must be >= 1, got {depth}")
        self._it = iter(source)
        self._depth = depth
        self._cv = threading.Condition()
        self._buf: List = []
        self._done = False
        self._closed = False
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._it:
                with self._cv:
                    self._cv.wait_for(
                        lambda: len(self._buf) < self._depth or self._closed)
                    if self._closed:
                        return
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

    def close(self):
        """Unblock and retire the producer; drop buffered items."""
        with self._cv:
            self._closed = True
            self._buf.clear()
            self._cv.notify_all()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        with self._cv:
            self._cv.wait_for(
                lambda: self._buf or self._done or self._err or self._closed)
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
    prefetch_depth: Optional[int] = None,
) -> Iterator[Tuple[np.ndarray, np.ndarray, List[StereoPair]]]:
    """Yield (lefts, rights, pairs) uint8 batches with background loading.

    Pairs within a batch must share a shape (the loader groups consecutive
    same-shape folders; pad-and-mask batching can be layered on top).
    ``prefetch_depth`` defaults to ``batch_size`` so a full next batch
    stages while the device crunches the current one."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if prefetch_depth is None:
        prefetch_depth = batch_size
    to_gray = to_gray or (lambda p: (p.img_left, p.img_right))

    def gen():
        for f in folders:
            pair = load_pair(f)
            g = to_gray(pair)
            yield pair, g[0], g[1]

    def flush(batch):
        return (np.stack([b[1] for b in batch]),
                np.stack([b[2] for b in batch]),
                [b[0] for b in batch])

    batch: List = []
    with PrefetchIterator(gen(), prefetch_depth) as stream:
        for pair, l, r in stream:
            if batch and (batch[-1][1].shape, batch[-1][2].shape) \
                    != (l.shape, r.shape):
                yield flush(batch)
                batch = []
            batch.append((pair, l, r))
            if len(batch) == batch_size:
                yield flush(batch)
                batch = []
        if batch:
            yield flush(batch)
