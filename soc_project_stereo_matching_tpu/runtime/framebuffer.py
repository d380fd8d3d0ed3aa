"""Double-buffered frame ring — the host analogue of the reference's
shared-memory frame store.

The reference reserves a 16 MiB shared region holding two ``SteroPairImg_t``
slots plus a depth slot, handshaking via a status enum
(INVALID/READY/IN_PROGRESS/DONE, frame_buffer.h:9-51) so lwIP RX overlaps the
compute superloop, toggling slots with ``next_frame_id = id ^ 1``
(frame_buffer.c:67-69).  Here the same structure overlaps network/disk
ingest with TPU compute: numpy-backed slots (zero-copy for the producer's
``recv_into``/decode and for ``jax.device_put``) guarded by a condition
variable instead of a superloop poll.
"""

from __future__ import annotations

import enum
import threading
from dataclasses import dataclass, field
from typing import Optional, Tuple

import numpy as np


class SlotStatus(enum.IntEnum):
    """Mirror of the reference MemStatus_t (frame_buffer.h:9-14)."""

    INVALID = 0
    READY = 1          # filled by the producer, waiting for compute
    IN_PROGRESS = 2    # being consumed
    DONE = 3           # consumed; free for reuse


@dataclass
class FrameSlot:
    index: int
    left: np.ndarray            # (H, W, C) uint8
    right: np.ndarray
    calib_blob: bytearray       # 80-byte wire calibration
    frame_id: int = -1
    status: SlotStatus = SlotStatus.INVALID


class FrameRing:
    """N-slot producer/consumer ring (reference uses N=2)."""

    def __init__(self, height: int, width: int, channels: int = 3,
                 num_slots: int = 2):
        self._cv = threading.Condition()
        self._closed = False
        self.slots = [
            FrameSlot(
                index=i,
                left=np.zeros((height, width, channels), dtype=np.uint8),
                right=np.zeros((height, width, channels), dtype=np.uint8),
                calib_blob=bytearray(80),
            )
            for i in range(num_slots)
        ]

    # -- producer side -------------------------------------------------------
    def acquire_free(self, timeout: Optional[float] = None) -> Optional[FrameSlot]:
        """Block until a slot is free (INVALID/DONE); None on close/timeout."""
        with self._cv:
            def free():
                return self._closed or any(
                    s.status in (SlotStatus.INVALID, SlotStatus.DONE)
                    for s in self.slots)
            if not self._cv.wait_for(free, timeout):
                return None
            if self._closed:
                return None
            slot = next(s for s in self.slots
                        if s.status in (SlotStatus.INVALID, SlotStatus.DONE))
            slot.status = SlotStatus.IN_PROGRESS
            return slot

    def publish(self, slot: FrameSlot, frame_id: int) -> None:
        with self._cv:
            slot.frame_id = frame_id
            slot.status = SlotStatus.READY
            self._cv.notify_all()

    # -- consumer side -------------------------------------------------------
    def acquire_ready(self, timeout: Optional[float] = None) -> Optional[FrameSlot]:
        """Block until a READY slot exists; returns the oldest frame_id."""
        with self._cv:
            def ready():
                return self._closed or any(
                    s.status == SlotStatus.READY for s in self.slots)
            if not self._cv.wait_for(ready, timeout):
                return None
            candidates = [s for s in self.slots if s.status == SlotStatus.READY]
            if not candidates:
                return None
            slot = min(candidates, key=lambda s: s.frame_id)
            slot.status = SlotStatus.IN_PROGRESS
            return slot

    def release(self, slot: FrameSlot) -> None:
        with self._cv:
            slot.status = SlotStatus.DONE
            self._cv.notify_all()

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
