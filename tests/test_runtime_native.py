"""Native runtime extension + frame ring + input pipeline tests."""

import threading

import numpy as np
import pytest

from soc_project_stereo_matching_tpu import SGMOptions, oracle
from soc_project_stereo_matching_tpu.data.pipeline import PrefetchIterator, batched_pair_stream
from soc_project_stereo_matching_tpu.runtime import native
from soc_project_stereo_matching_tpu.runtime.framebuffer import FrameRing, SlotStatus


def test_native_builds():
    assert native.have_native(), "native extension failed to build"


def test_gray_matches_firmware_weights():
    rng = np.random.default_rng(0)
    planes = rng.integers(0, 256, (3, 33, 47), dtype=np.uint8)  # B,G,R
    got = native.gray_from_bgr_planes(planes)
    b, g, r = (planes[i].astype(np.uint32) for i in range(3))
    want = ((76 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)
    assert np.array_equal(got, want)


def test_native_median_matches_oracle_inplace():
    rng = np.random.default_rng(1)
    disp = rng.uniform(0, 64, (40, 55)).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.1] = np.inf
    got = native.median3x3_inplace(disp)
    want = oracle.median_filter_3x3(disp, inplace=True)
    assert np.array_equal(np.isinf(got), np.isinf(want))
    assert np.array_equal(got[np.isfinite(want)], want[np.isfinite(want)])


def test_native_speckle_matches_oracle():
    rng = np.random.default_rng(2)
    disp = (rng.integers(0, 8, (48, 64)) * 6).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.2] = np.inf
    got = native.speckle_filter(disp, 1.0, 12)
    want = oracle.remove_speckles(disp, 1.0, 12)
    assert np.array_equal(np.isinf(got), np.isinf(want))


def test_golden_postproc_native_vs_c(cone_pair, goldens):
    """Native median/speckle reproduce the golden post-processing exactly
    when fed the golden aggregation."""
    opts = SGMOptions(median_inplace=True)
    aggr = goldens["cost_aggr"]
    disp = oracle.compute_disparity(aggr, opts, inverse=False)
    disp_r = oracle.compute_disparity(aggr, opts, inverse=True)
    disp = oracle.lr_check(disp, disp_r, opts.lrcheck_thres)
    disp = native.speckle_filter(disp, 1.0, opts.min_speckle_area)
    disp = native.median3x3_inplace(disp)
    gold = goldens["disp_left_full"]
    assert np.all((disp == gold) | (np.isinf(disp) & np.isinf(gold)))


def test_frame_ring_handshake():
    ring = FrameRing(4, 6, num_slots=2)
    consumed = []

    def producer():
        for fid in range(6):
            slot = ring.acquire_free(timeout=5)
            assert slot is not None
            slot.left[:] = fid
            ring.publish(slot, fid)

    t = threading.Thread(target=producer)
    t.start()
    for _ in range(6):
        slot = ring.acquire_ready(timeout=5)
        assert slot is not None and slot.status == SlotStatus.IN_PROGRESS
        consumed.append((slot.frame_id, int(slot.left[0, 0, 0])))
        ring.release(slot)
    t.join()
    assert consumed == [(i, i) for i in range(6)]  # ordered, correct payloads
    ring.close()
    assert ring.acquire_ready(timeout=0.01) is None


def test_prefetch_iterator_propagates_and_orders():
    assert list(PrefetchIterator(range(10), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("io failed")

    it = PrefetchIterator(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="io failed"):
        next(it)


def test_prefetch_iterator_contracts():
    # depth < 1 used to deadlock the producer/consumer pair forever
    with pytest.raises(ValueError, match="depth"):
        PrefetchIterator(range(3), depth=0)

    # close() releases a blocked producer (abandoned-stream leak fix)
    produced = []

    def slow():
        for i in range(100):
            produced.append(i)
            yield i

    it = PrefetchIterator(slow(), depth=2)
    assert next(it) == 0
    it.close()
    it._thread.join(timeout=5.0)
    assert not it._thread.is_alive()
    assert len(produced) < 100          # producer stopped early


def test_batched_pair_stream_validation():
    from soc_project_stereo_matching_tpu.data.pipeline import (
        batched_pair_stream)

    with pytest.raises(ValueError, match="batch_size"):
        list(batched_pair_stream([], batch_size=0))


def test_batched_pair_stream(reference_dir):
    from soc_project_stereo_matching_tpu.data.datasets import reference_data_pairs
    folders = reference_data_pairs(reference_dir)
    batches = list(batched_pair_stream(folders, batch_size=2))
    total = sum(len(b[2]) for b in batches)
    assert total == len(folders)
    for lefts, rights, pairs in batches:
        assert lefts.shape == rights.shape
        assert lefts.shape[0] == len(pairs)
        assert lefts.dtype == np.uint8
