"""Pallas kernel parity vs the jnp ops layer (interpret mode on CPU).

Every kernel must be bit-equal to its jnp fallback, which is itself pinned
against the numpy oracle and the reference-C goldens (test_ops_vs_oracle /
test_oracle_golden) — so equality here closes the chain kernel == C.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from soc_project_stereo_matching_tpu import SGMOptions
from soc_project_stereo_matching_tpu.ops import (
    aggregation, census, cost_volume, postprocess, wta)
from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

H, W, D = 37, 53, 16
RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def data():
    cost = jnp.asarray(RNG.integers(0, 128, (H, D, W), dtype=np.uint8))
    img = jnp.asarray(RNG.integers(0, 256, (H, W), dtype=np.uint8))
    return cost, img


@pytest.mark.parametrize("bidir", [False, True])
@pytest.mark.parametrize("paths", [8, 4])
@pytest.mark.parametrize("mode", ["wrap", "restart"])
def test_aggregation_kernel_parity(data, paths, mode, bidir):
    cost, img = data
    opt = SGMOptions(num_paths=paths, max_disparity=D)
    want = np.asarray(aggregation.aggregate_paths(cost, img, opt, mode))
    got = np.asarray(pk.aggregate_paths(cost, img, opt, mode, block_rows=8,
                                        bidir=bidir))
    np.testing.assert_array_equal(want, got)


@pytest.mark.parametrize("bidir", [False, True])
def test_aggregation_kernel_batched(data, bidir):
    cost, img = data
    opt = SGMOptions(max_disparity=D)
    costb = jnp.stack([cost, cost[::-1]])
    imgb = jnp.stack([img, img[::-1]])
    want = np.stack([
        np.asarray(aggregation.aggregate_paths(costb[i], imgb[i], opt))
        for i in range(2)])
    got = np.asarray(pk.aggregate_paths(costb, imgb, opt, block_rows=8,
                                        bidir=bidir))
    np.testing.assert_array_equal(want, got)


def test_wta_kernel_parity(data):
    cost, img = data
    opt = SGMOptions(max_disparity=D)
    aggr = aggregation.aggregate_paths(cost, img, opt)
    fwd, inv = pk.wta_reduce_pallas(aggr, opt, include_inverse=True,
                                    block_rows=8)
    want_f = wta.wta_reduce(aggr, opt, inverse=False)
    want_i = wta.wta_reduce(aggr, opt, inverse=True)
    for got, want in zip(fwd, want_f):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(inv, want_i):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # disparity finalisation on kernel planes == compute_disparity
    np.testing.assert_array_equal(
        np.asarray(wta.finalize_disparity(fwd, opt)),
        np.asarray(wta.compute_disparity(aggr, opt, inverse=False)))


@pytest.mark.parametrize("bidir", [False, True])
@pytest.mark.parametrize("compute16", [False, True])
@pytest.mark.parametrize("mode", ["wrap", "restart"])
def test_fused_aggregation_wta_parity(data, mode, compute16, bidir):
    """aggregate_paths_wta (WTA planes emitted by the final DP launch) ==
    aggregate_paths + wta_reduce_pallas, both views, batched+unbatched;
    also covers the packed-int16 recurrence and the bidirectional
    single-launch formulation end to end."""
    cost, img = data
    opt = SGMOptions(max_disparity=D)
    costb = jnp.stack([cost, cost[::-1]])
    imgb = jnp.stack([img, img[::-1]])
    aggr = pk.aggregate_paths(costb, imgb, opt, mode, block_rows=8)
    want_f, want_i = pk.wta_reduce_pallas(aggr, opt, True, block_rows=8)
    got_f, got_i = pk.aggregate_paths_wta(costb, imgb, opt, mode,
                                          block_rows=8,
                                          compute16=compute16,
                                          bidir=bidir)
    for a, b in zip(want_f, got_f):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(want_i, got_i):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    un_f, un_none = pk.aggregate_paths_wta(cost, img, opt, mode,
                                           block_rows=8,
                                           include_inverse=False,
                                           bidir=bidir)
    assert un_none is None
    np.testing.assert_array_equal(np.asarray(un_f.best_idx),
                                  np.asarray(got_f.best_idx[0]))


def test_wta_kernel_wide_disparity_range():
    """D > 256 (Middlebury-2014 full-range territory): the argmin key
    widens to ceil(log2(D)) bits instead of a static 8-bit cap."""
    d = 288
    aggr = jnp.asarray(RNG.integers(0, 60000, (9, d, 40), dtype=np.uint16))
    opt = SGMOptions(max_disparity=d)
    fwd, inv = pk.wta_reduce_pallas(aggr, opt, include_inverse=True,
                                    block_rows=8)
    want_f = wta.wta_reduce(aggr, opt, inverse=False)
    want_i = wta.wta_reduce(aggr, opt, inverse=True)
    for got, want in zip(fwd, want_f):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(inv, want_i):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wta_kernel_degenerate_single_plane():
    """d == 1 (max_disparity = min_disparity + 1): the inverse second-min
    must be the jnp reference's empty-set BIG, not the packed sentinel."""
    opt = SGMOptions(min_disparity=3, max_disparity=4)
    aggr = jnp.asarray(RNG.integers(0, 60000, (9, 1, 40), dtype=np.uint16))
    fwd, inv = pk.wta_reduce_pallas(aggr, opt, include_inverse=True,
                                    block_rows=8)
    for got, want in zip(fwd, wta.wta_reduce(aggr, opt, inverse=False)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    for got, want in zip(inv, wta.wta_reduce(aggr, opt, inverse=True)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_census_cost_kernel_parity():
    il = jnp.asarray(RNG.integers(0, 256, (2, 40, 61), dtype=np.uint8))
    ir = jnp.asarray(RNG.integers(0, 256, (2, 40, 61), dtype=np.uint8))
    want = cost_volume.hamming_cost_volume(
        census.census_5x5(il), census.census_5x5(ir), 0, D)
    got = pk.census_cost_volume_pallas(il, ir, 0, D, block_rows=8)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # uint8 tile-slab store variant: requires D % 32 == 0 (the module D=16
    # would silently fall back to the int32 path and test nothing), so run
    # it at D=32 against its own reference volume
    d32 = 32
    want32 = cost_volume.hamming_cost_volume(
        census.census_5x5(il), census.census_5x5(ir), 0, d32)
    got8 = pk.census_cost_volume_pallas(il, ir, 0, d32, block_rows=8,
                                        store8=True)
    assert got8.dtype == want32.dtype
    np.testing.assert_array_equal(np.asarray(want32), np.asarray(got8))


def test_speckle_kernel_parity():
    d = RNG.integers(0, 8, (2, 47, 61)).astype(np.float32)
    d[RNG.random((2, 47, 61)) < 0.35] = np.inf
    dj = jnp.asarray(d)
    want = np.stack([
        np.asarray(postprocess.remove_speckles(dj[i], 1.0, 9))
        for i in range(2)])
    got = np.asarray(pk.remove_speckles_pallas(dj, 1.0, 9))
    both_inf = np.isinf(want) & np.isinf(got)
    assert ((np.isinf(want) == np.isinf(got)) & (both_inf | (want == got))).all()


def test_lr_check_kernel_parity():
    rng = np.random.default_rng(17)
    h, w = 45, 83
    dl = rng.uniform(0, 16, (2, h, w)).astype(np.float32)
    dr = rng.uniform(0, 16, (2, h, w)).astype(np.float32)
    dl[rng.random((2, h, w)) < 0.2] = np.inf
    dr[rng.random((2, h, w)) < 0.2] = np.inf
    want = np.asarray(postprocess.lr_check(jnp.asarray(dl), jnp.asarray(dr),
                                           1.0, max_shift=16))
    got = np.asarray(pk.lr_check_pallas(jnp.asarray(dl), jnp.asarray(dr),
                                        1.0, max_shift=16, block_rows=16))
    both_inf = np.isinf(want) & np.isinf(got)
    assert ((np.isinf(want) == np.isinf(got)) & (both_inf | (want == got))).all()


@pytest.mark.parametrize("max_shift", [192, 256])
def test_lr_check_kernel_large_range_dynamic(max_shift):
    """max_shift > 128 takes the dynamic-rotate fori_loop (the flagship
    KITTI-2015 D=192 / Middlebury-2014 D=256 configs no longer fall back
    to the O(D) XLA select): bit-equal to the jnp path."""
    rng = np.random.default_rng(23)
    h, w = 24, 300
    hi = min(max_shift, w) - 1
    dl = rng.uniform(0, hi, (h, w)).astype(np.float32)
    dr = rng.uniform(0, hi, (h, w)).astype(np.float32)
    dl[rng.random((h, w)) < 0.2] = np.inf
    dr[rng.random((h, w)) < 0.2] = np.inf
    want = np.asarray(postprocess.lr_check(jnp.asarray(dl), jnp.asarray(dr),
                                           1.0, max_shift=max_shift))
    got = np.asarray(pk.lr_check_pallas(jnp.asarray(dl), jnp.asarray(dr),
                                        1.0, max_shift=max_shift,
                                        block_rows=8))
    assert np.array_equal(want, got)


def test_lr_check_kernel_nonfinite_inputs():
    """NaN and -inf inputs: both paths share isfinite predicates, so the
    kernel stays bit-equal even off the pipeline's +inf-only contract."""
    rng = np.random.default_rng(29)
    h, w = 16, 40
    dl = rng.uniform(0, 15, (h, w)).astype(np.float32)
    dr = rng.uniform(0, 15, (h, w)).astype(np.float32)
    for a in (dl, dr):
        a[rng.random((h, w)) < 0.15] = np.inf
        a[rng.random((h, w)) < 0.1] = -np.inf
        a[rng.random((h, w)) < 0.1] = np.nan
    want = np.asarray(postprocess.lr_check(jnp.asarray(dl), jnp.asarray(dr),
                                           1.0, max_shift=16))
    got = np.asarray(pk.lr_check_pallas(jnp.asarray(dl), jnp.asarray(dr),
                                        1.0, max_shift=16, block_rows=16))
    assert np.array_equal(want, got, equal_nan=True)


def test_speckle_strip_decomposition_exact():
    """Frames above the VMEM pixel budget split into min_area-halo row
    strips — exact, because small components fit within Chebyshev radius
    min_area of any member.  Forced here via the budget constant on a
    deliberately odd shape (fresh jit trace)."""
    rng = np.random.default_rng(21)
    h, w = 91, 67
    d = rng.integers(0, 8, (2, h, w)).astype(np.float32)
    d[rng.random((2, h, w)) < 0.35] = np.inf
    dj = jnp.asarray(d)
    want = np.stack([
        np.asarray(postprocess.remove_speckles(dj[i], 1.0, 9))
        for i in range(2)])
    orig = pk._SPECKLE_VMEM_PIXELS
    try:
        pk._SPECKLE_VMEM_PIXELS = 40 * w   # strip interior = 22 rows
        got = np.asarray(pk.remove_speckles_pallas(dj, 1.0, 9))
    finally:
        pk._SPECKLE_VMEM_PIXELS = orig
    both_inf = np.isinf(want) & np.isinf(got)
    assert ((np.isinf(want) == np.isinf(got)) & (both_inf | (want == got))).all()


def test_speckle_band_geometry_covers_every_window():
    """Property: for every pixel row r a group touches, the band
    [start, start+band) contains the whole root window [max(0, r-(a-1)), r]
    — the invariant both banded kernels' exactness proofs rest on."""
    import numpy as np

    rng = np.random.default_rng(5)
    for _ in range(200):
        h = int(rng.integers(8, 1200))
        w = int(rng.integers(16, 2048))
        a = int(rng.integers(1, 200))
        pc = int(rng.choice([256, 1024, 2048]))
        g, band, h_hist = pk._speckle_band_geometry(h, w, a, pc)
        # 16-row alignment: the root-small plane is bf16 (Mosaic (16, 128))
        assert band % 16 == 0 and band <= h_hist and h_hist >= h
        n = h * w
        ngroups = -(-n // (g * pc))
        for gi in range(ngroups):
            rlo = (gi * g * pc) // w
            rhi = min(((gi + 1) * g * pc - 1) // w, h - 1)
            start = min((max(rlo - (a - 1), 0) // 16) * 16, h_hist - band)
            assert start >= 0 and start % 16 == 0
            assert start <= max(rlo - (a - 1), 0), (h, w, a, pc, gi)
            assert start + band > rhi, (h, w, a, pc, gi, start, band, rhi)


def test_speckle_banded_histogram_exact():
    """Exercise the banded histogram/verdict path with band < h (the big
    frames where banding pays; small test frames otherwise degenerate to
    the full-height band).  Structures chosen to stress the banding
    proofs: a full-height line (root far above every low member's band —
    the gather's implicit zero must mean not-small), lines of exactly
    min_area and min_area-1 pixels placed low in the frame, and a speck
    adjacent to the band start."""
    h, w, area = 120, 64, 5
    rng = np.random.default_rng(31)
    d = rng.integers(0, 6, (h, w)).astype(np.float32)
    d[rng.random((h, w)) < 0.55] = np.inf
    d[:, 10] = 3.0        # h-pixel vertical line: area h >> 5, kept
    d[:, 9] = np.inf      # isolate it
    d[:, 11] = np.inf
    d[69:76, 29:32] = np.inf
    d[70:75, 30] = 3.0    # exactly min_area: kept
    d[79:85, 39:42] = np.inf
    d[80:84, 40] = 3.0    # min_area-1: removed
    d[28:32, 49:52] = np.inf
    d[29:31, 50] = 3.0    # wide-gap speck at a band-aligned row: removed
    dj = jnp.asarray(d)
    want = np.asarray(postprocess.remove_speckles(dj, 1.0, area))

    orig = pk._SPECKLE_PC
    try:
        pk._SPECKLE_PC = 256
        g, band, h_hist = pk._speckle_band_geometry(h, w, area, 256)
        assert band < h_hist, (g, band, h_hist)   # banding really active
        got = np.asarray(pk.remove_speckles_pallas(dj, 1.0, area))
    finally:
        pk._SPECKLE_PC = orig
    both_inf = np.isinf(want) & np.isinf(got)
    assert ((np.isinf(want) == np.isinf(got))
            & (both_inf | (want == got))).all()
    assert np.isinf(got[81, 40]) and not np.isinf(got[72, 30])
    assert not np.isinf(got[h - 1, 10])


def test_full_pipeline_pallas_vs_jnp():
    from soc_project_stereo_matching_tpu.models.sgm import sgm_forward

    opt = SGMOptions(max_disparity=D, min_speckle_area=8)
    il = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    ir = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    want = np.asarray(sgm_forward(il, ir, opt, use_pallas=False))
    for compute16 in (False, True):
        got = np.asarray(sgm_forward(il, ir, opt, use_pallas=True,
                                     compute16=compute16))
        both_inf = np.isinf(want) & np.isinf(got)
        assert ((np.isinf(want) == np.isinf(got))
                & (both_inf | (want == got))).all()


def test_auto_block_rows_shrinks_for_large_volumes():
    from soc_project_stereo_matching_tpu.ops.pallas_kernels import (
        _auto_block_rows, _round_up)

    assert _auto_block_rows(64, 450, 32) == 32        # cone fits
    br = _auto_block_rows(128, 1280, 32)              # 720p D=128 shrinks
    assert br < 32 and br >= 8
    assert 32 * 128 * 1280 * 4 > 16 * 1024 * 1024     # would have OOMed
    # padded scan axes stay divisible after shrinking (powers of two)
    assert _round_up(720, 32) % br == 0


def test_plain_block_rows_sublane_divisible():
    # ADVICE r3: the nsp P2 BlockSpec puts the chunk size in the
    # second-to-last block dim, which Mosaic requires 8-divisible; the
    # shared helper must round every shrink result down to a multiple of 8
    from soc_project_stereo_matching_tpu.ops.pallas_kernels import (
        _plain_block_rows)

    for d, w, req in [(64, 450, 32), (128, 1280, 48), (256, 1500, 48),
                      (512, 2048, 100), (16, 53, 12), (16, 53, 4)]:
        br = _plain_block_rows(d, w, req)
        assert br % 8 == 0 and br >= 8, (d, w, req, br)
    # the motivating case: 48 shrinks through 24->12->6 without the guard
    assert _plain_block_rows(128, 4096, 48) == 8


@pytest.mark.parametrize("req", [12, 48])
def test_aggregation_kernel_odd_block_rows(data, req):
    # a non-multiple-of-8 request must still produce bit-equal results
    # (caller padding and kernel chunking agree on the rounded value)
    cost, img = data
    opt = SGMOptions(max_disparity=D)
    want = np.asarray(aggregation.aggregate_paths(cost, img, opt))
    got = np.asarray(pk.aggregate_paths(cost, img, opt, block_rows=req))
    np.testing.assert_array_equal(want, got)
    f_want, i_want = pk.aggregate_paths_wta(cost, img, opt, block_rows=8)
    f_got, i_got = pk.aggregate_paths_wta(cost, img, opt, block_rows=req)
    for a, b in zip(tuple(f_want) + tuple(i_want),
                    tuple(f_got) + tuple(i_got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_aggregation_kernel_full_uint8_cost_domain():
    # costs >= 128 ride as negative int8 bits into the kernel; the & 0xFF
    # recovery must keep parity with the jnp path over the full u8 range
    cost = jnp.asarray(RNG.integers(0, 256, (H, D, W), dtype=np.uint8))
    img = jnp.asarray(RNG.integers(0, 256, (H, W), dtype=np.uint8))
    opt = SGMOptions(max_disparity=D)
    want = np.asarray(aggregation.aggregate_paths(cost, img, opt))
    got = np.asarray(pk.aggregate_paths(cost, img, opt, block_rows=8))
    np.testing.assert_array_equal(want, got)


def test_scan_group_int16_compute_bit_equal():
    # the packed-int16 recurrence must match int32 over the FULL uint8 cost
    # domain: max intermediates are cs <= 255, m <= 255, cost+m-pmin <= 510,
    # 8-path totals <= 2040 — all within int16 (see _scan_group_kernel)
    hp = pk._round_up(H, 8)            # plain scans need a padded scan axis
    cost = jnp.asarray(RNG.integers(0, 256, (2, H, D, W), dtype=np.uint8)
                       ).astype(jnp.int8)
    cost = jnp.pad(cost, ((0, 0), (0, hp - H), (0, 0), (0, 0)))
    img = jnp.asarray(RNG.integers(0, 256, (2, H, W)).astype(np.int32))
    for rolls, rev in (((0, 1, -1), False), ((0, -1, 1), True), ((0,), True)):
        p2 = pk._p2_planes(img, rolls, -1 if rev else +1, 10, 150)
        p2 = jnp.pad(p2, ((0, 0), (0, hp - H), (0, 0), (0, 0)))
        args = (cost, p2, None, rolls, rev, 10, False, 8)
        want = np.asarray(pk._directional_scan_group(*args))
        got = np.asarray(pk._directional_scan_group(*args, compute16=True))
        np.testing.assert_array_equal(want, got)

    # int16 must be refused when the penalties could overflow it: with
    # p2_init ~40000 the pmin+P2 intermediate exceeds int16, so the gate
    # must fall back to int32 and stay bit-exact (int16 would wrap here
    # even in interpret mode, so this asserts the gate, not luck)
    assert not pk.int16_safe(10, 40_000)
    big = SGMOptions(max_disparity=D, p2_init=40_000)
    costu8 = (np.asarray(cost[:, :H]).astype(np.int32) & 0xFF
              ).astype(np.uint8)
    want_big = np.asarray(aggregation.aggregate_paths(
        jnp.asarray(costu8[0]), jnp.asarray(img[0], jnp.uint8), big))
    got_big = np.asarray(pk.aggregate_paths(
        jnp.asarray(costu8[0]), jnp.asarray(img[0], jnp.uint8), big,
        block_rows=8, compute16=True))
    np.testing.assert_array_equal(want_big, got_big)

    # carry-aware scans: int16 compute behind the int32 carry interface
    rolls = (0, 1, -1)
    p2 = jnp.pad(pk._p2_planes(img, rolls, +1, 10, 150),
                 ((0, 0), (0, hp - H), (0, 0), (0, 0)))

    # scan-step software unroll (the other A/B knob): pure scheduling, must
    # be bit-identical in every compute width
    args = (cost, p2, None, rolls, False, 10, False, 8)
    base = np.asarray(pk._directional_scan_group(*args))
    for kw in ({"unroll": 2}, {"unroll": 2, "compute16": True}):
        np.testing.assert_array_equal(
            base, np.asarray(pk._directional_scan_group(*args, **kw)))
    cin = (jnp.asarray(RNG.integers(0, 256, (2, 3, D, W)).astype(np.int32)),
           jnp.asarray(RNG.integers(0, 256, (2, 3, 1, W)).astype(np.int32)))
    for kwargs in ({"carry_in": cin, "want_carry": True},
                   {"want_carry": True}):
        w32 = pk._directional_scan_group(cost, p2, None, rolls, False, 10,
                                         False, 8, **kwargs)
        w16 = pk._directional_scan_group(cost, p2, None, rolls, False, 10,
                                         False, 8, compute16=True, **kwargs)
        np.testing.assert_array_equal(np.asarray(w32[0]), np.asarray(w16[0]))
        for a, b in zip(w32[1], w16[1]):
            assert a.dtype == b.dtype == jnp.int32
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_group_carry_nondividing_chunk():
    # carry-aware scans whose VMEM chunk does NOT divide the scan length
    # take the padded partial-chunk path (_carry_block_rows + s_true): the
    # kernel must stop each chunk at its valid row count so padded rows
    # never step the DP carry.  s=37 with block_rows=8 pads to 40 with a
    # 5-row final chunk (forward) / first chunk (reverse).
    s = H
    cost = jnp.asarray(RNG.integers(0, 256, (2, s, D, W),
                                    dtype=np.uint8)).astype(jnp.int8)
    img = jnp.asarray(RNG.integers(0, 256, (2, s, W)).astype(np.int32))
    hp = pk._round_up(s, 8)
    pad = ((0, 0), (0, hp - s), (0, 0), (0, 0))
    for rolls, rev in (((0, 1, -1), False), ((0, -1, 1), True),
                       ((0,), False)):
        p2 = pk._p2_planes(img, rolls, -1 if rev else +1, 10, 150)
        # ground truth: the plain (fresh-start) scan on the padded axis
        want = np.asarray(pk._directional_scan_group(
            jnp.pad(cost, pad), jnp.pad(p2, pad), None, rolls, rev, 10,
            False, 8))[:, :s]
        for c16 in (False, True):
            got, cout = pk._directional_scan_group(
                cost, p2, None, rolls, rev, 10, False, 8,
                want_carry=True, compute16=c16)
            assert got.shape[1] == s
            np.testing.assert_array_equal(want, np.asarray(got))

            # carry-out through the partial chunk: scanning the two halves
            # with the boundary carry chained must reproduce the one-shot
            # outputs AND its outgoing state (the cross-tile contract)
            cut = 24 if not rev else 13      # halves that need padding too
            lo, hi = (slice(None, cut), slice(cut, None))
            first, second = (lo, hi) if not rev else (hi, lo)
            o1, c1 = pk._directional_scan_group(
                cost[:, first], p2[:, first], None, rolls, rev, 10, False,
                8, want_carry=True, compute16=c16)
            o2, c2 = pk._directional_scan_group(
                cost[:, second], p2[:, second], None, rolls, rev, 10,
                False, 8, carry_in=c1, want_carry=True, compute16=c16)
            np.testing.assert_array_equal(np.asarray(got[:, first]),
                                          np.asarray(o1))
            np.testing.assert_array_equal(np.asarray(got[:, second]),
                                          np.asarray(o2))
            for a, b in zip(cout, c2):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
