"""Bit-exact numpy oracle of the reference SGM pipeline.

This module is the *contract* for the TPU implementation: a slow, readable,
integer-exact transcription of the semantics of the reference C core
(``SemiGlobalMatching/SemiGlobalMatching/SemiGlobalMatching.c``), validated
against goldens produced by compiling and running that C code (see
``tests/golden/``).  Every op in ``soc_project_stereo_matching_tpu.ops`` is
unit-tested for exact equality against this oracle.

Reference semantics intentionally preserved (file:line cites refer to the
reference repo):

* census 5x5 compares ``gray < gray_center`` strictly, includes the centre
  pixel (always a 0 bit) and never writes the 2-px border, which stays 0
  (``SemiGlobalMatching.c:134-159``).
* matching cost: Hamming distance of census codes; out-of-range ``j-d``
  yields cost ``UINT8_MAX/2 = 127`` (``:161-183``).
* aggregation recurrence with adaptive P2 ``max(P1, P2_init/(|dI|+1))``
  (``:329-351``), result truncated to uint8 **mod 256** (``:343``), u16
  accumulation across 8 paths, 255 sentinels at d=-1 and d=D (``:260-269``).
* the diagonal passes wrap around image edges, snaking onto the next row
  (``:297-322``).  Each diagonal "path" therefore visits
  ``col = (start ± step) mod W`` — i.e. the diagonal scan is exactly a
  vertical scan whose per-column carry is circularly rolled by +-1 each row.
  That re-derivation (used verbatim by the TPU kernels) is what this oracle
  implements; it is bit-identical to the reference's pointer-walking loops.
* WTA with first-minimum tie-breaking, uniqueness test
  ``sec - min <= (uint16)(min * (1 - ratio))`` (``:412-426``), border
  disparity invalidation (``:428-431``), parabolic subpixel with int16 casts
  and denominator clamped to >= 1 (``:432-440``).
* right disparity derived from the *left* aggregated volume by indexing
  ``(i, j+d, d)`` (``:394-409``), not a second aggregation.
* LR check truncates ``j - disp + 0.5`` toward zero and keeps pixels whose
  right counterpart is itself invalid (``:445-470``).
* speckle removal: 8-connected components under pairwise ``|dd| <= diff``
  with ``diff_insame = 1`` (hardcoded at ``:115``), area < min_speckle_area
  invalidated (``:585-642``).
* median filter 3x3 applied **in place** (``SGM_Match``, ``:120``): later
  pixels read already-filtered neighbours.  ``median_inplace=False`` gives
  the standard out-of-place filter used by the TPU pipeline.

Layout note: cost volumes here are ``(H, D, W)`` — disparity on the sublane
axis, width on the lane axis — the canonical layout of the TPU kernels.
"""

from __future__ import annotations

from collections import deque
from typing import Tuple

import numpy as np

from .config import INVALID_FLOAT, SGMOptions

__all__ = [
    "census_5x5",
    "hamming_cost_volume",
    "aggregate_paths",
    "compute_disparity",
    "lr_check",
    "remove_speckles",
    "median_filter_3x3",
    "sgm_match",
]


# ---------------------------------------------------------------------------
# Census transform
# ---------------------------------------------------------------------------

def census_5x5(img: np.ndarray) -> np.ndarray:
    """5x5 census transform -> 25-bit signature in uint32.

    Bit order matches the reference: the (-2,-2) neighbour is the MSB of the
    25-bit word; the centre contributes a guaranteed-zero bit in the middle.
    """
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape
    census = np.zeros((h, w), dtype=np.uint32)
    if h <= 5 or w <= 5:
        return census
    center = img[2:h - 2, 2:w - 2].astype(np.int32)
    val = np.zeros_like(center, dtype=np.uint32)
    for r in range(-2, 3):
        for c in range(-2, 3):
            val <<= np.uint32(1)
            neigh = img[2 + r:h - 2 + r, 2 + c:w - 2 + c].astype(np.int32)
            val |= (neigh < center).astype(np.uint32)
    census[2:h - 2, 2:w - 2] = val
    return census


# ---------------------------------------------------------------------------
# Matching cost (Hamming distance of census codes)
# ---------------------------------------------------------------------------

def _popcount32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> np.uint32(24)).astype(np.uint8)


def hamming_cost_volume(
    census_left: np.ndarray,
    census_right: np.ndarray,
    min_disparity: int,
    max_disparity: int,
) -> np.ndarray:
    """Initial cost volume, layout (H, D, W), dtype uint8.

    cost[i, d - dmin, j] = popcount(cl[i, j] ^ cr[i, j - d]); out-of-range
    source columns get UINT8_MAX/2 = 127.
    """
    h, w = census_left.shape
    drange = max_disparity - min_disparity
    cost = np.full((h, drange, w), 127, dtype=np.uint8)
    cols = np.arange(w)
    for d in range(min_disparity, max_disparity):
        src = cols - d
        valid = (src >= 0) & (src < w)
        ham = _popcount32(census_left[:, valid] ^ census_right[:, src[valid]])
        cost[:, d - min_disparity, valid] = ham
    return cost


# ---------------------------------------------------------------------------
# Path aggregation
# ---------------------------------------------------------------------------

def _scan_group(
    cost: np.ndarray,
    img: np.ndarray,
    p1: int,
    p2_init: int,
    reverse: bool,
    roll: int,
) -> np.ndarray:
    """One directional DP pass over a (S, D, P) cost view.

    ``roll`` in {-1, 0, +1}: circular shift applied to the per-path carry at
    every step, which realises the reference's wrapping diagonal paths
    (0 = straight vertical/horizontal scan).

    Returns the uint16 contribution L_r with the same (S, D, P) layout.
    """
    s_len, drange, p_len = cost.shape
    c = cost.astype(np.int32)
    g = img.astype(np.int32)
    if reverse:
        c = c[::-1]
        g = g[::-1]

    out = np.zeros((s_len, drange, p_len), dtype=np.uint16)

    # First pixel of every path: aggr += cost, carry = cost.
    carry = c[0].copy()                      # (D, P) int32
    mincost = carry.min(axis=0)              # (P,)
    gray_last = g[0].copy()                  # (P,)
    out[0] = carry.astype(np.uint16)

    big = np.int32(255)
    for s in range(1, s_len):
        if roll:
            carry = np.roll(carry, roll, axis=1)
            mincost = np.roll(mincost, roll)
            gray_last = np.roll(gray_last, roll)
        gray = g[s]
        # adaptive P2' = max(P1, P2_init // (|dI| + 1))  (int division)
        p2 = np.maximum(np.int32(p1), np.int32(p2_init) // (np.abs(gray - gray_last) + 1))

        l1 = carry
        l2 = np.concatenate([np.full((1, p_len), big), carry[:-1]], axis=0) + p1
        l3 = np.concatenate([carry[1:], np.full((1, p_len), big)], axis=0) + p1
        l4 = (mincost + p2)[None, :]
        m = np.minimum(np.minimum(l1, l2), np.minimum(l3, l4))
        # uint8 truncation of the per-path cost (SemiGlobalMatching.c:343)
        cost_s = (c[s] + m - mincost[None, :]) & 0xFF
        out[s] = cost_s.astype(np.uint16)
        carry = cost_s
        mincost = cost_s.min(axis=0)
        gray_last = gray

    if reverse:
        out = out[::-1]
    return out


def _step_recurrence(carry, mincost, cost_cur, p2, p1):
    """One DP step shared by all scan variants (int32 arrays, (D,...) leading).

    Returns the mod-256-truncated cost_s (SemiGlobalMatching.c:329-351).
    """
    big = np.int32(255)
    pad_shape = (1,) + carry.shape[1:]
    l1 = carry
    l2 = np.concatenate([np.full(pad_shape, big), carry[:-1]], axis=0) + p1
    l3 = np.concatenate([carry[1:], np.full(pad_shape, big)], axis=0) + p1
    l4 = mincost + p2
    m = np.minimum(np.minimum(l1, l2), np.minimum(l3, l4))
    return (cost_cur + m - mincost) & 0xFF


def _walk_diagonal(aggr_flat, cost_flat, img_flat, h, w, dx, dy, p1, p2_init):
    """Bit-exact replica of the reference's diagonal CostAggregate pointer
    walk (SemiGlobalMatching.c:229-372) — including its bugs:

    * after any wrap, the tracked ``current_col`` is off by one relative to
      the actual pointer position, so subsequent wraps fire a step early and
      skip a column (``:297-310`` update col, then ``:359-367`` increment it
      again);
    * the path starting at the "wrong" edge for its direction (e.g. the
      down-right path at column 0) matches the opposite edge's wrap
      condition on its first step and shoots off along a shifted diagonal,
      eventually stepping out of bounds; the reference's final stray row
      write lands outside cost_aggr (into adjacent globals).  Here
      out-of-bounds writes are discarded, which equals the observable
      behaviour of the reference when its buffers are padded (see
      tests/golden/generate.py).

    Operates on flat (H*W, D) views, accumulating into ``aggr_flat``.
    """
    is_forward = (dx, dy) in ((1, 0), (0, 1), (1, 1), (-1, 1))
    direction = 1 if is_forward else -1
    npx = h * w
    for i in range(w):
        row = 0 if is_forward else h - 1
        col = i
        idx = row * w + col
        carry = cost_flat[idx].astype(np.int32)
        aggr_flat[idx] += carry.astype(np.uint16)
        mincost = int(carry.min())
        gray_last = int(img_flat[idx])
        for _ in range(h - 1):
            if (is_forward and col == w - 1 and row < h - 1) or \
               (not is_forward and col == w - 1 and row > 0):
                idx = (row + direction) * w
                col = 0
            elif (not is_forward and col == 0 and row > 0) or \
                 (is_forward and col == 0 and row < h - 1):
                idx = (row + direction) * w + (w - 1)
                col = w - 1
            elif (dx == 1 and dy == 1) or (dx == -1 and dy == -1):
                idx += direction * (w + 1)
            else:
                idx += direction * (w - 1)
            in_bounds = 0 <= idx < npx
            gray = int(img_flat[idx]) if in_bounds else 0
            cost_cur = cost_flat[idx].astype(np.int32) if in_bounds \
                else np.zeros_like(carry)
            p2 = max(p1, p2_init // (abs(gray - gray_last) + 1))
            cost_s = _step_recurrence(carry, np.int32(mincost), cost_cur,
                                      np.int32(p2), np.int32(p1))
            if in_bounds:
                aggr_flat[idx] += cost_s.astype(np.uint16)
            carry = cost_s
            mincost = int(cost_s.min())
            gray_last = gray
            row += direction
            col += -direction if (dx, dy) in ((-1, 1), (1, -1)) else direction


def aggregate_paths_reference_walk(
    cost: np.ndarray,
    img_left: np.ndarray,
    options: SGMOptions,
) -> np.ndarray:
    """Bug-exact aggregation used only for golden parity tests.

    Horizontal/vertical passes are clean in the reference and share the
    vectorised scan; the four diagonal passes replay the reference's
    pointer walk verbatim (see _walk_diagonal).
    """
    h, d, w = cost.shape
    aggr = np.zeros((h, d, w), dtype=np.uint16)
    p1, p2 = options.p1, options.p2_init

    cost_t = cost.transpose(2, 1, 0)
    img_t = img_left.T
    aggr += _scan_group(cost_t, img_t, p1, p2, reverse=False, roll=0).transpose(2, 1, 0)
    aggr += _scan_group(cost_t, img_t, p1, p2, reverse=True, roll=0).transpose(2, 1, 0)
    aggr += _scan_group(cost, img_left, p1, p2, reverse=False, roll=0)
    aggr += _scan_group(cost, img_left, p1, p2, reverse=True, roll=0)

    aggr_flat = aggr.transpose(0, 2, 1).reshape(h * w, d)  # (H*W, D) view-copy
    cost_flat = np.ascontiguousarray(cost.transpose(0, 2, 1).reshape(h * w, d))
    img_flat = img_left.reshape(-1)
    for dx, dy in ((1, 1), (-1, -1), (1, -1), (-1, 1)):
        _walk_diagonal(aggr_flat, cost_flat, img_flat, h, w, dx, dy, p1, p2)
    return aggr_flat.reshape(h, w, d).transpose(0, 2, 1)


def aggregate_paths(
    cost: np.ndarray,
    img_left: np.ndarray,
    options: SGMOptions,
) -> np.ndarray:
    """Sum of directional DP passes; (H, D, W) uint16.

    num_paths == 8 runs all directions; 4 runs the horizontal/vertical ones.
    (The reference always runs all 8 regardless of the option field — we run
    8 when num_paths == 8 to match, and expose 4 as the documented subset.)
    """
    h, d, w = cost.shape
    aggr = np.zeros((h, d, w), dtype=np.uint16)
    p1, p2 = options.p1, options.p2_init

    cost_t = cost.transpose(2, 1, 0)       # (W, D, H) view for horizontal scans
    img_t = img_left.T

    # horizontal -> and <-  (paths = rows; scan over W)
    aggr += _scan_group(cost_t, img_t, p1, p2, reverse=False, roll=0).transpose(2, 1, 0)
    aggr += _scan_group(cost_t, img_t, p1, p2, reverse=True, roll=0).transpose(2, 1, 0)
    # vertical v and ^  (paths = columns; scan over H)
    aggr += _scan_group(cost, img_left, p1, p2, reverse=False, roll=0)
    aggr += _scan_group(cost, img_left, p1, p2, reverse=True, roll=0)

    if options.num_paths == 8:
        # wrapping diagonals (see module docstring)
        aggr += _scan_group(cost, img_left, p1, p2, reverse=False, roll=+1)  # (1,1)
        aggr += _scan_group(cost, img_left, p1, p2, reverse=True, roll=-1)   # (-1,-1)
        aggr += _scan_group(cost, img_left, p1, p2, reverse=True, roll=+1)   # (1,-1)
        aggr += _scan_group(cost, img_left, p1, p2, reverse=False, roll=-1)  # (-1,1)
    return aggr


# ---------------------------------------------------------------------------
# Winner-take-all disparity + uniqueness + subpixel
# ---------------------------------------------------------------------------

def _to_int16(x: np.ndarray) -> np.ndarray:
    return ((x.astype(np.int64) + 32768) % 65536 - 32768).astype(np.int64)


def compute_disparity(
    aggr: np.ndarray,
    options: SGMOptions,
    inverse: bool = False,
) -> np.ndarray:
    """WTA disparity from the aggregated volume; float32 (H, W).

    ``inverse=True`` derives the right-view disparity from the *left*
    aggregated volume by sampling cost(i, j+d, d).
    """
    h, drange, w = aggr.shape
    dmin, dmax = options.min_disparity, options.max_disparity
    a = aggr.astype(np.int64)

    if not inverse:
        cost_local = a                                     # (H, D, W)
    else:
        cost_local = np.full((h, drange, w), 65535, dtype=np.int64)
        cols = np.arange(w)
        for di in range(drange):
            col_left = cols + (dmin + di)
            valid = (col_left >= 0) & (col_left < w)
            cost_local[:, di, valid] = a[:, di, col_left[valid]]

    best_idx = cost_local.argmin(axis=1)                   # (H, W) first min
    min_cost = np.take_along_axis(cost_local, best_idx[:, None, :], axis=1)[:, 0, :]
    best_disp = best_idx + dmin

    disp = np.zeros((h, w), dtype=np.float32)
    invalid = np.zeros((h, w), dtype=bool)

    if options.is_check_unique:
        masked = cost_local.copy()
        np.put_along_axis(masked, best_idx[:, None, :], 1 << 30, axis=1)
        sec_min = masked.min(axis=1)
        # (uint16)(min * (1 - ratio)) with float32 arithmetic, trunc toward 0
        thresh = np.trunc(
            min_cost.astype(np.float32)
            * (np.float32(1.0) - np.float32(options.uniqueness_ratio))
        ).astype(np.int64)
        invalid |= (sec_min - min_cost) <= thresh

    invalid |= (best_disp == dmin) | (best_disp == dmax - 1)

    # parabolic subpixel with the reference's int16 casts
    idx1 = np.clip(best_idx - 1, 0, drange - 1)
    idx2 = np.clip(best_idx + 1, 0, drange - 1)
    c1 = _to_int16(np.take_along_axis(cost_local, idx1[:, None, :], axis=1)[:, 0, :])
    c2 = _to_int16(np.take_along_axis(cost_local, idx2[:, None, :], axis=1)[:, 0, :])
    denom = _to_int16(c1 + c2 - 2 * min_cost)
    denom = np.maximum(denom, 1)
    sub = (c1 - c2).astype(np.float32) / (denom.astype(np.float32) * np.float32(2.0))
    disp = best_disp.astype(np.float32) + sub
    disp[invalid] = INVALID_FLOAT
    return disp


# ---------------------------------------------------------------------------
# Post-processing
# ---------------------------------------------------------------------------

def lr_check(disp_left: np.ndarray, disp_right: np.ndarray, thres: float) -> np.ndarray:
    """Invalidate left disparities inconsistent with the right map."""
    h, w = disp_left.shape
    out = disp_left.copy()
    cols = np.arange(w, dtype=np.float32)[None, :]
    valid = np.isfinite(disp_left)
    dl = np.where(valid, disp_left, 0.0).astype(np.float32)
    # (int32)(j - disp + 0.5): C cast truncates toward zero
    col_right = np.trunc(cols - dl + np.float32(0.5)).astype(np.int64)
    in_range = (col_right >= 0) & (col_right < w)

    cr = np.clip(col_right, 0, w - 1)
    disp_r = np.take_along_axis(disp_right, cr, axis=1)
    dr = np.where(np.isfinite(disp_r), disp_r, 0.0).astype(np.float32)
    # C computes fabs((float)(disp - disp_r)) — the subtraction rounds to
    # float32 BEFORE the threshold compare.  This matters: Wood2 has LR
    # pairs whose exact difference is 1.0000000596 (half an ulp above 1.0),
    # which float32 round-half-even lands on exactly 1.0 -> kept, while a
    # float64 subtraction would kill them (LRCheck, SemiGlobalMatching.c:461).
    mismatch = np.abs(dl - dr) > np.float32(thres)
    kill = valid & (
        (~in_range) | (in_range & np.isfinite(disp_r) & mismatch)
    )
    out[kill] = INVALID_FLOAT
    return out


def remove_speckles(disp: np.ndarray, diff_insame: float, min_area: int) -> np.ndarray:
    """8-connected components under pairwise |dd| <= diff; area < min_area
    invalidated.  Order-independent (the relation is symmetric)."""
    h, w = disp.shape
    out = disp.copy()
    visited = np.zeros((h, w), dtype=bool)
    finite = np.isfinite(disp)
    for i in range(h):
        for j in range(w):
            if visited[i, j] or not finite[i, j]:
                continue
            comp = [(i, j)]
            visited[i, j] = True
            q = deque([(i, j)])
            while q:
                r, c = q.popleft()
                base = disp[r, c]
                for dr in (-1, 0, 1):
                    for dc in (-1, 0, 1):
                        if dr == 0 and dc == 0:
                            continue
                        rr, cc = r + dr, c + dc
                        if 0 <= rr < h and 0 <= cc < w and not visited[rr, cc] \
                                and finite[rr, cc] \
                                and abs(float(disp[rr, cc]) - float(base)) <= diff_insame:
                            visited[rr, cc] = True
                            comp.append((rr, cc))
                            q.append((rr, cc))
            if len(comp) < min_area:
                for r, c in comp:
                    out[r, c] = INVALID_FLOAT
    return out


def median_filter_3x3(disp: np.ndarray, inplace: bool = False) -> np.ndarray:
    """3x3 median, 1-px border untouched.

    ``inplace=True`` reproduces the reference's raster-scan in-place call
    (out == in), where each output reads already-filtered neighbours above
    and to the left.
    """
    h, w = disp.shape
    if not inplace:
        out = disp.copy()
        win = np.stack(
            [disp[1 + r:h - 1 + r, 1 + c:w - 1 + c]
             for r in (-1, 0, 1) for c in (-1, 0, 1)],
            axis=0,
        )
        out[1:h - 1, 1:w - 1] = np.sort(win, axis=0)[4]
        return out

    buf = disp.copy()
    for i in range(1, h - 1):
        r0, r1, r2 = buf[i - 1], buf[i], buf[i + 1]
        for j in range(1, w - 1):
            vals = sorted((r0[j - 1], r0[j], r0[j + 1],
                           r1[j - 1], r1[j], r1[j + 1],
                           r2[j - 1], r2[j], r2[j + 1]))
            r1[j] = vals[4]
    return buf


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

def sgm_match(
    img_left: np.ndarray,
    img_right: np.ndarray,
    options: SGMOptions = SGMOptions(),
    return_intermediates: bool = False,
):
    """Full SGM pipeline mirroring ``SGM_Match`` (SemiGlobalMatching.c:68-125)."""
    cl = census_5x5(img_left)
    cr = census_5x5(img_right)
    cost = hamming_cost_volume(cl, cr, options.min_disparity, options.max_disparity)
    aggr = aggregate_paths(cost, img_left, options)
    disp_left = compute_disparity(aggr, options, inverse=False)
    disp_right = None
    if options.is_check_lr:
        disp_right = compute_disparity(aggr, options, inverse=True)
        disp_left = lr_check(disp_left, disp_right, options.lrcheck_thres)
    if options.is_remove_speckles:
        disp_left = remove_speckles(disp_left, 1.0, options.min_speckle_area)
    disp_left = median_filter_3x3(disp_left, inplace=options.median_inplace)
    if return_intermediates:
        return {
            "census_left": cl,
            "census_right": cr,
            "cost_init": cost,
            "cost_aggr": aggr,
            "disp_right": disp_right,
            "disp_left": disp_left,
        }
    return disp_left
