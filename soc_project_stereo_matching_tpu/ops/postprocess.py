"""Disparity post-processing: LR consistency, speckle removal, median —
JAX ops.

References:
* LRCheck            ``SemiGlobalMatching.c:445-470``
* RemoveSpeckles     ``SemiGlobalMatching.c:585-642`` (BFS flood fill)
* MedianFilter       ``SemiGlobalMatching.c:496-557``

Speckle removal is the one data-dependent-control-flow component of the
pipeline.  The reference grows regions with a BFS queue; the connectivity
relation (8-neighbours, both valid, |dd| <= diff) is symmetric, so the
result is exactly connected-component labelling.  On TPU this becomes
iterative **min-label propagation with pointer jumping** inside a
``lax.while_loop`` — O(log diameter) gather/min rounds, converging to the
per-component minimum index, after which a segment count invalidates small
components.  Bit-identical to the reference BFS by construction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SGMOptions

_INF = float("inf")  # lazily converted; avoids backend init at import time

_OFFSETS8 = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


@partial(jax.jit, static_argnames=("thres", "max_shift"))
def lr_check(
    disp_left: jnp.ndarray,
    disp_right: jnp.ndarray,
    thres: float,
    max_shift: int,
) -> jnp.ndarray:
    """Invalidate left disparities inconsistent with the right map.

    Keeps pixels whose right counterpart is itself invalid (the reference
    ``continue``s in that case, :457-460).

    TPU note: ``disp_right[j - round(disp)]`` is a per-lane gather, which
    TPU executes near-serially.  Since the shift is bounded by the
    disparity range, it is instead computed as a (max_shift+2)-way select
    over lane-rolled copies of the right map — pure VPU work.  max_shift
    must therefore bound the disparity values present (callers pass
    ``options.max_disparity``); it is required because a silent W-sized
    default would cost O(W) rolled copies."""
    if max_shift <= 0:
        raise ValueError(
            f"max_shift={max_shift}: pass the disparity bound "
            "(e.g. options.max_disparity) — it sizes the roll-select")
    w = disp_left.shape[-1]
    cols = jnp.arange(w, dtype=jnp.float32)
    valid = jnp.isfinite(disp_left)
    dl = jnp.where(valid, disp_left, 0.0)
    # (int32)(j - disp + 0.5) truncates toward zero
    col_right = jnp.trunc(cols - dl + jnp.float32(0.5)).astype(jnp.int32)
    in_range = (col_right >= 0) & (col_right < w)

    shift = jnp.arange(w, dtype=jnp.int32) - col_right   # j - col_right
    disp_r = jnp.zeros_like(disp_right)
    for k in range(-1, min(max_shift, w - 1) + 2):
        disp_r = jnp.where(shift == k, jnp.roll(disp_right, k, axis=-1), disp_r)

    dr = jnp.where(jnp.isfinite(disp_r), disp_r, 0.0)
    mismatch = jnp.abs(dl - dr) > jnp.float32(thres)
    kill = valid & (~in_range | (jnp.isfinite(disp_r) & mismatch))
    return jnp.where(kill, _INF, disp_left)


def _shift2d(x: jnp.ndarray, dr: int, dc: int, fill):
    """Shift so out[r, c] = x[r + dr, c + dc], padding with `fill`."""
    pad = [(max(0, -dr), max(0, dr)), (max(0, -dc), max(0, dc))]
    padded = jnp.pad(x, pad, constant_values=fill)
    h, w = x.shape
    return padded[max(0, dr):max(0, dr) + h, max(0, dc):max(0, dc) + w]


def _segmented_min_scan(labels: jnp.ndarray, connected: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Min over each maximal run of `connected` elements, along `axis`.

    connected[k] = True iff element k links to element k-1 along the axis
    (connected[0] is ignored/False).  Gather-free: two log-depth
    ``associative_scan`` passes (forward + reverse) of the standard
    segmented-min operator (reset, value)."""
    reset = ~connected
    # Force a reset at position 0 so runs never wrap.
    idx0 = jax.lax.broadcasted_iota(jnp.int32, labels.shape, axis % labels.ndim)
    reset = reset | (idx0 == 0)

    def combine(a, b):
        ra, va = a
        rb, vb = b
        return ra | rb, jnp.where(rb, vb, jnp.minimum(va, vb))

    _, fwd = jax.lax.associative_scan(combine, (reset, labels), axis=axis)
    # Backward pass: element k links to k+1 iff connected[k+1].
    reset_b = jnp.flip(~jnp.roll(connected, -1, axis=axis), axis=axis)
    reset_b = reset_b | (idx0 == 0)
    _, bwd = jax.lax.associative_scan(
        combine, (reset_b, jnp.flip(labels, axis=axis)), axis=axis)
    return jnp.minimum(fwd, jnp.flip(bwd, axis=axis))


@partial(jax.jit, static_argnames=("min_area",))
def remove_speckles(
    disp: jnp.ndarray,
    diff_insame: float = 1.0,
    min_area: int = 50,
) -> jnp.ndarray:
    """Connected-component speckle filter, exact w.r.t. the reference BFS.

    The reference grows regions with a scalar BFS queue; connectivity
    (8-neighbours, both valid, |dd| <= diff) is symmetric, so the result is
    exactly connected-component labelling.  Here labels (initialised to the
    pixel's flat index) converge to the per-component minimum by iterating
    gather-free min-propagation rounds in a ``while_loop``:

    * row pass: segmented min over horizontal runs (log-depth scan) —
      propagates across an entire row run in one round;
    * column pass: segmented min over vertical runs;
    * diagonal pass: masked 1-step shift-mins for the 4 diagonal edges.

    Convergence (no label changes anywhere) implies per-component-constant
    labels = the component minimum, so counts and the area test are exact.
    Real frames converge in a handful of rounds (one per "bend" in the
    worst component); each round is pure VPU work, no gathers.
    """
    h, w = disp.shape
    n = h * w
    finite = jnp.isfinite(disp)
    d = jnp.where(finite, disp, jnp.float32(1e30))
    diff = jnp.float32(diff_insame)

    # Run-connectivity along rows/cols: pixel links to its predecessor.
    conn_row = finite & jnp.roll(finite, 1, axis=1) \
        & (jnp.abs(d - jnp.roll(d, 1, axis=1)) <= diff)
    conn_col = finite & jnp.roll(finite, 1, axis=0) \
        & (jnp.abs(d - jnp.roll(d, 1, axis=0)) <= diff)

    # Diagonal edge masks (both endpoints valid, |dd| <= diff).
    diag = []
    for dr, dc in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
        nd = _shift2d(d, dr, dc, jnp.float32(1e30))
        nf = _shift2d(finite, dr, dc, False)
        diag.append((dr, dc, finite & nf & (jnp.abs(d - nd) <= diff)))

    labels0 = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    big = jnp.int32(n)

    def body(state):
        labels, _ = state
        new = _segmented_min_scan(labels, conn_row, axis=1)
        new = _segmented_min_scan(new, conn_col, axis=0)
        for dr, dc, edge in diag:
            nl = _shift2d(new, dr, dc, big)
            new = jnp.minimum(new, jnp.where(edge, nl, big))
        return (new, jnp.any(new != labels))

    labels, _ = jax.lax.while_loop(
        lambda s: s[1], body, (labels0, jnp.bool_(True)))

    counts = jnp.zeros((n,), dtype=jnp.int32).at[labels.reshape(-1)].add(
        finite.reshape(-1).astype(jnp.int32)
    )
    small = counts[labels] < min_area
    return jnp.where(finite & small, _INF, disp)


def _median9(planes):
    """Median of 9 equal-shape planes via Paeth's 19-exchange min/max
    network (straight-line VPU code; +inf orders correctly)."""
    p = list(planes)

    def ex(i, j):
        p[i], p[j] = jnp.minimum(p[i], p[j]), jnp.maximum(p[i], p[j])

    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        ex(i, j)
    return p[4]


@jax.jit
def median_filter_3x3_inplace(disp: jnp.ndarray) -> jnp.ndarray:
    """In-place (raster-recurrence) 3x3 median, bit-equal to the reference.

    The reference calls ``MedianFilter`` with ``in == out``
    (``SGM_Match``, SemiGlobalMatching.c:120), so the raster scan reads
    already-filtered values at (i-1, j-1), (i-1, j), (i-1, j+1) and
    (i, j-1) and raw values elsewhere.  Every such dependency has strictly
    smaller ``t = 2i + j`` (deltas -3, -2, -1, -1), so all pixels on one
    t-wavefront are independent: a ``fori_loop`` over t applies the median
    to one anti-slope-2 front per step — 2(H-2)+(W-2)-2 sequential steps
    of full-plane VPU work.  This is the exact-parity mode (the one
    reference behaviour an out-of-place filter cannot reproduce); the
    TPU-native default remains ``median_filter_3x3``.

    Accepts (..., H, W); the 1-px border is untouched.
    """
    h, w = disp.shape[-2], disp.shape[-1]
    if h < 3 or w < 3:
        return disp
    ri = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (ri >= 1) & (ri < h - 1) & (ci >= 1) & (ci < w - 1)

    def step(t, buf):
        # rolled neighbour reads only contaminate the border, never selected
        p = [jnp.roll(buf, (-r, -c), axis=(-2, -1))
             for r in (-1, 0, 1) for c in (-1, 0, 1)]
        med = _median9(p)
        mask = interior & (2 * ri + ci == t)
        return jnp.where(mask, med, buf)

    # interior t spans [2*1+1, 2*(h-2)+(w-2)]
    return jax.lax.fori_loop(3, 2 * (h - 2) + (w - 2) + 1, step, disp)


@jax.jit
def median_filter_3x3(disp: jnp.ndarray) -> jnp.ndarray:
    """Out-of-place 3x3 median; 1-px border untouched.

    Median-of-9 via Paeth's 19-exchange min/max network — a straight-line
    VPU program XLA fuses fully (jnp.sort materialises 9 sorted planes).
    +inf invalid markers order correctly under min/max.

    (The reference applies its median in place — a raster-scan recurrence;
    ``median_filter_3x3_inplace`` reproduces it exactly, see
    SGMOptions.median_inplace.  The out-of-place filter is the TPU-native
    default.)"""
    h, w = disp.shape[-2], disp.shape[-1]
    med = _median9([disp[..., 1 + r:h - 1 + r, 1 + c:w - 1 + c]
                    for r in (-1, 0, 1) for c in (-1, 0, 1)])
    return disp.at[..., 1:h - 1, 1:w - 1].set(med)
