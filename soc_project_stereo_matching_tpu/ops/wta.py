"""Winner-take-all disparity, uniqueness test, subpixel refinement — JAX ops.

Reference: ``SemiGlobalMatching.c:374-443`` (ComputeDisparity).  Semantics
preserved exactly:

* first-minimum tie-breaking over d (argmin);
* ``inverse=True`` derives the right-view disparity from the *left*
  aggregated volume by sampling cost(i, j+d, d) (``:394-409``), out-of-range
  columns costing UINT16_MAX;
* uniqueness: invalid iff ``sec_min - min <= (uint16)(min * (1 - ratio))``
  with float32 arithmetic and trunc-toward-zero (``:412-426``);
* border disparities (dmin, dmax-1) invalidated (``:428-431``);
* parabolic subpixel with the reference's int16 casts and denominator
  clamped to >= 1 (``:432-440``); invalid = +inf.

Split into ``wta_reduce`` (the O(H*D*W) volume reduction — the part worth
a Pallas kernel) and ``finalize_disparity`` (O(H*W) exact elementwise math,
shared by the jnp and Pallas paths).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SGMOptions
from .exact_math import div_s32_correctly_rounded

_INF = float("inf")  # lazily converted; avoids backend init at import time
_UINT16_MAX = 65535


class WTAPlanes(NamedTuple):
    """Per-pixel volume reductions, all int32 (..., H, W)."""

    best_idx: jnp.ndarray   # first argmin over the d index
    min_cost: jnp.ndarray
    sec_min: jnp.ndarray    # min over d != best_idx
    c1: jnp.ndarray         # cost at clip(best-1)
    c2: jnp.ndarray         # cost at clip(best+1)


def _to_int16(x: jnp.ndarray) -> jnp.ndarray:
    """C int16 cast emulation on int32 values."""
    return ((x + 32768) & 0xFFFF) - 32768


def _inverse_cost_view(aggr: jnp.ndarray, min_disparity: int, max_disparity: int) -> jnp.ndarray:
    """cost_local[h, d, j] = aggr[h, d, j + d] (right-view sampling)."""
    w = aggr.shape[-1]
    slices = []
    cols = jnp.arange(w)
    for idx, d in enumerate(range(min_disparity, max_disparity)):
        if 0 <= d <= w:
            shifted = jnp.pad(aggr[..., idx, d:], [(0, 0)] * (aggr.ndim - 2) + [(0, d)])
        elif d < 0 and -d <= w:
            shifted = jnp.pad(aggr[..., idx, :w + d], [(0, 0)] * (aggr.ndim - 2) + [(-d, 0)])
        else:
            shifted = jnp.zeros_like(aggr[..., idx, :])
        valid = (cols + d >= 0) & (cols + d < w)
        slices.append(jnp.where(valid, shifted.astype(jnp.int32), _UINT16_MAX))
    return jnp.stack(slices, axis=-2)


def wta_reduce(
    aggr: jnp.ndarray,
    options: SGMOptions,
    inverse: bool = False,
) -> WTAPlanes:
    """aggr (..., H, D, W) uint16 -> per-pixel reduction planes (jnp path)."""
    dmin, dmax = options.min_disparity, options.max_disparity
    cost = (
        _inverse_cost_view(aggr, dmin, dmax) if inverse else aggr.astype(jnp.int32)
    )

    best_idx = jnp.argmin(cost, axis=-2)                       # first min
    min_cost = jnp.min(cost, axis=-2)

    drange = dmax - dmin
    onehot = best_idx[..., None, :] == jnp.arange(drange)[:, None]
    sec_min = jnp.min(jnp.where(onehot, 1 << 30, cost), axis=-2)

    idx1 = jnp.clip(best_idx - 1, 0, drange - 1)
    idx2 = jnp.clip(best_idx + 1, 0, drange - 1)
    c1 = jnp.take_along_axis(cost, idx1[..., None, :], axis=-2)[..., 0, :]
    c2 = jnp.take_along_axis(cost, idx2[..., None, :], axis=-2)[..., 0, :]
    return WTAPlanes(best_idx.astype(jnp.int32), min_cost, sec_min, c1, c2)


def finalize_disparity(planes: WTAPlanes, options: SGMOptions) -> jnp.ndarray:
    """Reduction planes -> float32 disparity with uniqueness/border/subpixel,
    bit-equal to the reference (O(H*W) elementwise)."""
    dmin, dmax = options.min_disparity, options.max_disparity
    best_disp = planes.best_idx + dmin
    min_cost = planes.min_cost

    invalid = jnp.zeros(best_disp.shape, dtype=bool)
    if options.is_check_unique:
        thresh = jnp.trunc(
            min_cost.astype(jnp.float32)
            * (jnp.float32(1.0) - jnp.float32(options.uniqueness_ratio))
        ).astype(jnp.int32)
        invalid |= (planes.sec_min - min_cost) <= thresh

    invalid |= (best_disp == dmin) | (best_disp == dmax - 1)

    c1 = _to_int16(planes.c1)
    c2 = _to_int16(planes.c2)
    denom = jnp.maximum(_to_int16(c1 + c2 - 2 * min_cost), 1)
    # correctly-rounded division: TPU's approximate f32 divide is context-
    # dependent and the quotient sits exactly on .5 boundaries whenever a
    # neighbour ties the minimum (see ops/exact_math.py)
    sub = div_s32_correctly_rounded(c1 - c2, denom * 2)
    disp = best_disp.astype(jnp.float32) + sub
    return jnp.where(invalid, _INF, disp)


@functools.partial(jax.jit, static_argnames=("options", "inverse"))
def compute_disparity(
    aggr: jnp.ndarray,
    options: SGMOptions,
    inverse: bool = False,
) -> jnp.ndarray:
    """aggr (..., H, D, W) uint16 -> float32 disparity (..., H, W)."""
    return finalize_disparity(wta_reduce(aggr, options, inverse), options)
