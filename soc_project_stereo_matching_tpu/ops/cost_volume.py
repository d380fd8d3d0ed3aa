"""Matching-cost volume (Hamming distance of census codes) — JAX ops.

Reference: ``SemiGlobalMatching.c:161-196`` (ComputeCost / Hamming32).
cost[i, d, j] = popcount(censusL[i, j] ^ censusR[i, j - d]); out-of-range
source columns cost UINT8_MAX/2 = 127.

Canonical volume layout is **(..., H, D, W)**: W rides the TPU lane axis,
D the sublane axis — the layout the aggregation scans and WTA want.
popcount lowers to the native ``lax.population_count``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BORDER_COST = 127  # UINT8_MAX / 2


@functools.partial(
    jax.jit, static_argnames=("min_disparity", "max_disparity", "out_dtype")
)
def hamming_cost_volume(
    census_left: jnp.ndarray,
    census_right: jnp.ndarray,
    min_disparity: int,
    max_disparity: int,
    out_dtype=jnp.uint8,
) -> jnp.ndarray:
    """census (..., H, W) uint32 -> cost volume (..., H, D, W)."""
    w = census_left.shape[-1]
    slices = []
    for d in range(min_disparity, max_disparity):
        # censusR shifted right by d along W; out-of-range -> cost 127.
        if 0 <= d <= w:
            shifted = jnp.pad(
                census_right[..., :w - d], [(0, 0)] * (census_right.ndim - 1) + [(d, 0)]
            )
        elif d < 0 and -d <= w:
            shifted = jnp.pad(
                census_right[..., -d:], [(0, 0)] * (census_right.ndim - 1) + [(0, -d)]
            )
        else:
            shifted = jnp.zeros_like(census_right)
        ham = jax.lax.population_count(census_left ^ shifted).astype(jnp.int32)
        cols = jnp.arange(w)
        valid = (cols - d >= 0) & (cols - d < w)
        slices.append(jnp.where(valid, ham, BORDER_COST))
    return jnp.stack(slices, axis=-2).astype(out_dtype)
