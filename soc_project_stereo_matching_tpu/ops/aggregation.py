"""SGM path aggregation — JAX scan ops.

Reference: ``SemiGlobalMatching.c:198-372`` (CostAggregation/CostAggregate).
The recurrence along a path r:

    L(p,d) = C(p,d) + min(L(p-r,d), L(p-r,d-1)+P1, L(p-r,d+1)+P1,
                          min_d L(p-r) + P2') - min_d L(p-r)
    P2'    = max(P1, P2_init // (|I(p) - I(p-r)| + 1))
    result truncated to uint8 (mod 256, ``:343``); 255 sentinels at d=-1, D.

TPU-first re-derivation
-----------------------
The reference walks each path with scalar pointers.  Here every direction is
a single ``lax.scan`` with a (D, P) carry — sequential only in path length,
vectorised over the P perpendicular paths (lane axis) x D disparities
(sublane axis):

* vertical passes scan over H, carry (D, W);
* horizontal passes scan over W on a (W, D, H)-transposed view, carry (D, H);
* the reference's diagonal passes **wrap around image edges**, snaking onto
  the next row (``:297-310``): a path starting at column k visits
  ``col = (k ± step) mod W``.  Indexing the carry by *current column* turns
  each diagonal pass into a vertical scan whose carry is circularly rolled
  by ±1 every step — bit-identical to the reference's intended geometry and
  essentially free on TPU (``pltpu.roll`` / ``jnp.roll`` on the lane axis).

``diagonal_mode``:
  'wrap'    - mod-W wrapping (the reference's intent, default);
  'restart' - industry-standard SGM: a path hitting an image edge restarts,
              implemented as a carry reset on the single wrapped lane.

The scan also accepts/returns boundary carries so tiles of a sharded image
can chain scans across devices (parallel/tiles.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import SGMOptions

SENTINEL = 255  # L(p-r, -1) = L(p-r, D) = UINT8_MAX


class ScanCarry(NamedTuple):
    """Per-path DP state carried along a scan (all int32)."""

    cost: jnp.ndarray      # (D, P) previous path costs
    mincost: jnp.ndarray   # (P,)   min over D of `cost`
    gray: jnp.ndarray      # (P,)   previous pixel intensity


# The eight reference directions expressed as (axis, reverse, roll):
#   axis 'h': scan over W (transposed view); axis 'v': scan over H.
# Order matches CostAggregation (SemiGlobalMatching.c:213-220).
DIRECTIONS_8 = (
    ("h", False, 0),   # ( 1,  0) ->
    ("h", True, 0),    # (-1,  0) <-
    ("v", False, 0),   # ( 0,  1) v
    ("v", True, 0),    # ( 0, -1) ^
    ("v", False, +1),  # ( 1,  1) wrapping diagonal
    ("v", True, -1),   # (-1, -1)
    ("v", True, +1),   # ( 1, -1)
    ("v", False, -1),  # (-1,  1)
)
DIRECTIONS_4 = DIRECTIONS_8[:4]


def _roll(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return jnp.roll(x, shift, axis=-1) if shift else x


def _dp_step(
    carry: ScanCarry,
    cost_row: jnp.ndarray,
    gray_row: jnp.ndarray,
    p1: int,
    p2_init: int,
) -> jnp.ndarray:
    """One DP step; returns mod-256 truncated cost_s, shape (D, P) int32."""
    d, p = cost_row.shape
    pad = jnp.full((1, p), SENTINEL, dtype=jnp.int32)
    p2 = jnp.maximum(
        jnp.int32(p1), jnp.int32(p2_init) // (jnp.abs(gray_row - carry.gray) + 1)
    )
    l1 = carry.cost
    l2 = jnp.concatenate([pad, carry.cost[:-1]], axis=0) + p1
    l3 = jnp.concatenate([carry.cost[1:], pad], axis=0) + p1
    l4 = (carry.mincost + p2)[None, :]
    m = jnp.minimum(jnp.minimum(l1, l2), jnp.minimum(l3, l4))
    return (cost_row + m - carry.mincost[None, :]) & 0xFF


def directional_scan(
    cost: jnp.ndarray,
    img: jnp.ndarray,
    p1: int,
    p2_init: int,
    reverse: bool = False,
    roll: int = 0,
    diagonal_mode: str = "wrap",
    carry_in: Optional[ScanCarry] = None,
) -> Tuple[jnp.ndarray, ScanCarry]:
    """One directional DP pass over a (S, D, P) cost view.

    Returns (contribution (S, D, P) int32, outgoing ScanCarry).  With
    ``carry_in`` the first row continues an upstream tile's path instead of
    starting new paths (cross-tile exact aggregation).
    """
    cost = cost.astype(jnp.int32)
    img = img.astype(jnp.int32)
    if reverse:
        cost = cost[::-1]
        img = img[::-1]

    def step(state: ScanCarry, xs):
        cost_row, gray_row = xs
        state = ScanCarry(
            _roll(state.cost, roll), _roll(state.mincost, roll), _roll(state.gray, roll)
        )
        cost_s = _dp_step(state, cost_row, gray_row, p1, p2_init)
        if roll and diagonal_mode == "restart":
            lane = 0 if roll > 0 else cost_row.shape[-1] - 1
            cost_s = cost_s.at[:, lane].set(cost_row[:, lane])
        new_state = ScanCarry(cost_s, cost_s.min(axis=0), gray_row)
        return new_state, cost_s

    if carry_in is None:
        first = cost[0]
        state0 = ScanCarry(first, first.min(axis=0), img[0])
        state, rest = jax.lax.scan(step, state0, (cost[1:], img[1:]))
        out = jnp.concatenate([first[None], rest], axis=0)
    else:
        state, out = jax.lax.scan(step, carry_in, (cost, img))

    if reverse:
        out = out[::-1]
    return out, state


@functools.partial(jax.jit, static_argnames=("options", "diagonal_mode"))
def aggregate_paths(
    cost: jnp.ndarray,
    img_left: jnp.ndarray,
    options: SGMOptions,
    diagonal_mode: str = "wrap",
) -> jnp.ndarray:
    """Sum of directional passes.  cost (H, D, W) -> aggregated (H, D, W)
    uint16, bit-matching the oracle's ``aggregate_paths``."""
    dirs = DIRECTIONS_8 if options.num_paths == 8 else DIRECTIONS_4
    cost_t = cost.transpose(2, 1, 0)
    img_t = img_left.T

    aggr = jnp.zeros(cost.shape, dtype=jnp.int32)
    for axis, reverse, roll in dirs:
        if axis == "h":
            contrib, _ = directional_scan(
                cost_t, img_t, options.p1, options.p2_init, reverse, roll, diagonal_mode
            )
            aggr = aggr + contrib.transpose(2, 1, 0)
        else:
            contrib, _ = directional_scan(
                cost, img_left, options.p1, options.p2_init, reverse, roll, diagonal_mode
            )
            aggr = aggr + contrib
    return aggr.astype(jnp.uint16)
