"""Spatial (H-tile) parallelism for the SGM pipeline.

The reference caps images at 450x375 with static buffers
(SemiGlobalMatching.h:14-16); this module removes the cap by sharding the
image's row dimension across a ``tile`` mesh axis:

* **census** needs a 2-row halo from each neighbour tile
  (``lax.ppermute`` — devices at the mesh edge receive zeros, which
  reproduces the reference's zeroed 2-px census border);
* the **cost volume** is tile-local (W stays whole, so the census shifts
  along W never cross tiles);
* **horizontal aggregation passes** are tile-local and exact;
* **vertical + diagonal passes** carry DP state across tile boundaries.
  ``cross_tile='exact'`` chains the per-tile scans sequentially — the
  boundary ``ScanCarry`` (cost, mincost, gray rows) hops tile-to-tile via
  ``ppermute``, giving bit-identical results to the single-device engine at
  the price of K sequential rounds (the carry chain is an IIR — exactness
  costs latency; batch data-parallelism recovers throughput).
  ``cross_tile='local'`` restarts paths at tile boundaries (the standard
  overlap-SGM approximation) and runs fully parallel;
* **WTA / uniqueness / subpixel / LR check** are row-local;
* **speckle removal** needs global connectivity: the disparity plane (H*W
  floats — tiny next to the cost volume) is ``all_gather``-ed, labelled
  redundantly, and sliced back;
* the **median** uses a 1-row halo with the global border rows masked back.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SGMOptions
from ..ops.aggregation import DIRECTIONS_4, DIRECTIONS_8, ScanCarry, directional_scan
from ..ops.census import census_5x5
from ..ops.cost_volume import BORDER_COST, hamming_cost_volume
from ..ops.postprocess import (lr_check, median_filter_3x3,
                               median_filter_3x3_inplace, remove_speckles)
from ..ops.wta import compute_disparity


def _perm_down(k: int):
    return [(i, i + 1) for i in range(k - 1)]


def _perm_up(k: int):
    return [(i + 1, i) for i in range(k - 1)]


def halo_exchange_rows(x: jnp.ndarray, n: int, axis_name: str, k: int) -> jnp.ndarray:
    """Pad a (..., Ht, W) tile with n boundary rows from each neighbour.
    Mesh-edge tiles receive zeros (ppermute semantics).  NB: every helper
    here must guard collectives behind ``k > 1`` — on a 1-device mesh
    make_tiled_matcher bypasses shard_map, so no axis name is bound."""
    if n == 0 or k == 1:
        pad = [(0, 0)] * (x.ndim - 2) + [(n, n), (0, 0)]
        return jnp.pad(x, pad)
    top = jax.lax.ppermute(x[..., -n:, :], axis_name, _perm_down(k))
    bot = jax.lax.ppermute(x[..., :n, :], axis_name, _perm_up(k))
    return jnp.concatenate([top, x, bot], axis=-2)


def tiled_census(img_tile: jnp.ndarray, axis_name: str, k: int,
                 h_total: int) -> jnp.ndarray:
    """Census with cross-tile halo; zeroed at the global 2-px row border."""
    ht = img_tile.shape[-2]
    padded = halo_exchange_rows(img_tile, 2, axis_name, k)
    cen = census_5x5(padded)[..., 2:2 + ht, :]
    my = jax.lax.axis_index(axis_name) if k > 1 else 0
    gr = my * ht + jnp.arange(ht)                     # global row index
    edge = (gr < 2) | (gr >= h_total - 2)
    return jnp.where(edge[:, None], jnp.uint32(0), cen)


def _chained_scan(cost: jnp.ndarray, img: jnp.ndarray, options: SGMOptions,
                  reverse: bool, roll: int, diagonal_mode: str,
                  axis_name: str, k: int) -> jnp.ndarray:
    """Exact cross-tile directional scan over the row axis.

    Tile t's true output needs tile t-1's outgoing carry (t+1 for reverse),
    so the chain runs K sequential rounds; at round r, tile r's result is
    selected.  All devices execute identical programs (SPMD)."""
    my = jax.lax.axis_index(axis_name)
    perm = _perm_up(k) if reverse else _perm_down(k)

    contrib, carry = directional_scan(
        cost, img, options.p1, options.p2_init, reverse, roll, diagonal_mode
    )
    first = jnp.int32(k - 1) if reverse else jnp.int32(0)
    out = contrib
    for step in range(1, k):
        inc = ScanCarry(*(jax.lax.ppermute(c, axis_name, perm) for c in carry))
        contrib_c, carry_c = directional_scan(
            cost, img, options.p1, options.p2_init, reverse, roll,
            diagonal_mode, carry_in=inc,
        )
        mine = (my == (first + (-step if reverse else step)))
        out = jnp.where(mine, contrib_c, out)
        carry = ScanCarry(*(jnp.where(mine, c_c, c) for c_c, c in zip(carry_c, carry)))
    return out


def _pipelined_scan(cost: jnp.ndarray, img: jnp.ndarray, options: SGMOptions,
                    reverse: bool, roll: int, diagonal_mode: str,
                    axis_name: str, k: int, num_micro: int) -> jnp.ndarray:
    """Wavefront-pipelined exact cross-tile scan over a *batch* of tiles.

    The exact carry chain is an IIR along the tile axis: naive chaining
    (``_chained_scan``) pays K redundant full-batch rounds.  Here the local
    batch is split into ``num_micro`` microbatches and streamed through the
    tile ring: at step s, tile t scans microbatch ``s - pos(t)`` and hands
    its outgoing DP carry to the next tile — the ring-attention-shaped
    schedule from SURVEY.md §5.  Work per tile drops from K×B to
    B + (K-1)×(B/M) microbatch-scans while staying bit-exact; pipeline
    fill/drain is the only overhead (utilisation M/(M+K-1)).

    cost: (B_local, Ht, D, W); returns the (B_local, Ht, D, W) int32
    contribution of this direction.
    """
    bl, ht, d, w = cost.shape
    if bl % num_micro:
        raise ValueError(
            f"per-device batch {bl} not divisible by num_micro={num_micro}: "
            "trailing images would silently receive no vertical aggregation")
    mb = bl // num_micro
    # k == 1: no mesh axis may be bound (the 1-device shard_map bypass);
    # the lone tile sits at position 0 and every carry hop yields zeros
    my = jax.lax.axis_index(axis_name) if k > 1 else 0
    pos = (k - 1 - my) if reverse else my
    perm = _perm_up(k) if reverse else _perm_down(k)

    # A zero carry is exactly carry-neutral (the DP minimum goes through
    # L(p-r,d)=0 with mincost 0, so the first row contributes its raw
    # cost), making path starts at tile 0 and pipeline bubbles uniform.
    carry = ScanCarry(jnp.zeros((mb, d, w), jnp.int32),
                      jnp.zeros((mb, w), jnp.int32),
                      jnp.zeros((mb, w), jnp.int32))
    scan_mb = jax.vmap(
        lambda c, i, ci: directional_scan(
            c, i, options.p1, options.p2_init, reverse, roll,
            diagonal_mode, carry_in=ci),
        in_axes=(0, 0, 0))

    out = jnp.zeros((bl, ht, d, w), jnp.int32)
    for s in range(num_micro + k - 1):
        m = s - pos
        mc = jnp.clip(m, 0, num_micro - 1) * mb
        cmb = jax.lax.dynamic_slice_in_dim(cost, mc, mb, axis=0)
        imb = jax.lax.dynamic_slice_in_dim(img, mc, mb, axis=0)
        contrib, carry_out = scan_mb(cmb, imb, carry)
        active = (m >= 0) & (m < num_micro)
        cur = jax.lax.dynamic_slice_in_dim(out, mc, mb, axis=0)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jnp.where(active, contrib, cur), mc, axis=0)
        carry = ScanCarry(
            *((jax.lax.ppermute(c, axis_name, perm) if k > 1
               else jnp.zeros_like(c)) for c in carry_out))
    return out


def tiled_aggregate_pipelined(
    cost: jnp.ndarray, img: jnp.ndarray, options: SGMOptions,
    axis_name: str, k: int, diagonal_mode: str, num_micro: int,
) -> jnp.ndarray:
    """Batched tile aggregation with pipelined exact vertical paths.

    cost: (B_local, Ht, D, W) uint8 tiles; horizontal paths are tile-local
    (vmapped), the six vertical/diagonal paths stream microbatches through
    the tile ring."""
    dirs = DIRECTIONS_8 if options.num_paths == 8 else DIRECTIONS_4
    aggr = jnp.zeros(cost.shape, dtype=jnp.int32)
    cost_t = cost.transpose(0, 3, 2, 1)
    img_t = img.transpose(0, 2, 1)
    for axis, reverse, roll in dirs:
        if axis == "h":
            contrib = jax.vmap(
                lambda c, i: directional_scan(
                    c, i, options.p1, options.p2_init, reverse, roll,
                    diagonal_mode)[0]
            )(cost_t, img_t)
            aggr = aggr + contrib.transpose(0, 3, 2, 1)
        else:
            aggr = aggr + _pipelined_scan(
                cost, img, options, reverse, roll, diagonal_mode,
                axis_name, k, num_micro)
    return aggr.astype(jnp.uint16)


def tiled_aggregate(cost: jnp.ndarray, img: jnp.ndarray, options: SGMOptions,
                    axis_name: str, k: int, cross_tile: str = "exact",
                    diagonal_mode: str = "wrap") -> jnp.ndarray:
    """Aggregate (Ht, D, W) cost tiles across the tile axis."""
    dirs = DIRECTIONS_8 if options.num_paths == 8 else DIRECTIONS_4
    aggr = jnp.zeros(cost.shape, dtype=jnp.int32)
    cost_t = cost.transpose(2, 1, 0)
    img_t = img.T
    for axis, reverse, roll in dirs:
        if axis == "h":
            # horizontal paths never cross H-tiles: exact and parallel
            contrib, _ = directional_scan(
                cost_t, img_t, options.p1, options.p2_init, reverse, roll,
                diagonal_mode,
            )
            aggr = aggr + contrib.transpose(2, 1, 0)
        elif cross_tile == "local" or k == 1:
            contrib, _ = directional_scan(
                cost, img, options.p1, options.p2_init, reverse, roll,
                diagonal_mode,
            )
            aggr = aggr + contrib
        else:
            aggr = aggr + _chained_scan(
                cost, img, options, reverse, roll, diagonal_mode, axis_name, k
            )
    return aggr.astype(jnp.uint16)


def _post_aggregation(aggr: jnp.ndarray, options: SGMOptions,
                      axis_name: str, k: int, h_total: int,
                      use_pallas: bool = False) -> jnp.ndarray:
    """Aggregated volume -> final disparity tile: WTA (+inverse/LR),
    all-gathered speckle labelling, halo median, global border mask.

    Dim-agnostic: aggr is (Ht, D, W) or (B_local, Ht, D, W); both tiled
    paths share this tail so they stay bit-identical by construction.  With
    ``use_pallas`` the WTA reductions and speckle labelling run as kernels
    (row-local / gathered-plane work, so tile-compatible as-is)."""
    # see models/sgm.py: sidesteps an XLA TPU fusion miscompile under vmap
    aggr = jax.lax.optimization_barrier(aggr)

    if use_pallas:
        from ..ops import pallas_kernels as pk
        from ..ops.wta import finalize_disparity

        fwd, inv = pk.wta_reduce_pallas(aggr, options, options.is_check_lr)
        disp = finalize_disparity(fwd, options)
        if options.is_check_lr:
            disp = pk.lr_check_pallas(disp, finalize_disparity(inv, options),
                                      options.lrcheck_thres,
                                      max_shift=max(options.max_disparity, 1))
    else:
        disp = compute_disparity(aggr, options, inverse=False)
        if options.is_check_lr:
            disp_r = compute_disparity(aggr, options, inverse=True)
            disp = lr_check(disp, disp_r, options.lrcheck_thres,
                            max_shift=max(options.max_disparity, 1))

    ht = disp.shape[-2]
    rows_axis = disp.ndim - 2
    my = jax.lax.axis_index(axis_name) if k > 1 else 0

    full = None                 # gathered whole plane, if any stage needed it
    if options.is_remove_speckles:
        # global connectivity: gather the (small) disparity plane
        if k > 1:
            full = jax.lax.all_gather(disp, axis_name, axis=rows_axis,
                                      tiled=True)
        else:
            full = disp
        if use_pallas:
            from ..ops import pallas_kernels as pk

            full = pk.remove_speckles_pallas(full, 1.0,
                                             options.min_speckle_area)
        else:
            spk = lambda d: remove_speckles(d, 1.0, options.min_speckle_area)
            full = spk(full) if full.ndim == 2 else jax.vmap(spk)(full)
        if not options.median_inplace:
            disp = jax.lax.dynamic_slice_in_dim(full, my * ht, ht,
                                                axis=rows_axis)

    if options.median_inplace:
        # the raster recurrence crosses every tile boundary; the disparity
        # plane is small, so gather it whole (like speckle) and run the
        # wavefront in-place median globally — reference-exact.  When the
        # speckle branch already gathered+filtered the plane, reuse it
        # instead of re-gathering (one collective, one slice).
        if full is None:
            full = jax.lax.all_gather(disp, axis_name, axis=rows_axis,
                                      tiled=True) if k > 1 else disp
        full = median_filter_3x3_inplace(full)
        return jax.lax.dynamic_slice_in_dim(full, my * ht, ht,
                                            axis=rows_axis)
    padded = halo_exchange_rows(disp, 1, axis_name, k)
    med = median_filter_3x3(padded)[..., 1:1 + ht, :]
    gr = my * ht + jnp.arange(ht)
    border = (gr == 0) | (gr == h_total - 1)
    return jnp.where(border[:, None], disp, med)


# ---------------------------------------------------------------------------
# Pallas tiled path: the same exact cross-tile schedules, but every per-tile
# scan runs the fused multi-direction Pallas DP kernel (carry-in/carry-out)
# instead of lax.scan — so the multi-chip modes keep the single-chip kernel
# speed (the hot loop of SemiGlobalMatching.c:229-372, sharded over rows).
# ---------------------------------------------------------------------------


def _zero_group_carry(b: int, n: int, d: int, w: int):
    return (jnp.zeros((b, n, d, w), jnp.int32),
            jnp.zeros((b, n, 1, w), jnp.int32))


def _group_scan_chained_pallas(cost8, p2, rolls, reverse, p1, restart,
                               axis_name, k, compute16=False):
    """K-round chained exact scan of one fused direction group (the Pallas
    counterpart of ``_chained_scan``, 3 directions per launch)."""
    from ..ops import pallas_kernels as pk

    b, s, d, w = cost8.shape
    n = len(rolls)
    my = jax.lax.axis_index(axis_name)
    perm = _perm_up(k) if reverse else _perm_down(k)

    out, carry = pk.directional_scan_group(
        cost8, p2, None, rolls, reverse, p1, restart,
        carry_in=_zero_group_carry(b, n, d, w), want_carry=True,
        compute16=compute16)
    first = jnp.int32(k - 1) if reverse else jnp.int32(0)
    for step in range(1, k):
        cin = tuple(jax.lax.ppermute(c, axis_name, perm) for c in carry)
        out_c, carry_c = pk.directional_scan_group(
            cost8, p2, None, rolls, reverse, p1, restart,
            carry_in=cin, want_carry=True, compute16=compute16)
        mine = my == (first + (-step if reverse else step))
        out = jnp.where(mine, out_c, out)
        carry = tuple(jnp.where(mine, cc, c)
                      for cc, c in zip(carry_c, carry))
    return out


def _group_scan_pipelined_pallas(cost8, p2, rolls, reverse, p1, restart,
                                 axis_name, k, num_micro, compute16=False):
    """Microbatch-wavefront exact scan of one fused direction group (the
    Pallas counterpart of ``_pipelined_scan``)."""
    from ..ops import pallas_kernels as pk

    b, s, d, w = cost8.shape
    n = len(rolls)
    if b % num_micro:
        raise ValueError(
            f"per-device batch {b} not divisible by num_micro={num_micro}")
    mb = b // num_micro
    my = jax.lax.axis_index(axis_name)
    pos = (k - 1 - my) if reverse else my
    perm = _perm_up(k) if reverse else _perm_down(k)

    carry = _zero_group_carry(mb, n, d, w)
    out = jnp.zeros((b, s, d, w), jnp.uint16)
    for step in range(num_micro + k - 1):
        m = step - pos
        mc = jnp.clip(m, 0, num_micro - 1) * mb
        cmb = jax.lax.dynamic_slice_in_dim(cost8, mc, mb, axis=0)
        p2mb = jax.lax.dynamic_slice_in_dim(p2, mc, mb, axis=0)
        contrib, carry_out = pk.directional_scan_group(
            cmb, p2mb, None, rolls, reverse, p1, restart,
            carry_in=carry, want_carry=True, compute16=compute16)
        active = (m >= 0) & (m < num_micro)
        cur = jax.lax.dynamic_slice_in_dim(out, mc, mb, axis=0)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jnp.where(active, contrib, cur), mc, axis=0)
        carry = tuple(jax.lax.ppermute(c, axis_name, perm)
                      for c in carry_out)
    return out


def _tiled_forward_batch_pallas(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    options: SGMOptions,
    axis_name: str,
    k: int,
    h_total: int,
    cross_tile: str,
    diagonal_mode: str,
    num_micro: int,
    compute16: bool = False,
) -> jnp.ndarray:
    """Full Pallas pipeline on (B_local, Ht, W) tile batches: fused
    census+cost with explicit cross-tile halo, fused direction-group DP
    scans with cross-tile carries (chained / pipelined / local), Pallas WTA
    + speckle tail."""
    from ..ops import pallas_kernels as pk

    b, ht, w = lefts.shape
    restart = diagonal_mode == "restart"
    p1, p2i = options.p1, options.p2_init
    compute16 = compute16 and pk.int16_safe(p1, p2i)
    dmin, dmax = options.min_disparity, options.max_disparity

    # --- fused census + cost with neighbour-halo rows ---------------------
    pad_l = halo_exchange_rows(lefts, 2, axis_name, k)
    pad_r = halo_exchange_rows(rights, 2, axis_name, k)
    cost = pk.census_cost_volume_pallas(pad_l, pad_r, dmin, dmax,
                                        img_has_halo=True)
    # global census border rows (census code 0 -> cost 0 in range, 127 OOB)
    my = jax.lax.axis_index(axis_name) if k > 1 else 0
    gr = my * ht + jnp.arange(ht)
    border = (gr < 2) | (gr >= h_total - 2)
    lane = jnp.arange(w)
    dvals = jnp.arange(dmin, dmax)
    oob = (lane[None, :] - dvals[:, None] < 0) | \
          (lane[None, :] - dvals[:, None] >= w)
    fix = jnp.where(oob, jnp.uint8(BORDER_COST), jnp.uint8(0))
    cost = jnp.where(border[None, :, None, None], fix[None, None], cost)

    # --- aggregation ------------------------------------------------------
    cost8 = cost.astype(jnp.int8)
    img = lefts.astype(jnp.int32)
    part = pk.horizontal_partial(cost8, img, p1, p2i, restart,
                                 compute16=compute16)

    v_rolls_f = (0, 1, -1) if options.num_paths == 8 else (0,)
    v_rolls_b = (0, -1, 1) if options.num_paths == 8 else (0,)
    # boundary gray rows for the adaptive-P2 planes: constant per tile, so
    # one halo hop up front replaces the per-round gray carry
    if k > 1:
        prev_f = jax.lax.ppermute(img[:, -1, :], axis_name, _perm_down(k))
        prev_b = jax.lax.ppermute(img[:, 0, :], axis_name, _perm_up(k))
    else:
        prev_f = prev_b = None
    p2_f = pk._p2_planes(img, v_rolls_f, +1, p1, p2i, prev_row=prev_f)
    p2_b = pk._p2_planes(img, v_rolls_b, -1, p1, p2i, prev_row=prev_b)

    if cross_tile == "local" or k == 1:
        # fresh-start scans need no carry machinery: pad the scan axis
        # (zero cost/P2 rows are carry-neutral in both directions, as in
        # aggregate_paths), thread the accumulate THROUGH the launches
        # (io-aliased acc) in padded scan space — the former two XLA
        # full-volume adds were most of the r4 tiled-vs-untiled 8% gap at
        # D=256 (results/big_configs.json) — and crop once at the end.
        block_rows = pk._pick_block_rows(ht, cost8.shape[-2],
                                         cost8.shape[-1], None)
        hp = pk._round_up(ht, block_rows)
        pad = ((0, 0), (0, hp - ht), (0, 0), (0, 0))
        cost8_p = jnp.pad(cost8, pad)
        part_p = jnp.pad(part, pad)
        if pk._use_bidir("auto", compute16, hp, cost8.shape[-2],
                         cost8.shape[-1], block_rows, len(v_rolls_f),
                         wta_on=False):
            # same single-launch bidirectional formulation as the untiled
            # engine (forward sums parked in VMEM)
            part_p = pk._directional_scan_group_bidir(
                cost8_p,
                pk._stack_p2_fb(jnp.pad(p2_f, pad), jnp.pad(p2_b, pad)),
                part_p, v_rolls_f, v_rolls_b, p1, restart, block_rows)
        else:
            for rolls, reverse, p2 in ((v_rolls_f, False, p2_f),
                                       (v_rolls_b, True, p2_b)):
                part_p = pk.directional_scan_group(
                    cost8_p, jnp.pad(p2, pad), part_p, rolls, reverse, p1,
                    restart, block_rows=block_rows, compute16=compute16)
        aggr = part_p[:, :ht]
    else:
        for rolls, reverse, p2 in ((v_rolls_f, False, p2_f),
                                   (v_rolls_b, True, p2_b)):
            if cross_tile == "pipelined":
                contrib = _group_scan_pipelined_pallas(
                    cost8, p2, rolls, reverse, p1, restart, axis_name, k,
                    num_micro, compute16)
            else:
                contrib = _group_scan_chained_pallas(
                    cost8, p2, rolls, reverse, p1, restart, axis_name, k,
                    compute16)
            part = part + contrib
        aggr = part.astype(jnp.uint16)

    return _post_aggregation(aggr, options, axis_name, k, h_total,
                             use_pallas=True)


def _tiled_forward_single(
    left_tile: jnp.ndarray,
    right_tile: jnp.ndarray,
    options: SGMOptions,
    axis_name: str,
    k: int,
    h_total: int,
    cross_tile: str,
    diagonal_mode: str,
) -> jnp.ndarray:
    """Full pipeline on one (Ht, W) tile pair (runs inside shard_map)."""
    cl = tiled_census(left_tile, axis_name, k, h_total)
    cr = tiled_census(right_tile, axis_name, k, h_total)
    cost = hamming_cost_volume(cl, cr, options.min_disparity, options.max_disparity)
    aggr = tiled_aggregate(cost, left_tile, options, axis_name, k,
                           cross_tile, diagonal_mode)
    return _post_aggregation(aggr, options, axis_name, k, h_total)


def _tiled_forward_batch_pipelined(
    lefts: jnp.ndarray,
    rights: jnp.ndarray,
    options: SGMOptions,
    axis_name: str,
    k: int,
    h_total: int,
    diagonal_mode: str,
    num_micro: int,
) -> jnp.ndarray:
    """Batched tile pipeline with wavefront-pipelined exact aggregation."""
    cl = tiled_census(lefts, axis_name, k, h_total)
    cr = tiled_census(rights, axis_name, k, h_total)
    cost = hamming_cost_volume(cl, cr, options.min_disparity,
                               options.max_disparity)
    aggr = tiled_aggregate_pipelined(
        cost, lefts, options, axis_name, k, diagonal_mode, num_micro)
    return _post_aggregation(aggr, options, axis_name, k, h_total)


def make_tiled_matcher(
    options: SGMOptions,
    mesh: Mesh,
    h: int,
    w: int,
    cross_tile: str = "exact",
    diagonal_mode: str = "wrap",
    num_micro: int = 0,
    use_pallas: bool = False,
    compute16: bool = False,
):
    """Build a jitted (B, H, W) x2 -> (B, H, W) matcher sharded over the
    mesh: batch across 'data', rows across 'tile'.

    cross_tile: 'exact' (K-round chained carries), 'pipelined' (exact,
    microbatch wavefront through the tile ring — num_micro chunks of the
    per-device batch, 0 = one image per microbatch), or 'local'
    (tile-restarted paths, the overlap-SGM approximation).

    use_pallas: run the fused Pallas kernels for census+cost, the
    direction-group DP scans (with cross-tile carry-in/out), WTA and
    speckle — all three cross_tile modes supported, bit-identical to the
    jnp path."""
    if cross_tile not in ("exact", "pipelined", "local"):
        raise ValueError(f"cross_tile={cross_tile!r}: expected "
                         "'exact', 'pipelined' or 'local'")
    k = mesh.shape["tile"]
    if h % k:
        raise ValueError(f"H={h} not divisible by tile axis size {k}")
    if h // k < 2:
        # the census halo exchange ships 2 boundary rows per side; a 1-row
        # tile would silently under-fill the halo and zero every census code
        raise ValueError(f"tile height {h}//{k}={h // k} < 2: the 5x5 "
                         "census halo needs >= 2 rows per tile")

    if use_pallas:
        def local_fn(lefts, rights):
            nm = num_micro if num_micro > 0 else lefts.shape[0]
            return _tiled_forward_batch_pallas(
                lefts, rights, options, "tile", k, h, cross_tile,
                diagonal_mode, nm, compute16)
    elif cross_tile == "pipelined":
        def local_fn(lefts, rights):
            nm = num_micro if num_micro > 0 else lefts.shape[0]
            return _tiled_forward_batch_pipelined(
                lefts, rights, options, "tile", k, h,
                diagonal_mode, nm)
    else:
        single = functools.partial(
            _tiled_forward_single,
            options=options, axis_name="tile", k=k, h_total=h,
            cross_tile=cross_tile, diagonal_mode=diagonal_mode,
        )

        def local_fn(lefts, rights):
            # lefts: (B_local, Ht, W) on each device
            return jax.vmap(single)(lefts, rights)

    if mesh.size == 1:
        # A 1-device mesh needs no collectives (k=1 paths skip them all),
        # and the tunnelled single-chip TPU relay executes manually
        # partitioned (shard_map) modules ~100x slower than plain jit —
        # measured 1.4 s vs 16 ms/frame for the SAME jnp body on a (1,1)
        # mesh — so the trivial mesh bypasses shard_map entirely.
        return jax.jit(local_fn)

    spec = P("data", "tile", None)
    fn = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec), out_specs=spec,
                   check_vma=False)
    sharding = NamedSharding(mesh, spec)

    @functools.partial(jax.jit, out_shardings=sharding)
    def matcher(lefts, rights):
        lefts = jax.lax.with_sharding_constraint(lefts, sharding)
        rights = jax.lax.with_sharding_constraint(rights, sharding)
        return fn(lefts, rights)

    return matcher
