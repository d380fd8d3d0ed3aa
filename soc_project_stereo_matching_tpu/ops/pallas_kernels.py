"""Pallas TPU kernels for the SGM hot path.

The reference walks each aggregation path with scalar pointers
(``SemiGlobalMatching.c:198-372``); the pure-XLA version in
``ops/aggregation.py`` expresses each direction as a ``lax.scan`` whose
per-step work is far too small to hide scan overhead on TPU.  Here the
whole scan runs *inside* one kernel: the grid iterates sequentially over
(batch, row-chunk), DP carries live in VMEM scratch across grid steps, and
up to three directions that share a scan order (the straight pass plus the
two edge-wrapping diagonals, distinguished only by a circular lane roll of
the carry — see aggregation.py's derivation) are fused into one launch so
the cost rows are read once.

Eight paths therefore take four launches:

    vertical fwd  (rolls 0,+1,-1)   -> partial
    vertical bwd  (rolls 0,-1,+1)   += partial      (input_output_aliases)
    horizontal fwd (roll 0, on the (W, D, H)-transposed view) -> partial
    horizontal bwd (roll 0)         += partial

and one XLA add combines the vertical and (back-transposed) horizontal
partials into the uint16 aggregated volume, bit-equal to the oracle.

When the full-frame forward-sum scratch fits VMEM (``_bidir_fits``; cone
and KITTI-geometry frames qualify) each direction PAIR instead fuses into
one bidirectional launch (``_directional_scan_group_bidir``): the grid
grows a direction dim, the forward pass parks its row sums on-chip, and
the backward pass emits the only HBM store — so eight paths take TWO
launches, the partial volume never round-trips HBM, and with fused WTA
the aggregated volume is never stored at all (A/B:
results/bidir_fuse_probe.json).

Bit-exactness notes: the adaptive-P2 planes ``max(P1, P2/(|dI|+1))`` are
precomputed in XLA (exact int32 division) and streamed as (nrolls, H, W)
inputs; the per-step truncation is ``& 0xFF`` on int32, matching the
reference's uint8 store; a zero carry is exactly carry-neutral (forces
``m - mincost == 0`` so the first row contributes its raw cost), which
makes path starts, zero-padded rows and reverse scans all uniform.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SGMOptions

SENTINEL = 255


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """jnp.roll semantics; pltpu.roll only accepts non-negative shifts.

    16-bit dtypes route through ``_roll16``: Mosaic's vector rotate
    (tpu.dynamic_rotate) is 32-bit-only, so rolling packed 16-bit vregs
    directly fails to compile on real TPU."""
    shift %= x.shape[axis]
    if x.dtype.itemsize == 2 and not _interpret():
        return _roll16(x, shift, axis)
    return pltpu.roll(x, shift, axis=axis)


def _roll16(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """Roll a 16-bit vector via its packed-pair uint32 view.

    A 16-bit vreg packs sublane pairs (2s, 2s+1) into one 32-bit word
    (even row = LOW halfword; verified on v5e — see tests and the r4 probe
    recorded in BASELINE.md), so:
      * lane rolls are plain 32-bit rotates (packing is along sublanes);
      * even sublane shifts are 32-bit rotates by shift/2;
      * odd sublane shifts add one halfword weave of two rotates:
        word k of the result = (high(rot[(shift+1)/2]) | low(rot[(shift-1)/2]) << 16).
    Pure bit movement — exact for int16/uint16/bf16 alike."""
    n = x.shape[axis]
    if shift == 0:
        return x
    if x.shape[-2] % 2:
        # no uint32 pair view exists (odd sublane count, e.g. the (1, W)
        # running-min plane): widen -> 32-bit roll -> narrow, exact for
        # integer payloads (zero/sign-extend then truncate)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return pltpu.roll(x.astype(jnp.int32), shift,
                              axis=axis).astype(x.dtype)
        return jnp.roll(x, shift, axis=axis)
    if axis != x.ndim - 2:
        x32 = pltpu.bitcast(x, jnp.uint32)
        return pltpu.bitcast(pltpu.roll(x32, shift, axis=axis), x.dtype)
    x32 = pltpu.bitcast(x, jnp.uint32)   # sublane roll; n even per the guard
    if shift % 2 == 0:
        y = pltpu.roll(x32, shift // 2, axis=axis)
    else:
        half = x32.shape[axis]
        e = pltpu.roll(x32, ((shift - 1) // 2) % half, axis=axis)
        o = pltpu.roll(x32, ((shift + 1) // 2) % half, axis=axis)
        # result word k: low half (row 2k) comes from an odd source row =
        # the HIGH half of o's word k; high half (row 2k+1) from an even
        # source row = the LOW half of e's word k.
        y = (o >> 16) | (e << 16)
    return pltpu.bitcast(y, x.dtype)


# Volume kernels hold working sets well above the 16M default scoped-VMEM
# cap for large (D, W) configs (e.g. Middlebury D=128); v5e has 128M.
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


def _auto_block_rows(d: int, w: int, requested: int) -> int:
    """Shrink the per-chunk row count so (rows, D, W) blocks stay VMEM-sized
    regardless of the disparity range / image width."""
    rows = requested
    while rows > 8 and rows * d * w * 4 > 16 * 1024 * 1024:
        rows //= 2
    return rows


def _plain_block_rows(d: int, w: int, requested: int) -> int:
    """Final chunk size for plain (non-carry) scans: VMEM-shrunk, then
    rounded down to a sublane multiple.  The nsp P2 BlockSpec places the
    chunk count in the second-to-last block dim, which Mosaic requires to
    be 8-divisible — ``_auto_block_rows`` alone can return e.g. 48->6 for
    large (D, W) volumes and fail the Mosaic compile (the census path has
    always applied this guard; callers must pad the scan axis with the
    value this function returns, not with the requested one)."""
    rows = _auto_block_rows(d, w, requested)
    return max(8, rows - rows % 8)


def _pick_block_rows(s: int, d: int, p: int, requested) -> int:
    """Scan chunk size for the plain (non-carry) scans.

    ``requested=None`` auto-selects: larger chunks cut per-chunk grid
    overhead (measured monotone on the real chip at cone size —
    results/block_rows_probe.json: 96 rows beat 32 by ~3% on the fused
    aggregation+WTA and ~7% on the horizontal pair, bit-equal) as long as
    they do not inflate the padded scan length; the largest of 96/64/48
    whose scan-axis padding stays within 3 points of the 32-row baseline's
    wins.  An explicit ``requested`` keeps the legacy behaviour (tests pin
    small chunks to exercise multi-chunk grids on small frames)."""
    if requested is not None:
        return _plain_block_rows(d, p, requested)
    base_rows = _plain_block_rows(d, p, 32)
    base_waste = (_round_up(s, base_rows) - s) / s
    for cand in (96, 64, 48):
        rows = _plain_block_rows(d, p, cand)
        if rows <= base_rows:
            break
        waste = (_round_up(s, rows) - s) / s
        if waste <= base_waste + 0.03:
            return rows
    return base_rows


def _carry_block_rows(s: int, d: int, w: int, requested: int) -> int:
    """Chunk size for carry-aware scans: the VMEM-derived row budget,
    uncapped by divisibility.  When it does not divide the true scan
    length the caller pads the scan axis and the kernel stops each
    chunk at its valid row count (``s_true``) — padded rows are never
    stepped, so the outgoing DP carry stays exact.  (The former
    largest-divisor rule collapsed to 5-row chunks at 1500x1000 D=256
    tiles — the r4 tiled-vs-untiled 8% gap, results/big_configs.json —
    and to 1-row chunks for prime tile heights.)"""
    return min(max(1, _auto_block_rows(d, w, requested)), s)


def _scan_group_kernel(
    cost_ref, p2_ref, acc_ref, cin_cost_ref, cin_min_ref,
    out_ref, cout_cost_ref, cout_min_ref, wta_refs, carry_cost, carry_min,
    *, rows: int, d: int, w: int, rolls: Sequence[int], reverse: bool,
    p1: int, restart: bool, wta=None, p2_nsp: bool = False,
    compute16: bool = False, unroll: int = 1, s_true: Optional[int] = None,
):
    """One (batch, row-chunk) grid step of a fused multi-direction DP scan.

    With ``cin_*``/``cout_*`` refs the scan continues an upstream tile's DP
    state instead of starting fresh paths, and emits the state after its
    last row — the cross-tile carry interface used by parallel/tiles.py
    (the reference's path walk, SemiGlobalMatching.c:229-372, sharded over
    the row axis).

    With ``wta=(dmin, include_inverse)`` this is the FINAL launch (its
    ``acc`` already carries every other direction's sum): once the chunk's
    rows are complete the WTA reduction planes are computed on the block
    while it is still VMEM-resident and written to ``wta_refs`` — saving
    the separate WTA pass's full read of the aggregated volume.

    ``compute16``: run the recurrence in int16 — every intermediate fits
    (costs <= 127+border 127, ``cs & 0xFF`` <= 255, ``m`` <= 255+P2 <= 405,
    8-path totals <= 2040), and packed (16, 128) vregs halve the per-step
    vector-issue count of this op-count-bound kernel.  Bit-equal to the
    int32 path by range analysis and tested so.  The cross-tile carry
    interface (cin/cout refs) stays int32 — carry values are <= 255, so
    the in-kernel narrowing/widening casts are lossless."""
    cdt = jnp.int16 if compute16 else jnp.int32
    sentinel = jnp.asarray(SENTINEL, cdt)
    chunk = pl.program_id(1)

    # valid row count of THIS chunk: when the caller padded the scan axis
    # (s_true set, carry scans whose VMEM chunk does not divide the true
    # length), the final block is partial — the loop stops there so padded
    # rows never touch the DP carry.  Block id under a reverse scan is
    # flipped by the index map.
    if s_true is None:
        valid = rows
    else:
        nblk = pl.num_programs(1)
        blk = nblk - 1 - chunk if reverse else chunk
        valid = jnp.minimum(rows, s_true - blk * rows)

    @pl.when(chunk == 0)
    def _init():
        if cin_cost_ref is None:
            carry_cost[...] = jnp.zeros_like(carry_cost)
            carry_min[...] = jnp.zeros_like(carry_min)
        else:
            # the cross-tile carry interface stays int32 (values <= 255,
            # so the narrowing cast is lossless)
            carry_cost[...] = cin_cost_ref[0].astype(carry_cost.dtype)
            carry_min[...] = cin_min_ref[0].astype(carry_min.dtype)

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (d, w), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (d, w), 1)

    def step(s, _):
        row = valid - 1 - s if reverse else s
        # & 0xFF recovers the unsigned value: the volume rides as int8 for
        # DMA width, so uint8 costs >= 128 arrive bit-preserved but negative
        cost_row = cost_ref[0, row].astype(cdt) & 0xFF           # (D, W)
        total = None
        for k, roll in enumerate(rolls):
            prev = carry_cost[k]
            pmin = carry_min[k]
            if roll:
                prev = _roll(prev, roll, axis=1)
                pmin = _roll(pmin, roll, axis=1)
            # (1, W) adaptive-P2 row.  Layouts: carry-aware scans chunk S
            # outside the tiled (n, P) dims so any divisor chunk is legal
            # ("snp"); plain scans keep the direction plane as a contiguous
            # (S, P) tile ("nsp") — the strided (n, P)-tile read cost the
            # aggregation kernel ~13% when it briefly became the only layout
            # (BENCH_r01 1.473 -> r02 1.665 ms/frame).
            if p2_nsp:
                p2_row = p2_ref[0, k, pl.ds(row, 1)].astype(cdt)
            else:
                p2_row = p2_ref[0, pl.ds(row, 1), k].astype(cdt)
            up = jnp.where(d_iota == 0, sentinel,
                           _roll(prev, 1, axis=0))          # L(p-r, d-1)
            dn = jnp.where(d_iota == d - 1, sentinel,
                           _roll(prev, -1, axis=0))         # L(p-r, d+1)
            # min(up, dn) + P1 folds the two penalty adds into one
            m = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1),
                            pmin + p2_row)
            cs = (cost_row + m - pmin) & 0xFF
            if restart and roll:
                lane = 0 if roll > 0 else w - 1
                cs = jnp.where(lane_iota == lane, cost_row, cs)
            carry_cost[k] = cs
            if compute16:
                # Mosaic has no int16 reductions: circular doubling tree —
                # after shifts 1,2,4,... covering >= d, every sublane holds
                # the global min; stays in packed (16, 128) vregs
                cm, shift = cs, 1
                while shift < d:
                    cm = jnp.minimum(cm, _roll(cm, shift, axis=0))
                    shift *= 2
                carry_min[k] = cm[0:1]
            else:
                carry_min[k] = jnp.min(cs, axis=0, keepdims=True)
            total = cs if total is None else total + cs
        if acc_ref is not None:
            total = total + acc_ref[0, row].astype(cdt)
        out_ref[0, row] = total.astype(jnp.uint16)
        return ()

    jax.lax.fori_loop(0, valid, step, (),
                      unroll=unroll if unroll > 1 and s_true is None
                      else False)

    if cout_cost_ref is not None:
        # same output block every chunk -> the last chunk's state survives
        cout_cost_ref[0] = carry_cost[...].astype(cout_cost_ref.dtype)
        cout_min_ref[0] = carry_min[...].astype(cout_min_ref.dtype)

    if wta is not None:
        dmin, include_inverse = wta
        a = out_ref[0].astype(jnp.int32)           # final totals, in VMEM
        load8 = lambda c: out_ref[0, :, pl.ds(c * 8, 8), :].astype(jnp.int32)
        planes = _wta_reduce_block(a, rows=rows, d=d, w=w, dmin=dmin,
                                   include_inverse=include_inverse,
                                   load8=load8)
        for ref, val in zip(wta_refs, planes):
            ref[0] = val


def _directional_scan_group(
    cost: jnp.ndarray,       # (B, S, D, P) int8 — S is the scan axis
    p2: jnp.ndarray,         # (B, S, nrolls, P) int32
    acc: Optional[jnp.ndarray],   # (B, S, D, P) uint16 or None
    rolls: Sequence[int],
    reverse: bool,
    p1: int,
    restart: bool,
    block_rows: int,
    carry_in=None,           # (cost (B, n, D, P), min (B, n, 1, P)) int32
    want_carry: bool = False,
    wta=None,                # (dmin, include_inverse): emit WTA planes
    compute16: bool = False,
    unroll: int = 1,         # scan-step software unroll (A/B knob)
):
    """Fused multi-direction DP scan; returns the (B, S, D, P) uint16 sum of
    the group's direction contributions (added onto ``acc`` when given), and
    — when ``carry_in``/``want_carry`` — the outgoing per-direction DP state.
    With ``wta`` also returns the per-row WTA reduction planes of the final
    totals (see ``_scan_group_kernel``).
    """
    b, s, d, p = cost.shape
    n = len(rolls)
    has_carry = carry_in is not None or want_carry
    s_true = None
    if has_carry:
        # full VMEM-budget chunks; if the budget does not divide the true
        # scan length, pad the axis and let the kernel stop each chunk at
        # its valid row count — padded rows never step the DP carry
        block_rows = _carry_block_rows(s, d, p, block_rows)
        if s % block_rows:
            sp = _round_up(s, block_rows)
            pad = ((0, 0), (0, sp - s), (0, 0), (0, 0))
            cost = jnp.pad(cost, pad)
            p2 = jnp.pad(p2, pad)
            if acc is not None:
                acc = jnp.pad(acc, pad)
            s_true, s = s, sp
    else:
        # shrink chunks for large (D, P); s is pre-padded by the caller
        # with this same deterministic value (8-divisible for the nsp spec)
        block_rows = _plain_block_rows(d, p, block_rows)
    assert s % block_rows == 0, (s, block_rows)
    assert not (wta and s_true is not None), \
        "WTA fusion requires an unpadded scan axis"
    grid = (b, s // block_rows)

    # P2 layout (callers always hand (B, S, n, P)):
    #  * carry-aware scans must chunk S with arbitrary divisors, so S sits
    #    OUTSIDE the tiled block dims -> keep (B, S, n, P); the kernel then
    #    reads each row across an 8-sublane-padded (n, P) tile ("snp");
    #  * plain scans (the single-chip hot path) transpose to (B, n, S, P)
    #    so each direction's P2 plane is a contiguous (S, P) tile and the
    #    per-row read is a clean (1, W) slice — restoring the r01-fast
    #    layout (the "snp"-only interlude cost the aggregation kernel ~13%).
    p2_nsp = not has_carry
    if p2_nsp:
        p2 = jnp.swapaxes(p2, 1, 2)

    base = functools.partial(
        _scan_group_kernel,
        rows=block_rows, d=d, w=p, rolls=tuple(rolls), reverse=reverse,
        p1=p1, restart=restart, wta=wta, p2_nsp=p2_nsp, compute16=compute16,
        unroll=unroll, s_true=s_true,
    )
    n_wta = 0 if wta is None else (10 if wta[1] else 5)

    def vol_spec():
        return pl.BlockSpec(
            (1, block_rows, d, p),
            lambda bi, ci: (bi, grid[1] - 1 - ci if reverse else ci, 0, 0),
            memory_space=pltpu.VMEM,
        )

    if p2_nsp:
        p2_spec = pl.BlockSpec(
            (1, len(rolls), block_rows, p),
            lambda bi, ci: (bi, 0, grid[1] - 1 - ci if reverse else ci, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        p2_spec = pl.BlockSpec(
            (1, block_rows, len(rolls), p),
            lambda bi, ci: (bi, grid[1] - 1 - ci if reverse else ci, 0, 0),
            memory_space=pltpu.VMEM,
        )
    ccost_spec = pl.BlockSpec((1, n, d, p), lambda bi, ci: (bi, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    cmin_spec = pl.BlockSpec((1, n, 1, p), lambda bi, ci: (bi, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [vol_spec(), p2_spec]
    inputs = [cost, p2]
    io_aliases = {}
    if acc is not None:
        in_specs.append(vol_spec())
        inputs.append(acc)
        io_aliases = {2: 0}
    if carry_in is not None:
        in_specs += [ccost_spec, cmin_spec]
        inputs += [carry_in[0], carry_in[1]]

    plane_spec = pl.BlockSpec(
        (1, block_rows, p),
        lambda bi, ci: (bi, grid[1] - 1 - ci if reverse else ci, 0),
        memory_space=pltpu.VMEM)

    out_specs = [vol_spec()]
    out_shapes = [jax.ShapeDtypeStruct((b, s, d, p), jnp.uint16)]
    if has_carry:
        out_specs += [ccost_spec, cmin_spec]
        out_shapes += [jax.ShapeDtypeStruct((b, n, d, p), jnp.int32),
                       jax.ShapeDtypeStruct((b, n, 1, p), jnp.int32)]
    out_specs += [plane_spec] * n_wta
    out_shapes += [jax.ShapeDtypeStruct((b, s, p), jnp.int32)] * n_wta

    has_acc = acc is not None
    has_cin = carry_in is not None
    multi_out = has_carry or n_wta

    def kern(*refs):
        i = 2
        acc_ref = cin_c = cin_m = cout_c = cout_m = None
        if has_acc:
            acc_ref = refs[i]; i += 1
        if has_cin:
            cin_c, cin_m = refs[i], refs[i + 1]; i += 2
        out_ref = refs[i]; i += 1
        if has_carry:
            cout_c, cout_m = refs[i], refs[i + 1]; i += 2
        wta_refs = refs[i:i + n_wta]; i += n_wta
        cc, cm = refs[i], refs[i + 1]
        base(refs[0], refs[1], acc_ref, cin_c, cin_m,
             out_ref, cout_c, cout_m, wta_refs, cc, cm)

    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if multi_out else out_specs[0],
        out_shape=out_shapes if multi_out else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((n, d, p), jnp.int16 if compute16 else jnp.int32),
            pltpu.VMEM((n, 1, p), jnp.int16 if compute16 else jnp.int32),
        ],
        input_output_aliases=io_aliases,
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(*inputs)
    if not multi_out:
        return res
    res = list(res)
    out = res.pop(0)
    if s_true is not None:
        out = out[:, :s_true]        # drop the scan-axis padding rows
    carry_out = None
    if has_carry:
        carry_out = (res.pop(0), res.pop(0))
    planes = res
    if n_wta and has_carry:
        return out, carry_out, planes
    if n_wta:
        return out, planes
    return out, carry_out


def directional_scan_group(cost, p2, acc, rolls, reverse, p1, restart,
                           block_rows=32, carry_in=None, want_carry=False,
                           compute16=False):
    """Public carry-aware entry point for parallel/tiles.py; see
    ``_directional_scan_group``."""
    return _directional_scan_group(cost, p2, acc, rolls, reverse, p1,
                                   restart, block_rows, carry_in, want_carry,
                                   compute16=compute16)


# Full-frame VMEM scratch budget for the bidirectional fused scans: the
# forward pass parks its (S, D, P) uint16 row sums on-chip, so the pair of
# launches per direction group collapses to ONE and the partial volume
# never round-trips HBM.  56M leaves ~40M of the 96M scoped cap for the
# revolving chunk blocks.  Cone (24M vertical / 30M horizontal) qualifies;
# 720p+ and the big-D configs fall back to the two-launch path.
_BIDIR_CAP_BYTES = 56 * 1024 * 1024


def _bidir_fits(s: int, d: int, p: int, rows: int, n: int,
                wta_on: bool) -> bool:
    vol = s * d * p * 2                       # uint16 forward-sum scratch
    tot = rows * d * p * 4 if wta_on else 0   # int32 WTA chunk scratch
    carry = n * (d + 1) * p * 4
    return vol + tot + carry <= _BIDIR_CAP_BYTES


def _bidir_kernel(*refs, rows: int, d: int, w: int, nblk: int,
                  rolls_f: Sequence[int], rolls_b: Sequence[int], p1: int,
                  restart: bool, wta, has_acc: bool, want_volume: bool,
                  n_wta: int):
    """One (batch, direction, row-chunk) grid step of a BIDIRECTIONAL fused
    multi-direction DP scan (both halves of a direction group in a single
    launch).

    direction 0 (grid dim 1) scans chunks forward and parks each row's
    direction-group sum in the full-frame ``vol_acc`` VMEM scratch;
    direction 1 scans chunks in reverse, adds the parked forward sums (and
    the optional ``acc`` volume) and emits the final blocks — each output
    block is written by exactly one grid step, so there are no revisited
    output windows.  During the forward pass the output index map parks on
    the block the backward pass visits FIRST, so no flush happens at the
    direction transition either.

    Cuts HBM traffic vs the two-launch formulation by the full partial
    volume write + read (the uint16 (S, D, P) round trip), and — when
    ``wta`` is set — also drops the aggregated-volume store entirely (the
    fused final launch's volume output was write-only: only the WTA
    reduction planes are consumed downstream)."""
    i = 2
    cost_ref, p2_ref = refs[0], refs[1]
    acc_ref = None
    if has_acc:
        acc_ref = refs[i]; i += 1
    out_ref = None
    if want_volume:
        out_ref = refs[i]; i += 1
    wta_refs = refs[i:i + n_wta]; i += n_wta
    vol_acc, carry_cost, carry_min = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    tot_ref = out_ref if want_volume else refs[i]

    di = pl.program_id(1)
    ci = pl.program_id(2)
    sentinel = jnp.int32(SENTINEL)
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (d, w), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (d, w), 1)

    @pl.when(ci == 0)
    def _init():
        carry_cost[...] = jnp.zeros_like(carry_cost)
        carry_min[...] = jnp.zeros_like(carry_min)

    def make_step(rolls, reverse):
        # identical per-step math to _scan_group_kernel (bit-equality is
        # pinned by tests); only the row-sum destination differs per pass
        def step(s, _):
            row = rows - 1 - s if reverse else s
            cost_row = cost_ref[0, row].astype(jnp.int32) & 0xFF
            total = None
            for k, roll in enumerate(rolls):
                prev = carry_cost[k]
                pmin = carry_min[k]
                if roll:
                    prev = _roll(prev, roll, axis=1)
                    pmin = _roll(pmin, roll, axis=1)
                p2_row = p2_ref[0, 0, k, pl.ds(row, 1)].astype(jnp.int32)
                up = jnp.where(d_iota == 0, sentinel,
                               _roll(prev, 1, axis=0))
                dn = jnp.where(d_iota == d - 1, sentinel,
                               _roll(prev, -1, axis=0))
                m = jnp.minimum(jnp.minimum(prev, jnp.minimum(up, dn) + p1),
                                pmin + p2_row)
                cs = (cost_row + m - pmin) & 0xFF
                if restart and roll:
                    lane = 0 if roll > 0 else w - 1
                    cs = jnp.where(lane_iota == lane, cost_row, cs)
                carry_cost[k] = cs
                carry_min[k] = jnp.min(cs, axis=0, keepdims=True)
                total = cs if total is None else total + cs
            return row, total
        return step

    @pl.when(di == 0)
    def _forward():
        step = make_step(rolls_f, False)

        def body(s, _):
            row, total = step(s, None)
            g = ci * rows + row
            vol_acc[pl.ds(g, 1)] = total.astype(jnp.uint16)[None]
            return ()

        jax.lax.fori_loop(0, rows, body, ())

    @pl.when(di == 1)
    def _backward():
        blk = nblk - 1 - ci
        step = make_step(rolls_b, True)

        def body(s, _):
            row, total = step(s, None)
            total = total + vol_acc[pl.ds(blk * rows + row, 1)][0].astype(
                jnp.int32)
            if acc_ref is not None:
                total = total + acc_ref[0, row].astype(jnp.int32)
            if want_volume:
                tot_ref[0, row] = total.astype(jnp.uint16)
            else:
                tot_ref[pl.ds(row, 1)] = total[None]
            return ()

        jax.lax.fori_loop(0, rows, body, ())

        if wta is not None:
            dmin, include_inverse = wta
            a = tot_ref[...]
            load8 = lambda c: tot_ref[:, pl.ds(c * 8, 8), :]
            planes = _wta_reduce_block(a, rows=rows, d=d, w=w, dmin=dmin,
                                       include_inverse=include_inverse,
                                       load8=load8)
            for ref, val in zip(wta_refs, planes):
                ref[0] = val


def _directional_scan_group_bidir(
    cost: jnp.ndarray,       # (B, S, D, P) int8 — S pre-padded to a
    p2_fb: jnp.ndarray,      # block_rows multiple; (B, 2, n, S, P) int32
    acc: Optional[jnp.ndarray],   # (B, S, D, P) uint16 or None
    rolls_f: Sequence[int],
    rolls_b: Sequence[int],
    p1: int,
    restart: bool,
    block_rows: int,
    wta=None,                # (dmin, include_inverse) -> planes ONLY
):
    """Single-launch forward+backward fused DP scan group; see
    ``_bidir_kernel``.  Returns the (B, S, D, P) uint16 two-direction sum
    (added onto ``acc`` when given), or — with ``wta`` — only the WTA
    reduction plane list of the final totals."""
    b, s, d, p = cost.shape
    n = len(rolls_f)
    assert len(rolls_b) == n and s % block_rows == 0
    nblk = s // block_rows
    want_volume = wta is None
    n_wta = 0 if wta is None else (10 if wta[1] else 5)
    grid = (b, 2, nblk)

    def scan_blk(di, ci):
        return jnp.where(di == 0, ci, nblk - 1 - ci)

    def emit_blk(di, ci):
        # backward-pass blocks, reverse order; forward steps park on the
        # block the backward pass starts with (no transition flush)
        return jnp.where(di == 0, nblk - 1, nblk - 1 - ci)

    cost_spec = pl.BlockSpec((1, block_rows, d, p),
                             lambda bi, di, ci: (bi, scan_blk(di, ci), 0, 0),
                             memory_space=pltpu.VMEM)
    p2_spec = pl.BlockSpec(
        (1, 1, n, block_rows, p),
        lambda bi, di, ci: (bi, di, 0, scan_blk(di, ci), 0),
        memory_space=pltpu.VMEM)
    emit_spec = pl.BlockSpec((1, block_rows, d, p),
                             lambda bi, di, ci: (bi, emit_blk(di, ci), 0, 0),
                             memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, block_rows, p),
                              lambda bi, di, ci: (bi, emit_blk(di, ci), 0),
                              memory_space=pltpu.VMEM)

    in_specs = [cost_spec, p2_spec]
    inputs = [cost, p2_fb]
    if acc is not None:
        in_specs.append(emit_spec)
        inputs.append(acc)

    out_specs, out_shapes = [], []
    if want_volume:
        out_specs.append(emit_spec)
        out_shapes.append(jax.ShapeDtypeStruct((b, s, d, p), jnp.uint16))
    out_specs += [plane_spec] * n_wta
    out_shapes += [jax.ShapeDtypeStruct((b, s, p), jnp.int32)] * n_wta

    scratch = [
        pltpu.VMEM((s, d, p), jnp.uint16),
        pltpu.VMEM((n, d, p), jnp.int32),
        pltpu.VMEM((n, 1, p), jnp.int32),
    ]
    if not want_volume:
        scratch.append(pltpu.VMEM((block_rows, d, p), jnp.int32))

    res = pl.pallas_call(
        functools.partial(
            _bidir_kernel, rows=block_rows, d=d, w=p, nblk=nblk,
            rolls_f=tuple(rolls_f), rolls_b=tuple(rolls_b), p1=p1,
            restart=restart, wta=wta, has_acc=acc is not None,
            want_volume=want_volume, n_wta=n_wta),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if len(out_specs) > 1 else out_specs[0],
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(*inputs)
    if want_volume:
        return res
    return list(res) if n_wta > 1 else [res]


def int16_safe(p1: int, p2_init: int) -> bool:
    """Whether the packed-int16 recurrence cannot overflow for these
    penalties.  Worst-case intermediates: ``min(up, dn) + p1 <= 255 + p1``
    and ``pmin + p2_row <= 255 + max(p1, p2_init)`` (see
    ``_scan_group_kernel``); everything else is <= 2040.  Reference-scale
    penalties (10/150) pass with orders of magnitude to spare."""
    return max(p1, p2_init) + 512 <= 32767


def _p2_planes(img: jnp.ndarray, rolls: Sequence[int], axis_prev: int,
               p1: int, p2_init: int,
               prev_row: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, S, P) int32 image -> (B, S, nrolls, P) adaptive-P2 planes.

    axis_prev: +1 if the previous path pixel is at scan index s-1 (forward
    scan), -1 for s+1 (reverse).  Lane roll r means the carry is rolled by
    r before use, i.e. the previous pixel sits at lane j - r (mod P).

    ``prev_row`` (B, P): the neighbour-tile boundary gray row replacing the
    wrapped edge row (index 0 for forward scans, -1 for reverse) — the gray
    component of the cross-tile ScanCarry.  For a fresh path start its
    value is irrelevant (a zero DP carry makes the P2 term non-binding)."""
    prev_s = jnp.roll(img, axis_prev, axis=-2)
    if prev_row is not None:
        edge = 0 if axis_prev == +1 else prev_s.shape[-2] - 1
        prev_s = prev_s.at[..., edge, :].set(prev_row)
    planes = []
    for r in rolls:
        prev = jnp.roll(prev_s, r, axis=-1) if r else prev_s
        p2 = jnp.maximum(p1, p2_init // (jnp.abs(img - prev) + 1))
        planes.append(p2)
    return jnp.stack(planes, axis=-2).astype(jnp.int32)


def _use_bidir(bidir, compute16: bool, s: int, d: int, p: int,
               rows: int, n: int, wta_on: bool) -> bool:
    if bidir is True:
        return True
    return (bidir == "auto" and not compute16
            and _bidir_fits(s, d, p, rows, n, wta_on))


def _stack_p2_fb(p2_f: jnp.ndarray, p2_b: jnp.ndarray) -> jnp.ndarray:
    """Two (B, S, n, P) P2 planes -> the bidir kernel's dir-major
    (B, 2, n, S, P) layout (each direction's plane a contiguous (S, P)
    tile, like the plain scans' nsp layout)."""
    return jnp.stack((p2_f, p2_b), axis=1).transpose(0, 1, 3, 2, 4)


@functools.partial(jax.jit, static_argnames=(
    "options", "diagonal_mode", "block_rows", "compute16", "bidir"))
def aggregate_paths(
    cost: jnp.ndarray,
    img_left: jnp.ndarray,
    options: SGMOptions,
    diagonal_mode: str = "wrap",
    block_rows=None,
    compute16: bool = False,
    bidir="auto",
) -> jnp.ndarray:
    """Pallas multi-path aggregation, bit-equal to ``aggregation.aggregate_paths``.

    cost: (..., H, D, W) uint8; img_left: (..., H, W) uint8.
    Returns (..., H, D, W) uint16.  Accepts an optional leading batch dim.
    ``bidir``: "auto" fuses each direction pair into one launch when the
    full-frame VMEM scratch fits (see ``_bidir_fits``); True forces it,
    False keeps the two-launch formulation.
    """
    restart = diagonal_mode == "restart"
    unbatched = cost.ndim == 3
    if unbatched:
        cost = cost[None]
        img_left = img_left[None]
    b, h, d, w = cost.shape
    p1, p2i = options.p1, options.p2_init
    compute16 = compute16 and int16_safe(p1, p2i)
    img = img_left.astype(jnp.int32)

    cost8 = cost.astype(jnp.int8)  # values <= 127 + border 127: exact
    req = block_rows
    block_rows = _pick_block_rows(h, d, w, block_rows)
    hp = _round_up(h, block_rows)

    part_h = horizontal_partial(cost8, img, p1, p2i, restart, req,
                                compute16=compute16, bidir=bidir)

    # ---- vertical groups (6 of 8 paths; 2 of 4) --------------------------
    (v_rolls_f, v_rolls_b, cost_v, p2_f, p2_b,
     pad_p2) = _vertical_setup(cost8, img, options.num_paths, p1, p2i, hp, h)
    if _use_bidir(bidir, compute16, hp, d, w, block_rows, len(v_rolls_f),
                  wta_on=False):
        pad_vol = ((0, 0), (0, hp - h), (0, 0), (0, 0))
        out = _directional_scan_group_bidir(
            cost_v, _stack_p2_fb(jnp.pad(p2_f, pad_p2), jnp.pad(p2_b, pad_p2)),
            jnp.pad(part_h, pad_vol), v_rolls_f, v_rolls_b, p1, restart,
            block_rows)[:, :h]
        return out[0] if unbatched else out

    part_v = _directional_scan_group(
        cost_v, jnp.pad(p2_f, pad_p2), None, v_rolls_f, False, p1, restart,
        block_rows, compute16=compute16)
    part_v = _directional_scan_group(
        cost_v, jnp.pad(p2_b, pad_p2), part_v, v_rolls_b, True, p1, restart,
        block_rows, compute16=compute16)[:, :h]

    out = part_v + part_h
    return out[0] if unbatched else out


@functools.partial(jax.jit, static_argnames=(
    "options", "diagonal_mode", "block_rows", "include_inverse",
    "compute16", "bidir"))
def aggregate_paths_wta(
    cost: jnp.ndarray,
    img_left: jnp.ndarray,
    options: SGMOptions,
    diagonal_mode: str = "wrap",
    block_rows=None,
    include_inverse: bool = True,
    compute16: bool = False,
    bidir="auto",
):
    """Fused aggregation + WTA: the horizontal passes run first, the two
    vertical group launches accumulate onto them (io-aliased), and the
    FINAL launch computes the WTA reduction planes on each finished chunk
    while it is still VMEM-resident.  The aggregated volume is never
    re-read by a separate WTA pass and the XLA partial-sum add disappears.

    Returns (forward WTAPlanes, inverse WTAPlanes or None) — bit-equal to
    ``aggregate_paths`` + ``wta_reduce_pallas``.

    The inverse-shear runs as a fori_loop over 8-disparity slabs with
    dynamic lane rotates, so the Mosaic program is O(D/8) and the fused
    launch compiles at least up to D=256 (verified); beyond the tested
    bound the two-pass path runs instead — same results, slightly more
    HBM traffic.
    """
    from .wta import WTAPlanes

    restart = diagonal_mode == "restart"
    unbatched = cost.ndim == 3
    if unbatched:
        cost = cost[None]
        img_left = img_left[None]
    b, h, d, w = cost.shape

    if d > 256 and not _interpret():
        aggr = aggregate_paths(cost, img_left, options, diagonal_mode,
                               block_rows, compute16=compute16)
        fwd, inv = wta_reduce_pallas(aggr, options, include_inverse)
        if unbatched:
            return (WTAPlanes(*(x[0] for x in fwd)),
                    WTAPlanes(*(x[0] for x in inv)) if inv else None)
        return fwd, inv
    p1, p2i = options.p1, options.p2_init
    compute16 = compute16 and int16_safe(p1, p2i)
    img = img_left.astype(jnp.int32)

    cost8 = cost.astype(jnp.int8)
    req = block_rows
    block_rows = _pick_block_rows(h, d, w, block_rows)
    hp = _round_up(h, block_rows)
    pad_vol = ((0, 0), (0, hp - h), (0, 0), (0, 0))

    part_h = horizontal_partial(cost8, img, p1, p2i, restart, req,
                                compute16=compute16, bidir=bidir)

    (v_rolls_f, v_rolls_b, cost_v, p2_f, p2_b,
     pad_p2) = _vertical_setup(cost8, img, options.num_paths, p1, p2i, hp, h)

    if _use_bidir(bidir, compute16, hp, d, w, block_rows, len(v_rolls_f),
                  wta_on=True):
        # single launch for both vertical passes; no aggregated-volume
        # store at all — only the WTA planes leave the chip
        planes = _directional_scan_group_bidir(
            cost_v, _stack_p2_fb(jnp.pad(p2_f, pad_p2), jnp.pad(p2_b, pad_p2)),
            jnp.pad(part_h, pad_vol), v_rolls_f, v_rolls_b, p1, restart,
            block_rows, wta=(options.min_disparity, include_inverse))
    else:
        part = _directional_scan_group(
            cost_v, jnp.pad(p2_f, pad_p2), jnp.pad(part_h, pad_vol),
            v_rolls_f, False, p1, restart, block_rows, compute16=compute16)
        _, planes = _directional_scan_group(
            cost_v, jnp.pad(p2_b, pad_p2), part, v_rolls_b, True, p1, restart,
            block_rows, wta=(options.min_disparity, include_inverse),
            compute16=compute16)

    def crop(x):
        x = x[:, :h]
        return x[0] if unbatched else x

    fwd = WTAPlanes(*(crop(o) for o in planes[:5]))
    inv = WTAPlanes(*(crop(o) for o in planes[5:])) if include_inverse \
        else None
    return fwd, inv


def _vertical_setup(cost8, img, num_paths: int, p1: int, p2i: int,
                    hp: int, h: int):
    """Shared vertical-group operands for aggregate_paths and the fused
    aggregate_paths_wta (keeps their documented bit-equality single-sourced):
    forward/backward roll sets, the scan-axis-padded cost, both P2 planes
    and the matching pad tuple."""
    v_rolls_f = (0, 1, -1) if num_paths == 8 else (0,)
    v_rolls_b = (0, -1, 1) if num_paths == 8 else (0,)
    pad = ((0, 0), (0, hp - h), (0, 0), (0, 0))
    cost_v = jnp.pad(cost8, pad)
    p2_f = _p2_planes(img, v_rolls_f, +1, p1, p2i)
    p2_b = _p2_planes(img, v_rolls_b, -1, p1, p2i)
    return v_rolls_f, v_rolls_b, cost_v, p2_f, p2_b, pad


def horizontal_partial(cost8: jnp.ndarray, img: jnp.ndarray, p1: int,
                       p2_init: int, restart: bool,
                       block_rows=None,
                       compute16: bool = False,
                       bidir="auto") -> jnp.ndarray:
    """Both horizontal passes on the (W, D, H) view; tile-local in the
    H-sharded layout, so parallel/tiles.py reuses it verbatim.

    cost8: (B, H, D, W) int8; img: (B, H, W) int32.
    Returns the (B, H, D, W) uint16 sum of the two horizontal directions."""
    b, h, d, w = cost8.shape
    # idempotent re-gate: this is also a public entry for parallel/tiles.py,
    # so the overflow check cannot live solely in aggregate_paths*
    compute16 = compute16 and int16_safe(p1, p2_init)
    block_rows = _pick_block_rows(w, d, h, block_rows)
    wp = _round_up(w, block_rows)
    cost_t = jnp.pad(cost8.transpose(0, 3, 2, 1),
                     ((0, 0), (0, wp - w), (0, 0), (0, 0)))
    img_t = img.transpose(0, 2, 1)
    p2_hf = _p2_planes(img_t, (0,), +1, p1, p2_init)
    p2_hb = _p2_planes(img_t, (0,), -1, p1, p2_init)
    pad_p2t = ((0, 0), (0, wp - w), (0, 0), (0, 0))
    if _use_bidir(bidir, compute16, wp, d, h, block_rows, 1, wta_on=False):
        part_h = _directional_scan_group_bidir(
            cost_t,
            _stack_p2_fb(jnp.pad(p2_hf, pad_p2t), jnp.pad(p2_hb, pad_p2t)),
            None, (0,), (0,), p1, restart, block_rows)[:, :w]
        return part_h.transpose(0, 3, 2, 1)
    part_h = _directional_scan_group(
        cost_t, jnp.pad(p2_hf, pad_p2t), None, (0,), False, p1, restart,
        block_rows, compute16=compute16)
    part_h = _directional_scan_group(
        cost_t, jnp.pad(p2_hb, pad_p2t), part_h, (0,), True, p1, restart,
        block_rows, compute16=compute16)[:, :w]
    return part_h.transpose(0, 3, 2, 1)


BIG = 1 << 30
_U16 = 65535


def _wta_reduce_block(a, *, rows: int, d: int, w: int, dmin: int,
                      include_inverse: bool, load8=None):
    """WTA volume reductions for one (rows, D, W) int32 block; returns the
    5 (or 10, with the inverse view) (rows, W) int32 planes.

    Forward view: first-argmin/min/second-min/neighbour costs over the d
    axis via a packed (cost << kshift | d) key min — ties break to the
    smaller d, matching the reference's first-minimum scan.  kshift =
    ceil(log2(d)) bits, so any disparity range up to 16384 fits the int32
    key with the 16-bit costs (capacity by tiling, not static caps).

    Inverse view (``ComputeDisparity`` with inverse, SemiGlobalMatching.c
    :394-409): right cost R[r, k, j] = aggr[r, k, j + dmin + k], out of
    range -> UINT16_MAX.  The shear is applied lane-roll-by-lane-roll in a
    static d loop on (R, W) planes — no gathers.

    Shared by the standalone WTA kernel and the fused final-aggregation
    launch (the block is already resident in VMEM there).
    """
    kshift = max(8, _ceil_log2(d))
    kmask = (1 << kshift) - 1
    kidx = jax.lax.broadcasted_iota(jnp.int32, (rows, d, w), 1)

    key = (a << kshift) | kidx
    kmin = jnp.min(key, axis=1)                              # (R, W)
    best = kmin & kmask
    minc = kmin >> kshift
    bestb = best[:, None, :]
    onbest = kidx == bestb
    sec = jnp.min(jnp.where(onbest, BIG, a), axis=1)
    up = jnp.where(kidx == 0, a, _roll(a, 1, axis=1))        # cost[clip(k-1)]
    dn = jnp.where(kidx == d - 1, a, _roll(a, -1, axis=1))   # cost[clip(k+1)]
    c1 = jnp.min(jnp.where(onbest, up, BIG), axis=1)
    c2 = jnp.min(jnp.where(onbest, dn, BIG), axis=1)

    outs = [best, minc, sec, c1, c2]

    if include_inverse:
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)

        # Single online pass: min1/min2 key tracking gives first-argmin,
        # min and second-min (the 2nd-smallest key's cost is exactly the
        # min over k != argmin since keys are distinct in k); rc1 latches
        # the previous plane whenever the minimum changes hands, rc2
        # latches the plane following the currently-best k.
        big_key = (_U16 << kshift) | kmask
        min1 = jnp.full((rows, w), big_key, jnp.int32)
        min2 = jnp.full((rows, w), big_key, jnp.int32)
        rc1 = jnp.zeros((rows, w), jnp.int32)
        rc2 = jnp.zeros((rows, w), jnp.int32)
        prev = jnp.zeros((rows, w), jnp.int32)

        def update(state, k, cur, first):
            min1, min2, rc1, rc2, prev = state
            key = (cur << kshift) | k
            took = key < min1
            min2 = jnp.minimum(min2, jnp.where(took, min1, key))
            min1 = jnp.minimum(min1, key)
            rc1 = jnp.where(took, jnp.where(first, cur, prev), rc1)
            rc2 = jnp.where(jnp.logical_not(first)
                            & ((min1 & kmask) == k - 1), cur, rc2)
            return (min1, min2, rc1, rc2, cur)

        state = (min1, min2, rc1, rc2, prev)
        k0 = 0
        if load8 is not None and d > 128:
            # Dynamic shear: iterate 8-disparity slabs in a fori_loop with
            # runtime lane rolls — O(d/8) Mosaic program size instead of an
            # O(d) unroll, which crashes the compiler for the big fused
            # launches (D=256).  load8(c) reads the 8-aligned slab
            # a[:, 8c:8c+8, :] from the VMEM ref.  Gated to d > 128: the
            # static unroll is ~2% faster at runtime and compiles fine for
            # small ranges (cone headline stays at full speed).
            #
            # tpu.dynamic_rotate needs a native lane width, so the slab is
            # lane-padded to a 128 multiple before rolling; the used lanes
            # (j + dd < w <= wp) never read a wrapped value, so slicing
            # back to w is exact.
            nfull = d // 8
            wp = _round_up(w, 128)

            def chunk(c, state):
                slab = load8(c)                           # (R, 8, W) int32
                if wp != w:
                    slab = jnp.pad(slab, ((0, 0), (0, 0), (0, wp - w)))
                for j in range(8):
                    k = c * 8 + j
                    dd = dmin + k
                    valid = (lane + dd >= 0) & (lane + dd < w)
                    rolled = pltpu.roll(slab[:, j, :], (-dd) % wp,
                                        axis=1)[:, :w]
                    cur = jnp.where(valid, rolled, _U16)
                    state = update(state, k, cur, k == 0)
                return state

            state = jax.lax.fori_loop(0, nfull, chunk, state)
            k0 = nfull * 8

        for k in range(k0, d):                           # static remainder
            dd = dmin + k
            valid = (lane + dd >= 0) & (lane + dd < w)
            cur = jnp.where(valid, _roll(a[:, k, :], -dd, axis=1), _U16)
            state = update(state, k, cur, k == 0)

        min1, min2, rc1, rc2, prev = state
        rbest = min1 & kmask
        rminc = min1 >> kshift
        # d == 1: min2 is never beaten (single plane), so match the jnp
        # reference's empty-set second-min (BIG), not the unpacked sentinel
        rsec = min2 >> kshift if d > 1 \
            else jnp.full((rows, w), BIG, jnp.int32)
        rc2 = jnp.where(rbest == d - 1, prev, rc2)
        outs += [rbest, rminc, rsec, rc1, rc2]

    return outs


def _wta_kernel(aggr_ref, *out_refs, rows: int, d: int, w: int,
                dmin: int, include_inverse: bool):
    """Standalone WTA reduction over one (batch, row-chunk) volume block."""
    a = aggr_ref[0].astype(jnp.int32)                        # (R, D, W)
    # slab loads cover c < d//8 (always in-bounds); the static remainder
    # in _wta_reduce_block handles d % 8 trailing planes
    load8 = lambda c: aggr_ref[0, :, pl.ds(c * 8, 8), :].astype(jnp.int32)
    outs = _wta_reduce_block(a, rows=rows, d=d, w=w, dmin=dmin,
                             include_inverse=include_inverse, load8=load8)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


@functools.partial(
    jax.jit, static_argnames=("options", "include_inverse", "block_rows"))
def wta_reduce_pallas(aggr: jnp.ndarray, options: SGMOptions,
                      include_inverse: bool = True, block_rows: int = 16):
    """aggr (..., H, D, W) uint16 -> (forward WTAPlanes, inverse or None).

    One streaming pass over the volume computes both views' reduction
    planes; ``wta.finalize_disparity`` turns them into disparities.
    """
    from .wta import WTAPlanes

    unbatched = aggr.ndim == 3
    if unbatched:
        aggr = aggr[None]
    b, h, d, w = aggr.shape
    if d > 16384:
        raise ValueError(
            f"disparity range {d} > 16384: cost<<ceil_log2(d) | d no longer "
            "fits an int32 argmin key")
    block_rows = _auto_block_rows(d, w, block_rows)
    hp = _round_up(h, block_rows)
    aggr_p = jnp.pad(aggr, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    grid = (b, hp // block_rows)

    n_out = 10 if include_inverse else 5
    plane_spec = pl.BlockSpec(
        (1, block_rows, w), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(
            _wta_kernel, rows=block_rows, d=d, w=w,
            dmin=options.min_disparity, include_inverse=include_inverse),
        grid=grid,
        in_specs=[pl.BlockSpec((1, block_rows, d, w),
                               lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[plane_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((b, hp, w), jnp.int32)] * n_out,
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(aggr_p)

    def crop(x):
        x = x[:, :h]
        return x[0] if unbatched else x

    fwd = WTAPlanes(*(crop(o) for o in outs[:5]))
    inv = WTAPlanes(*(crop(o) for o in outs[5:])) if include_inverse else None
    return fwd, inv


def _ceil_log2(n: int) -> int:
    k = 0
    while (1 << k) < n:
        k += 1
    return k


# Pixel budget of the in-VMEM speckle label kernel (~95 B/pixel vs the
# 116M scoped cap; 720p = 0.92M fits, 1.10M strips still failed to
# compile, 1.5M spills 143M — so cap just above 720p).
_SPECKLE_VMEM_PIXELS = 950_000

# Lane width of the banded histogram/verdict pixel chunks (tests shrink it
# to exercise banding on small frames).
_SPECKLE_PC = 2048

# Frame-size gate for the precomputed doubling-mask pyramid in
# _cc_propagate: the pyramid adds ~4*ceil_log2(max(h, w)) B/pixel of
# loop-invariant VMEM on top of the ~95 B/pixel the label kernel already
# holds, so frames near the 950K-pixel budget (720p single-piece, big-frame
# strips) keep the recompute-per-round scheme; everything smaller (cone
# 169K, KITTI-geometry 466K) takes the measured-faster pyramid
# (results/speckle_probe.json: 0.518 vs 0.679 ms/frame on cone, bit-equal).
_PYR_PIXEL_CAP = 700_000


def _cc_propagate(get_val, set_val, get_mask, *, h: int, w: int, big):
    """Min-propagate a VMEM plane to its per-component fixed point.

    ``get_val``/``set_val`` read/write the (h, w) int32 value plane;
    ``get_mask`` reads the packed edge bitmask (bit 0: link to (r, c-1);
    bit 1: link to (r-1, c); bits 2-5: the diagonals in ``_CC_OFFSETS``
    order).  Each while round applies segmented min over horizontal and
    vertical runs (Hillis-Steele doubling with explicit identity shift-in,
    no wrap contamination) plus 4 masked diagonal shift-mins, alternating
    with a cheap 8-neighbour shift-min round.  Convergence = fixed point =
    per-component-constant values = the component minimum.

    Scheme choice (measured on the cone pre-speckle disparity, the real
    component structure): alternating seg/cheap reaches the fixed point in
    15 rounds ~= 39 cheap-round-equivalents at ~4:1 seg:cheap cost, vs 11
    seg-only rounds (~44) and 125 cheap-only; adding segmented *diagonal*
    doubling converges in 8 rounds but doubles the per-round cost (~64) —
    the alternation stands.

    The run-link doubling masks are STATIC across rounds (connectivity
    never changes), so for frames under ``_PYR_PIXEL_CAP`` they are
    precomputed once into a packed int32 pyramid (plane s, bits: 0
    fwd-lane, 1 bwd-lane, 2 fwd-row, 3 bwd-row = link at stride 2^s with
    the array-edge ok-mask folded in), cutting each doubling step from 8
    VPU ops per direction to 5 and halving its rolls — 0.679 -> 0.518
    ms/frame on cone, bit-equal (results/speckle_probe.json; pair-rounds,
    fewer-checks and 4-frame-block variants all measured neutral-to-worse
    there, so the round structure itself stands)."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    use_pyr = h * w <= _PYR_PIXEL_CAP

    def seg_min_doubling(lab, conn, axis, n):
        """Segmented min over runs along `axis`; conn (int32 0/1) links k
        to k-1.  Explicit identity shift-in at the array edge keeps the
        circular rolls from contaminating runs."""
        fwd_c, fwd_v = conn, lab
        bwd_c, bwd_v = _roll(conn, -1, axis), lab  # bwd link: k to k+1
        iota = row_iota if axis == 0 else lane_iota
        for step in range(_ceil_log2(n)):
            s = 1 << step
            ok = iota >= s
            fwd_v = jnp.minimum(fwd_v, jnp.where(
                (fwd_c != 0) & ok, _roll(fwd_v, s, axis), big))
            fwd_c = fwd_c & jnp.where(ok, _roll(fwd_c, s, axis), 0)
            ok_b = iota < n - s
            bwd_v = jnp.minimum(bwd_v, jnp.where(
                (bwd_c != 0) & ok_b, _roll(bwd_v, -s, axis), big))
            bwd_c = bwd_c & jnp.where(ok_b, _roll(bwd_c, -s, axis), 0)
        return jnp.minimum(fwd_v, bwd_v)

    def build_pyramid(m):
        """Loop-invariant packed doubling masks (see docstring)."""
        state = []
        for axis, n, cbit in ((1, w, 0), (0, h, 1)):
            conn = (m >> cbit) & 1
            state.append([conn, _roll(conn, -1, axis), axis, n])
        pyr = []
        for step in range(max(_ceil_log2(w), _ceil_log2(h))):
            s = 1 << step
            plane = jnp.zeros((h, w), jnp.int32)
            for k, (fwd_c, bwd_c, axis, n) in enumerate(state):
                if s >= n:
                    continue
                iota = lane_iota if axis == 1 else row_iota
                ok = iota >= s
                ok_b = iota < n - s
                plane |= jnp.where((fwd_c != 0) & ok, 1 << (2 * k), 0)
                plane |= jnp.where((bwd_c != 0) & ok_b, 2 << (2 * k), 0)
                state[k][0] = fwd_c & jnp.where(ok, _roll(fwd_c, s, axis), 0)
                state[k][1] = bwd_c & jnp.where(
                    ok_b, _roll(bwd_c, -s, axis), 0)
            pyr.append(plane)
        return pyr

    def seg_axis_pyr(v, pyr, axis, n, fbit, bbit):
        fwd_v, bwd_v = v, v
        for step in range(_ceil_log2(n)):
            s = 1 << step
            p = pyr[step]
            fwd_v = jnp.minimum(fwd_v, jnp.where(
                (p & fbit) != 0, _roll(fwd_v, s, axis), big))
            bwd_v = jnp.minimum(bwd_v, jnp.where(
                (p & bbit) != 0, _roll(bwd_v, -s, axis), big))
        return jnp.minimum(fwd_v, bwd_v)

    def diag_pass(new, m):
        for bit, (dr, dc) in zip((2, 3, 4, 5), _CC_OFFSETS[2:]):
            nl = _roll(_roll(new, -dr, 0), -dc, 1)
            new = jnp.minimum(new, jnp.where((m & (1 << bit)) != 0, nl, big))
        return new

    if use_pyr:
        pyramid = build_pyramid(get_mask())

        def seg_round(lab, m):
            new = seg_axis_pyr(lab, pyramid, 1, w, 1, 2)
            new = seg_axis_pyr(new, pyramid, 0, h, 4, 8)
            return diag_pass(new, m)
    else:
        def seg_round(lab, m):
            new = seg_min_doubling(lab, m & 1, 1, w)
            new = seg_min_doubling(new, (m >> 1) & 1, 0, h)
            return diag_pass(new, m)

    def cheap_round(lab, m):
        """One masked shift-min over all 8 edges (~4x cheaper than the
        log-depth segmented round).  Both round types cover every edge, so
        a no-change fixed point of either implies per-component-constant
        labels — full convergence."""
        new = lab
        for shift, axis in ((1, 1), (-1, 1), (1, 0)):
            conn = m & 1 if axis == 1 else (m >> 1) & 1
            if shift > 0:
                nl = _roll(lab, 1, axis)
                edge = conn != 0
            else:
                nl = _roll(lab, -1, axis)
                edge = _roll(conn, -1, axis) != 0
            new = jnp.minimum(new, jnp.where(edge, nl, big))
        # downward column link (r+1 -> r) uses the shifted column mask
        nl = _roll(new, -1, 0)
        edge = _roll((m >> 1) & 1, -1, 0) != 0
        new = jnp.minimum(new, jnp.where(edge, nl, big))
        return diag_pass(new, m)

    def body(state):
        _, it = state
        lab = get_val()
        m = get_mask()
        # Alternate: segmented rounds give log-depth long-range hops, the
        # cheap rounds mop up locally at a quarter of the cost.
        new = jax.lax.cond(it % 2 == 0, seg_round, cheap_round, lab, m)
        set_val(new)
        return jnp.any(new != lab), it + 1

    jax.lax.while_loop(lambda s: s[0], body, (jnp.bool_(True), jnp.int32(0)))


# Diagonal edge order for the packed connectivity bitmask (bits 2-5).
_CC_OFFSETS = ((0, -1), (-1, 0), (-1, -1), (-1, 1), (1, -1), (1, 1))


def _speckle_labels_kernel(disp_ref, out_ref, mask_ref,
                           *, h: int, w: int, diff: float, lo_bits: int):
    """Connected-component min-labels for one frame, entirely in VMEM.

    Labels are initialised to ``(row << lo_bits) | col`` (lo_bits =
    ceil_log2(w)) — the same lexicographic (row, col) order as flat
    indices, so min-propagation converges to the component's top-leftmost
    pixel, but the high/low bit split of a label IS its (row, col): the
    histogram's count for a component lands at its root pixel's position
    in the (h, 1 << lo_bits) root plane.  The packed edge bitmask lives in
    the ``mask_ref`` VMEM scratch — nothing downstream needs it (the
    verdict is delivered by a banded MXU gather, not a second
    propagation), so it never touches HBM.
    """
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    disp = disp_ref[0]
    finite = jnp.isfinite(disp)           # NaN/-inf-consistent with the jnp
    finite_i = finite.astype(jnp.int32)   # path; Mosaic can't rotate 1-bit
    # vectors, hence the int32 copy
    d = jnp.where(finite, disp, jnp.float32(1e30))

    def edge(dr, dc):
        """True where pixel links to neighbour at (r+dr, c+dc)."""
        nd = _roll(_roll(d, -dr, 0), -dc, 1)
        nf = _roll(_roll(finite_i, -dr, 0), -dc, 1) != 0
        ok = finite & nf & (jnp.abs(d - nd) <= jnp.float32(diff))
        if dr > 0:
            ok &= row_iota < h - dr
        elif dr < 0:
            ok &= row_iota >= -dr
        if dc > 0:
            ok &= lane_iota < w - dc
        elif dc < 0:
            ok &= lane_iota >= -dc
        return ok

    masks = jnp.zeros((h, w), jnp.int32)
    for bit, (dr, dc) in enumerate(_CC_OFFSETS):
        masks = masks | jnp.where(edge(dr, dc), 1 << bit, 0)
    mask_ref[...] = masks
    out_ref[0] = (row_iota << lo_bits) | lane_iota

    _cc_propagate(lambda: out_ref[0], lambda v: out_ref.__setitem__(0, v),
                  lambda: mask_ref[...], h=h, w=w,
                  big=jnp.int32(h << lo_bits))


def _speckle_band_geometry(h: int, w: int, min_area: int,
                           pc: int = 2048) -> tuple:
    """(chunks per group, row band, padded hist rows) for the banded
    speckle matmuls.

    A component with < min_area pixels lies within min_area-1 rows BELOW
    its root (the top-leftmost member has the minimum row): any member
    connects to the root by a path of <= area-1 < min_area pixels, which
    crosses < min_area rows.  Two exactness consequences:

    * histogram: counting only pixels whose root row is within the band
      keeps every small component's count exact, and a component whose
      members reach past the band contains >= min_area in-band path
      pixels (one per crossed row), so it still classifies as not-small;
    * verdict gather: a pixel whose root row is above the band belongs to
      a component spanning >= min_area rows — not small — and the banded
      gather's implicit zero is exactly that verdict.

    So both contractions only touch a [start, start+band) slice of the
    (h, 1 << lo_bits) root plane.  The group size is chosen so the band
    fits one 128-row MXU block — that cap is what makes banding cheaper
    than the full-height contraction (~h/128 x fewer MACs).  All row
    quantities are 16-aligned: the root-small plane rides as bf16, whose
    Mosaic tile is (16, 128), so the dynamic band offset and both the
    band and the plane height must sit on 16-row boundaries."""
    h_hist = _round_up(h, 16)
    g = 1
    for cand in range(16, 0, -1):
        rows = -(-cand * pc // w) + 1
        if _round_up(rows + (min_area - 1) + 16, 16) <= 128:
            g = cand
            break
    rows = -(-g * pc // w) + 1
    band = min(h_hist, _round_up(rows + (min_area - 1) + 16, 16))
    return g, band, h_hist


def _speckle_band_start(gi, *, g: int, pc: int, w: int, a: int, band: int,
                        h_hist: int):
    """16-aligned first root row of group ``gi``'s band (see
    ``_speckle_band_geometry``): covers [r - (a-1), r] for every pixel
    row r the group touches, clamped into the padded plane."""
    rlo = (gi * g * pc) // w
    start = jnp.maximum(rlo - (a - 1), 0)
    start = jnp.minimum((start // 16) * 16, h_hist - band)
    # Mosaic must statically prove the dynamic sublane offset's alignment
    # (both h_hist and band are 16-multiples, so the min stays aligned)
    return pl.multiple_of(start, 16)


def _speckle_hist_kernel(lab_ref, out_ref, *, g: int, pc: int, band: int,
                         lo_bits: int, a: int, w: int, h_hist: int):
    """Banded MXU histogram: label l splits into (l >> lo_bits, l & mask)
    = its root's (row, col); per group of g pixel chunks the two one-hot
    matrices (pixels on the lane axis) contract on the MXU into a
    (band, 1 << lo_bits) int32 tile accumulated into the root plane at the
    group's band offset.  Replaces XLA scatter-add (near-serial on TPU).
    One-hots ride as int8 with int32 accumulation — exact, and measured
    1.56x the bf16/f32 path (results/speckle_tail_probe.json: base8 0.163
    vs base 0.253 ms/frame; the MXU's int8 path doubles the bf16 rate).
    Invalid and padded pixels carry the sentinel label h_hist << lo_bits,
    whose row can never match an in-band iota."""
    gi = pl.program_id(1)
    lo = 1 << lo_bits

    @pl.when(gi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    start = _speckle_band_start(gi, g=g, pc=pc, w=w, a=a, band=band,
                                h_hist=h_hist)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (band, pc), 0) + start
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, pc), 0)
    tile = lab_ref[0, 0]                                  # (1, g*Pc) int32
    acc = jnp.zeros((band, lo), jnp.int32)
    for j in range(g):
        row = tile[:, j * pc:(j + 1) * pc]                # (1, Pc)
        am = (k_iota == (row >> lo_bits)).astype(jnp.int8)
        pm = (l_iota == (row & (lo - 1))).astype(jnp.int8)
        acc += jax.lax.dot_general(
            am, pm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    out_ref[0, pl.dslice(start, band), :] += acc


def _speckle_verdict_kernel(lab_ref, m_ref, out_ref, *, g: int, pc: int,
                            band: int, lo_bits: int, a: int, w: int,
                            h_hist: int):
    """Banded MXU gather of the root-small verdict: v(p) =
    M[root_row(p), root_col(p)] via Q = M_band @ onehot_col followed by a
    sublane-reduced elementwise product with onehot_row — one exact 0/1
    per pixel, no second propagation pass over the frame (each small
    component's verdict is read from its root, not flooded to it).
    int8 operands / int32 accumulation, exact (see _speckle_hist_kernel's
    measured A/B)."""
    gi = pl.program_id(1)
    lo = 1 << lo_bits
    start = _speckle_band_start(gi, g=g, pc=pc, w=w, a=a, band=band,
                                h_hist=h_hist)
    m_band = m_ref[0, pl.dslice(start, band), :]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (band, pc), 0) + start
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, pc), 0)
    tile = lab_ref[0, 0]                                  # (1, g*Pc) int32
    rows = []
    for j in range(g):
        row = tile[:, j * pc:(j + 1) * pc]                # (1, Pc)
        am = (k_iota == (row >> lo_bits)).astype(jnp.int32)
        pm = (l_iota == (row & (lo - 1))).astype(jnp.int8)
        q = jax.lax.dot_general(                          # (band, Pc)
            m_band, pm, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        rows.append(jnp.sum(am * q, axis=0,
                            keepdims=True).astype(jnp.float32))
    out_ref[0, 0] = jnp.concatenate(rows, axis=1)         # (1, g*Pc)


@functools.partial(jax.jit, static_argnames=("diff_insame", "min_area"))
def remove_speckles_pallas(disp: jnp.ndarray, diff_insame: float = 1.0,
                           min_area: int = 50) -> jnp.ndarray:
    """Pallas connected-component speckle filter, bit-exact vs the
    reference BFS (same fixed point as postprocess.remove_speckles).

    disp: (..., H, W) float32 with +inf invalid."""
    unbatched = disp.ndim == 2
    if unbatched:
        disp = disp[None]
    batch = disp.shape[:-2]
    h, w = disp.shape[-2:]

    # The label kernel keeps the whole frame plus the while-loop's log-depth
    # temporaries resident in VMEM (~95 B/pixel measured: 1.5M pixels hit
    # 143M of register spills vs the 116M cap).  Larger frames are split
    # into row strips with a min_area-row halo, which is EXACT: a component
    # with < min_area pixels fits within Chebyshev radius min_area-1 of any
    # member (a connected path between members has <= area-1 steps), so the
    # halo window sees such components whole; and a component reaching past
    # the halo contains a path of >= min_area pixels inside the window, so
    # its local count already classifies it as not-small.
    if h * w > _SPECKLE_VMEM_PIXELS:
        a = min_area
        strip = _SPECKLE_VMEM_PIXELS // w - 2 * a
        if strip < max(8, a):
            # pathological min_area vs width: XLA path (associative-scan
            # min propagation, HBM-tiled by the compiler)
            from .postprocess import remove_speckles as _jnp_speckles

            flat = disp.reshape((-1, h, w))
            out = jax.vmap(
                lambda d: _jnp_speckles(d, diff_insame, min_area))(flat)
            out = out.reshape(batch + (h, w))
            return out[0] if unbatched else out

        n = -(-h // strip)
        # balance the strips: n is fixed by the VMEM budget, so shrinking
        # each strip to ceil(h/n) (instead of the budget max, which left
        # the final strip mostly padding) cuts the per-strip plane the
        # label kernel compiles and propagates over — at 1500x1000 this is
        # 633+2a -> 500+2a rows, ~20% less strip work and a smaller Mosaic
        # program for the compile-dominant kernel
        # (results/compile_profile.json: 390 s of the 434 s D=256 pipeline
        # compile is this kernel).  Measured scaling of that compile
        # (results/speckle_compile_probe.json): pixel-count-driven and
        # superlinear in strip rows at fixed width, lane width a minor
        # effect — so deliberately over-splitting (more, smaller strips;
        # the kernel compiles once regardless of strip count) is the
        # lever if the cold-compile outlier ever matters more than the
        # extra halo rows, and strips under _PYR_PIXEL_CAP would also
        # flip onto the measured-faster pyramid scheme
        strip = -(-h // n)
        flat = disp.reshape((-1, h, w))
        padded = jnp.pad(flat, ((0, 0), (a, a + n * strip - h), (0, 0)),
                         constant_values=jnp.inf)
        strips = jnp.concatenate(
            [padded[:, i * strip:i * strip + strip + 2 * a] for i in range(n)],
            axis=0)                                # (n*B, strip+2a, w)
        filt = remove_speckles_pallas(strips, diff_insame, min_area)
        core = filt[:, a:a + strip]                # strip interiors
        out = jnp.concatenate(jnp.split(core, n, axis=0), axis=1)[:, :h]
        out = out.reshape(batch + (h, w))
        return out[0] if unbatched else out

    flat = disp.reshape((-1, h, w))
    b = flat.shape[0]
    lo_bits = max(_ceil_log2(w), 7)   # label = (row << lo_bits) | col
    lo = 1 << lo_bits
    plane = pl.BlockSpec((1, h, w), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    vmem_params = pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024)

    labels = pl.pallas_call(
        functools.partial(_speckle_labels_kernel, h=h, w=w,
                          diff=float(diff_insame), lo_bits=lo_bits),
        grid=(b,),
        in_specs=[plane],
        out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.int32)],  # edge bitmask
        compiler_params=vmem_params,
        interpret=_interpret(),
    )(flat)

    # Banded histogram + verdict gather (see _speckle_band_geometry).
    # Invalid pixels get the out-of-band sentinel label so neither phase
    # needs a separate finite mask.
    pc = _SPECKLE_PC
    g, band, h_hist = _speckle_band_geometry(h, w, min_area, pc)
    n = h * w
    npad = _round_up(n, g * pc)
    ngroups = npad // (g * pc)
    sentinel = h_hist << lo_bits
    lab_flat = jnp.where(jnp.isfinite(flat), labels,
                         jnp.int32(sentinel)).reshape(b, n)
    lab_flat = jnp.pad(lab_flat, ((0, 0), (0, npad - n)),
                       constant_values=sentinel)
    # groups flattened onto lanes with a unit sublane dim: the TPU lowering
    # requires the last two block dims to be (8, 128)-divisible OR equal to
    # the array dims, so the block's trailing (1, g*pc) must be actual array
    # dims — (b, ngroups, 1, g*pc) makes every block a full (1, g*pc) plane
    lab_grp = lab_flat.reshape(b, ngroups, 1, g * pc)
    grp_spec = pl.BlockSpec((1, 1, 1, g * pc), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)
    hist_args = dict(g=g, pc=pc, band=band, lo_bits=lo_bits,
                     a=int(min_area), w=w, h_hist=h_hist)

    counts = pl.pallas_call(
        functools.partial(_speckle_hist_kernel, **hist_args),
        grid=(b, ngroups),
        in_specs=[grp_spec],
        out_specs=pl.BlockSpec((1, h_hist, lo), lambda bi, gi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h_hist, lo), jnp.int32),
        compiler_params=vmem_params,
        interpret=_interpret(),
    )(lab_grp)

    # a bin is non-zero only at a component root's own (row, col): labels
    # ARE root coordinates after convergence, so this is the whole verdict
    root_small = ((counts > 0)
                  & (counts < jnp.int32(min_area))).astype(jnp.int8)

    verdict = pl.pallas_call(
        functools.partial(_speckle_verdict_kernel, **hist_args),
        grid=(b, ngroups),
        in_specs=[grp_spec,
                  pl.BlockSpec((1, h_hist, lo), lambda bi, gi: (bi, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=grp_spec,
        out_shape=jax.ShapeDtypeStruct((b, ngroups, 1, g * pc),
                                       jnp.float32),
        compiler_params=vmem_params,
        interpret=_interpret(),
    )(lab_grp, root_small)

    small = verdict.reshape(b, npad)[:, :n].reshape(b, h, w) > 0
    out = jnp.where(jnp.isfinite(flat) & small, jnp.float32(jnp.inf), flat)
    out = out.reshape(batch + (h, w))
    return out[0] if unbatched else out


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Popcount for int32 census XORs (Mosaic lowers this natively)."""
    return jax.lax.population_count(x)


def _census_cost_kernel(imgl_ref, imgr_ref, out_ref, *, rows: int, h: int,
                        w: int, dmin: int, dmax: int, mask_rows: bool,
                        store8: bool = False):
    """Fused 5x5 census + Hamming cost volume for one row chunk.

    Reference: census_transform_5x5 (SemiGlobalMatching.c:134-159) and
    ComputeCost/Hamming32 (:161-196).  Images arrive 2-row-padded so the
    census halo never leaves VMEM; lane rolls only contaminate the 2-px
    census border, which is masked to code 0 exactly like the reference's
    never-written border rows.

    ``mask_rows=False``: the 2-row census border mask is skipped — used by
    the tiled path, whose halo rows come from neighbour devices and whose
    global border rows are fixed up in XLA afterwards (parallel/tiles.py)."""
    r0 = pl.program_id(1) * rows  # top row of this chunk (unpadded coords)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    interior = (lane >= 2) & (lane < w - 2)
    if mask_rows:
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0) + r0
        interior &= (row >= 2) & (row < h - 2)

    def census(img_ref):
        # One aligned slab load (r0 is a multiple of the block size; Mosaic
        # requires provably 8-aligned dynamic sublane offsets), halo rows
        # via static in-register slices.
        slab = img_ref[0, pl.ds(r0, rows + 8)]
        center = slab[2:2 + rows]
        val = jnp.zeros((rows, w), jnp.int32)
        for dr in range(-2, 3):
            neigh_rows = slab[2 + dr:2 + dr + rows]
            for dc in range(-2, 3):
                neigh = _roll(neigh_rows, -dc, 1) if dc else neigh_rows
                val = (val << 1) | (neigh < center).astype(jnp.int32)
        return jnp.where(interior, val, 0)

    cl = census(imgl_ref)
    cr = census(imgr_ref)

    # Slab stores: a single-d store touches one sublane per tile of the
    # (rows, D, W) block — up to 8x (int32) / 32x (int8) write
    # amplification.  Building whole-tile groups of planes in registers and
    # storing full (rows, group, W) slabs writes whole tiles.
    #
    # ``store8``: the output block is uint8 and the store groups 32 planes
    # (the 8-bit (32, 128) native tile), so the volume leaves the kernel at
    # its wire width — no int32 staging volume, no XLA narrowing pass over
    # a 4x-inflated copy.  Requires D % 32 == 0 (tile-aligned D slices);
    # otherwise int32 8-groups (Mosaic rejects sublane-strided narrow
    # stores, so partial groups must ride wide).
    nd = dmax - dmin
    group = 32 if store8 else 8
    for k0 in range(0, nd, group):
        kk = min(group, nd - k0)
        planes = []
        for k in range(k0, k0 + kk):
            d = dmin + k
            shifted = _roll(cr, d, 1) if d % w else cr     # cr[j - d]
            ham = _popcount32(cl ^ shifted)
            oob = (lane - d < 0) | (lane - d >= w)
            planes.append(jnp.where(oob, 127, ham))
        slab = jnp.stack(planes, axis=1)
        out_ref[0, :, k0:k0 + kk, :] = slab.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("min_disparity", "max_disparity", "block_rows",
                              "img_has_halo", "store8"))
def census_cost_volume_pallas(
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    min_disparity: int,
    max_disparity: int,
    block_rows: int = 32,
    img_has_halo: bool = False,
    store8: Optional[bool] = None,
) -> jnp.ndarray:
    """uint8 (..., H, W) pair -> (..., H, D, W) uint8 cost volume, fusing
    census_5x5 + hamming_cost_volume in one pass (bit-equal to both).

    ``img_has_halo``: inputs are (..., H+4, W) with 2 explicit halo rows on
    each side (cross-tile halo exchange); the output has H rows and carries
    NO census row-border masking — the tiled caller masks the global border
    rows itself."""
    unbatched = img_left.ndim == 2
    if unbatched:
        img_left, img_right = img_left[None], img_right[None]
    batch = img_left.shape[:-2]
    h_in, w = img_left.shape[-2:]
    h = h_in - 4 if img_has_halo else h_in
    d = max_disparity - min_disparity
    flat_l = img_left.reshape((-1, h_in, w))
    flat_r = img_right.reshape((-1, h_in, w))
    b = flat_l.shape[0]
    # the kernel's dynamic slab load needs an 8-aligned sublane offset
    # (r0 = chunk * block_rows), so the chunk size must be a multiple of 8
    # — a user-passed 48 would shrink to 12 and fail Mosaic compile
    block_rows = _plain_block_rows(d, w, block_rows)
    hp = _round_up(h, block_rows)

    # 2-row census halo + slab-alignment padding, all resolved host-side.
    # int32 planes: Mosaic can't vector.load int8 at dynamic sublane offsets.
    if img_has_halo:
        pad = ((0, 0), (0, hp - h + 4), (0, 0))
    else:
        pad = ((0, 0), (2, hp - h + 6), (0, 0))
    pl_pad = jnp.pad(flat_l.astype(jnp.int32), pad)
    pr_pad = jnp.pad(flat_r.astype(jnp.int32), pad)

    img_spec = pl.BlockSpec((1, hp + 8, w), lambda bi, ci: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    if store8 is None:
        store8 = True       # real-TPU A/B (results/scan_variants.json,
        #                     2026-08-18): uint8 tile-slab store is 2.1x the
        #                     int32+narrow launch (0.49 vs 1.05 ms) and
        #                     bit-equal; default ON where the layout allows
    store8 = store8 and d % 32 == 0
    cost = pl.pallas_call(
        functools.partial(_census_cost_kernel, rows=block_rows, h=h, w=w,
                          dmin=min_disparity, dmax=max_disparity,
                          mask_rows=not img_has_halo, store8=store8),
        grid=(b, hp // block_rows),
        in_specs=[img_spec, img_spec],
        out_specs=pl.BlockSpec((1, block_rows, d, w),
                               lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, d, w),
                                       jnp.uint8 if store8 else jnp.int32),
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(pl_pad, pr_pad)

    cost = cost[:, :h].astype(jnp.uint8).reshape(batch + (h, d, w))
    return cost[0] if unbatched else cost


def _lr_check_kernel(dl_ref, dr_ref, out_ref, *, rows: int, w: int,
                     thres: float, max_shift: int):
    """LR consistency for one (batch, row-chunk) block, entirely in VMEM.

    Same math as ops/postprocess.lr_check (reference LRCheck,
    SemiGlobalMatching.c:445-470): the right-map sample at
    ``j - trunc(disp + 0.5)`` comes from a (max_shift+2)-way select over
    lane-rolled copies — but here the rolls happen on the VMEM-resident
    block, so HBM sees each plane exactly once.

    For ``max_shift > 128`` the roll/select loop runs as a ``fori_loop``
    with *dynamic* lane rotates (the WTA-shear technique) so the Mosaic
    program stays O(1) in the disparity range — this is what lets the
    flagship D=192/256 configs stay on the kernel instead of the O(D)
    XLA fallback.  Wrapped/padded lanes only ever contaminate selections
    whose ``col_right`` is out of range, which are killed regardless of
    the sampled value, so the circular rotate is exact."""
    disp_l = dl_ref[0]
    disp_r = dr_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    cols = lane.astype(jnp.float32)

    valid = jnp.isfinite(disp_l)
    dl = jnp.where(valid, disp_l, 0.0)
    col_right = jnp.trunc(cols - dl + jnp.float32(0.5)).astype(jnp.int32)
    in_range = (col_right >= 0) & (col_right < w)

    shift = lane - col_right
    kend = min(max_shift, w - 1) + 2       # shifts are in [-1, kend)
    if max_shift <= 128:
        # static unroll: slightly faster, compiles fine for small ranges
        dr_sel = jnp.zeros((rows, w), jnp.float32)
        for k in range(-1, kend):
            dr_sel = jnp.where(shift == k, _roll(disp_r, k, axis=1), dr_sel)
    else:
        wp = _round_up(w, 128)             # dynamic rotate: native lane width
        dr_p = jnp.pad(disp_r, ((0, 0), (0, wp - w)))

        def body(i, dr_sel):
            k = i - 1
            rolled = pltpu.roll(dr_p, jax.lax.rem(k + wp, wp), axis=1)[:, :w]
            return jnp.where(shift == k, rolled, dr_sel)

        dr_sel = jax.lax.fori_loop(
            0, kend + 1, body, jnp.zeros((rows, w), jnp.float32))

    r_finite = jnp.isfinite(dr_sel)
    dr_v = jnp.where(r_finite, dr_sel, 0.0)
    mismatch = jnp.abs(dl - dr_v) > jnp.float32(thres)
    kill = valid & (~in_range | (r_finite & mismatch))
    out_ref[0] = jnp.where(kill, jnp.float32(jnp.inf), disp_l)


@functools.partial(jax.jit, static_argnames=("thres", "max_shift",
                                             "block_rows"))
def lr_check_pallas(disp_left: jnp.ndarray, disp_right: jnp.ndarray,
                    thres: float, max_shift: int,
                    block_rows: int = 128) -> jnp.ndarray:
    """Pallas LR check, bit-equal to ``postprocess.lr_check`` (including
    NaN/-inf inputs: both paths use the same isfinite predicates).

    disp maps: (..., H, W) float32 with +inf invalid.  All disparity
    ranges stay on the kernel: ``max_shift <= 128`` statically unrolls the
    roll-select, larger ranges run the O(1)-program dynamic-rotate loop
    (see ``_lr_check_kernel``)."""
    if max_shift <= 0:
        raise ValueError("max_shift must be positive (the disparity bound)")
    unbatched = disp_left.ndim == 2
    if unbatched:
        disp_left, disp_right = disp_left[None], disp_right[None]
    batch = disp_left.shape[:-2]
    h, w = disp_left.shape[-2:]
    dl = disp_left.reshape((-1, h, w))
    dr = disp_right.reshape((-1, h, w))
    b = dl.shape[0]
    block_rows = min(block_rows, _round_up(h, 8))
    hp = _round_up(h, block_rows)
    pad = ((0, 0), (0, hp - h), (0, 0))
    spec = pl.BlockSpec((1, block_rows, w), lambda bi, ci: (bi, ci, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_lr_check_kernel, rows=block_rows, w=w,
                          thres=float(thres), max_shift=max_shift),
        grid=(b, hp // block_rows),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, hp, w), jnp.float32),
        # the wide scoped-vmem cap every volume kernel carries: without it
        # XLA's own choice to stage this call's (B, H, W) f32 planes in
        # S(1) vmem (legal and profitable at 720p+) trips the default 16M
        # scoped limit — seen as a compile OOM at 1280x720 B=8
        compiler_params=_VMEM_PARAMS,
        interpret=_interpret(),
    )(jnp.pad(dl, pad), jnp.pad(dr, pad))
    out = out[:, :h].reshape(batch + (h, w))
    return out[0] if unbatched else out


# Ops not yet kernelised fall back to their jnp implementations (XLA fuses
# the elementwise stages well; the scan above is where Pallas pays).
from .census import census_5x5  # noqa: F401, E402
from .cost_volume import hamming_cost_volume  # noqa: F401, E402
