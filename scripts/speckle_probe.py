"""Speckle label-kernel variant probe: where does propagation time go?

The CC-propagation while_loop dominates the speckle stage.  Three
hypotheses about its cost structure, each probed by a standalone variant
of the labels launch timed on the real chip (chained methodology, cone
pre-speckle input = real component structure):

  base       production `_cc_propagate` (alternating seg/cheap, check
             every round)
  pair       seg+cheap per while-iteration, ONE convergence check per
             pair (min-propagation is monotone, so a no-change fixed
             point of the pair implies a fixed point of each half —
             exact; halves the scalar-reduce + cond overhead)
  fori16     fixed 16 rounds, no convergence check at all (NOT exact in
             general — bounds the check overhead, probe only)
  block4     `pair` with 4 frames per kernel program ((4, H, W) blocks,
             rolls on axes 1/2): same total frame-rounds but 4x wider
             vectors per op and 4x fewer loop iterations — isolates
             per-round fixed overhead vs real VPU work
  pyr        base round structure, but the segmented-doubling run-link
             masks (which are STATIC across rounds — connectivity never
             changes) are precomputed once into a packed int32 pyramid
             (bit k*4+{0..3} of plane s = fwd/bwd x lane/row link at
             stride 2^s, boundary ok-masks folded in), cutting each
             doubling step from 8 ops/direction to 5 and dropping half
             the rolls.  Bit-exact: identical round sequence to base.

Measured 2026-08-19 (committed results/speckle_probe.json): base 0.679,
pair 0.730, fori16 0.680, block4 0.768, pyr 0.518 ms/frame — the
while-loop check and block batching are neutral-to-worse, so
propagation is VPU-compute-bound and the pyramid is the lever (landed
as the production default under _PYR_PIXEL_CAP).

Labels (not the filtered disparity) are compared bit-exactly to the
production kernel for the exact variants.  Writes
results/speckle_probe.json.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

B, H, W = 8, 375, 450
ITERS = 12
GB = 4    # frames per block4 program


def _pair_propagate(get_val, set_val, get_mask, *, h, w, big, check=True,
                    fixed_rounds=0, lead=False):
    """seg+cheap pairs; generalises `pk._cc_propagate` (see module doc).

    lead=True runs the (g, h, w) block variant: sublane axis 1, lane
    axis 2, iotas carry the leading frame dim.
    """
    dims = (GB, h, w) if lead else (h, w)
    ax0, ax1 = (1, 2) if lead else (0, 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, dims, ax0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, dims, ax1)
    roll = pk._roll

    def seg_min_doubling(lab, conn, axis, n):
        fwd_c, fwd_v = conn, lab
        bwd_c, bwd_v = roll(conn, -1, axis), lab
        iota = row_iota if axis == ax0 else lane_iota
        for step in range(pk._ceil_log2(n)):
            s = 1 << step
            ok = iota >= s
            fwd_v = jnp.minimum(fwd_v, jnp.where(
                (fwd_c != 0) & ok, roll(fwd_v, s, axis), big))
            fwd_c = fwd_c & jnp.where(ok, roll(fwd_c, s, axis), 0)
            ok_b = iota < n - s
            bwd_v = jnp.minimum(bwd_v, jnp.where(
                (bwd_c != 0) & ok_b, roll(bwd_v, -s, axis), big))
            bwd_c = bwd_c & jnp.where(ok_b, roll(bwd_c, -s, axis), 0)
        return jnp.minimum(fwd_v, bwd_v)

    def diag_pass(new, m):
        for bit, (dr, dc) in zip((2, 3, 4, 5), pk._CC_OFFSETS[2:]):
            nl = roll(roll(new, -dr, ax0), -dc, ax1)
            new = jnp.minimum(new, jnp.where((m & (1 << bit)) != 0, nl, big))
        return new

    def seg_round(lab, m):
        new = seg_min_doubling(lab, m & 1, ax1, w)
        new = seg_min_doubling(new, (m >> 1) & 1, ax0, h)
        return diag_pass(new, m)

    def cheap_round(lab, m):
        new = lab
        for shift, axis in ((1, ax1), (-1, ax1), (1, ax0)):
            conn = m & 1 if axis == ax1 else (m >> 1) & 1
            if shift > 0:
                nl = roll(lab, 1, axis)
                edge = conn != 0
            else:
                nl = roll(lab, -1, axis)
                edge = roll(conn, -1, axis) != 0
            new = jnp.minimum(new, jnp.where(edge, nl, big))
        nl = roll(new, -1, ax0)
        edge = roll((m >> 1) & 1, -1, ax0) != 0
        new = jnp.minimum(new, jnp.where(edge, nl, big))
        return diag_pass(new, m)

    if fixed_rounds:
        def fbody(_, __):
            lab = get_val()
            m = get_mask()
            set_val(cheap_round(seg_round(lab, m), m))
            return 0
        jax.lax.fori_loop(0, fixed_rounds, fbody, 0)
        return

    def body(state):
        _, it = state
        lab = get_val()
        m = get_mask()
        new = cheap_round(seg_round(lab, m), m)
        set_val(new)
        return jnp.any(new != lab), it + 1

    jax.lax.while_loop(lambda s: s[0], body, (jnp.bool_(True), jnp.int32(0)))


def _pyr_propagate(get_val, set_val, m, *, h, w, big):
    """Base round structure (alternating seg/cheap, check every round)
    with the doubling run-link masks precomputed into a packed pyramid."""
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    roll = pk._roll
    nsteps = max(pk._ceil_log2(w), pk._ceil_log2(h))

    # bits of pyramid plane s: 0 fwd-lane, 1 bwd-lane, 2 fwd-row, 3 bwd-row
    pyr = []
    state = []
    for axis, n, cbit in ((1, w, 0), (0, h, 1)):
        conn = (m >> cbit) & 1
        state.append([conn, roll(conn, -1, axis), axis, n])
    for step in range(nsteps):
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
            state[k][0] = fwd_c & jnp.where(ok, roll(fwd_c, s, axis), 0)
            state[k][1] = bwd_c & jnp.where(ok_b, roll(bwd_c, -s, axis), 0)
        pyr.append(plane)

    def diag_pass(new):
        for bit, (dr, dc) in zip((2, 3, 4, 5), pk._CC_OFFSETS[2:]):
            nl = roll(roll(new, -dr, 0), -dc, 1)
            new = jnp.minimum(new, jnp.where((m & (1 << bit)) != 0, nl, big))
        return new

    def seg_axis(v, axis, n, fbit, bbit):
        fwd_v = v
        bwd_v = v
        for step in range(pk._ceil_log2(n)):
            s = 1 << step
            p = pyr[step]
            fwd_v = jnp.minimum(fwd_v, jnp.where(
                (p & fbit) != 0, roll(fwd_v, s, axis), big))
            bwd_v = jnp.minimum(bwd_v, jnp.where(
                (p & bbit) != 0, roll(bwd_v, -s, axis), big))
        return jnp.minimum(fwd_v, bwd_v)

    def seg_round(lab, _m):
        new = seg_axis(lab, 1, w, 1, 2)
        new = seg_axis(new, 0, h, 4, 8)
        return diag_pass(new)

    def cheap_round(lab, _m):
        new = lab
        for shift, axis in ((1, 1), (-1, 1), (1, 0)):
            conn = _m & 1 if axis == 1 else (_m >> 1) & 1
            if shift > 0:
                nl = roll(lab, 1, axis)
                edge = conn != 0
            else:
                nl = roll(lab, -1, axis)
                edge = roll(conn, -1, axis) != 0
            new = jnp.minimum(new, jnp.where(edge, nl, big))
        nl = roll(new, -1, 0)
        edge = roll((_m >> 1) & 1, -1, 0) != 0
        new = jnp.minimum(new, jnp.where(edge, nl, big))
        return diag_pass(new)

    def body(st):
        _, it = st
        lab = get_val()
        new = jax.lax.cond(it % 2 == 0, seg_round, cheap_round, lab, m)
        set_val(new)
        return jnp.any(new != lab), it + 1

    jax.lax.while_loop(lambda s: s[0], body, (jnp.bool_(True), jnp.int32(0)))


def _labels_kernel_variant(disp_ref, out_ref, mask_ref, *, h, w, diff,
                           lo_bits, mode):
    lead = mode == "block4"
    gb = GB if lead else 1
    dims = (gb, h, w) if lead else (h, w)
    ax0, ax1 = (1, 2) if lead else (0, 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, dims, ax0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, dims, ax1)
    roll = pk._roll

    disp = disp_ref[...] if lead else disp_ref[0]
    finite = jnp.isfinite(disp)
    finite_i = finite.astype(jnp.int32)
    d = jnp.where(finite, disp, jnp.float32(1e30))

    def edge(dr, dc):
        nd = roll(roll(d, -dr, ax0), -dc, ax1)
        nf = roll(roll(finite_i, -dr, ax0), -dc, ax1) != 0
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

    masks = jnp.zeros(dims, jnp.int32)
    for bit, (dr, dc) in enumerate(pk._CC_OFFSETS):
        masks = masks | jnp.where(edge(dr, dc), 1 << bit, 0)
    mask_ref[...] = masks
    init = (row_iota << lo_bits) | lane_iota
    if lead:
        out_ref[...] = init
        get = lambda: out_ref[...]
        put = lambda v: out_ref.__setitem__(..., v)
    else:
        out_ref[0] = init
        get = lambda: out_ref[0]
        put = lambda v: out_ref.__setitem__(0, v)

    big = jnp.int32(h << lo_bits)
    if mode == "fori16":
        _pair_propagate(get, put, lambda: mask_ref[...], h=h, w=w, big=big,
                        fixed_rounds=8)
    elif mode == "pyr":
        _pyr_propagate(get, put, masks, h=h, w=w, big=big)
    else:
        _pair_propagate(get, put, lambda: mask_ref[...], h=h, w=w, big=big,
                        lead=lead)


def build_labels_fn(mode, h, w, diff=1.0):
    lo_bits = max(pk._ceil_log2(w), 7)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024)
    if mode == "base":
        plane = pl.BlockSpec((1, h, w), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
        return jax.jit(lambda flat: pl.pallas_call(
            functools.partial(pk._speckle_labels_kernel, h=h, w=w,
                              diff=diff, lo_bits=lo_bits),
            grid=(B,), in_specs=[plane], out_specs=plane,
            out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.int32),
            scratch_shapes=[pltpu.VMEM((h, w), jnp.int32)],
            compiler_params=vmem)(flat))
    if mode == "block4":
        plane = pl.BlockSpec((GB, h, w), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
        return jax.jit(lambda flat: pl.pallas_call(
            functools.partial(_labels_kernel_variant, h=h, w=w, diff=diff,
                              lo_bits=lo_bits, mode=mode),
            grid=(B // GB,), in_specs=[plane], out_specs=plane,
            out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.int32),
            scratch_shapes=[pltpu.VMEM((GB, h, w), jnp.int32)],
            compiler_params=vmem)(flat))
    plane = pl.BlockSpec((1, h, w), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    return jax.jit(lambda flat: pl.pallas_call(
        functools.partial(_labels_kernel_variant, h=h, w=w, diff=diff,
                          lo_bits=lo_bits, mode=mode),
        grid=(B,), in_specs=[plane], out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.int32),
        scratch_shapes=[pltpu.VMEM((h, w), jnp.int32)],
        compiler_params=vmem)(flat))


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()
    assert jax.default_backend() == "tpu", "probe needs the real chip"
    jax.config.update("jax_compilation_cache_dir", "/tmp/soc_sgm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import dataclasses

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)
    from soc_project_stereo_matching_tpu.models.sgm import sgm_forward

    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    cl = load_image_gray_stb(base + "im2.png")
    cr = load_image_gray_stb(base + "im6.png")
    no_spk = dataclasses.replace(SGMOptions(), is_remove_speckles=False)
    disp = sgm_forward(jnp.asarray(np.broadcast_to(cl, (B, H, W))),
                       jnp.asarray(np.broadcast_to(cr, (B, H, W))),
                       no_spk, use_pallas=True)
    disp.block_until_ready()
    print("pre-speckle input ready", file=sys.stderr)

    results, ref_labels = {}, None
    for mode in ("base", "pair", "fori16", "block4", "pyr"):
        try:
            fn = build_labels_fn(mode, H, W)
            t0 = time.perf_counter()
            lab = fn(disp)
            lab_np = np.asarray(lab)
            compile_s = time.perf_counter() - t0
            if mode == "base":
                ref_labels = lab_np
                equal = True
            else:
                equal = bool((lab_np == ref_labels).all())

            def chain(x, fn=fn):
                return jnp.where(fn(x) == -1, x + 1, x)
            x = chain(disp)
            _ = jax.device_get(jnp.ravel(x)[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x = disp
                for _ in range(ITERS):
                    x = chain(x)
                _ = jax.device_get(jnp.ravel(x)[0])
                best = min(best, (time.perf_counter() - t0) / ITERS / B * 1e3)
            results[mode] = {"ms_per_frame": round(best, 4),
                             "bit_equal_labels": equal,
                             "compile_first_s": round(compile_s, 1)}
            print(f"{mode:8s} {best:7.4f} ms/frame  bit_equal={equal}",
                  file=sys.stderr)
        except Exception as e:
            results[mode] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{mode:8s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  file=sys.stderr)

    out = Path(__file__).resolve().parents[1] / "results" / "speckle_probe.json"
    out.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "batch": B, "height": H, "width": W, "iters": ITERS,
        "input": "cone pre-speckle", "variants": results}, indent=2))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
