"""Speckle histogram+verdict tail probe (VERDICT r4 weak#2 follow-up).

The label kernel was probed to its winner in r4 (doubling-mask pyramid);
the remaining speckle cost is the TAIL: the banded MXU histogram launch,
the XLA root_small op between, and the banded MXU verdict launch — both
launches rebuild identical per-group one-hot matrices and re-read the
label plane.  Variants, all timed on the real chip (RTT-cancelling
two-length chains, min-of-repeats, cone B=8 labels from the production
kernel):

  base           production tail: hist launch -> XLA root_small ->
                 verdict launch (exactly remove_speckles_pallas's glue)
  hist_only      the histogram launch alone
  verdict_only   the verdict launch alone (root_small input fixed)
  fused          ONE launch, grid (b, 2*ngroups): phase 1 accumulates the
                 histogram into VMEM scratch, the first phase-2 step
                 derives root_small in-kernel, phase 2 gathers verdicts —
                 kills the counts HBM round-trip, the XLA op and one
                 dispatch
  base8          base structure with int8 one-hot matmuls (int32
                 accumulation — exact; the MXU's int8 path has 2x the
                 bf16 rate if Mosaic lowers it)
  fused8         fused + int8

Every variant's pixel verdict is asserted bit-equal to base's.  Compile
failures are recorded per-variant (the r4 A/B convention).  Writes
results/speckle_tail_probe.json.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

B, H, W = 8, 375, 450
MIN_AREA = 50
ITERS = 24

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=116 * 1024 * 1024)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _hist_kernel(lab_ref, out_ref, *, g, pc, band, lo_bits, a, w, h_hist,
                 int8: bool):
    gi = pl.program_id(1)
    lo = 1 << lo_bits

    @pl.when(gi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    start = pk._speckle_band_start(gi, g=g, pc=pc, w=w, a=a, band=band,
                                   h_hist=h_hist)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (band, pc), 0) + start
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, pc), 0)
    tile = lab_ref[0, 0]
    odt = jnp.int8 if int8 else jnp.bfloat16
    acc = jnp.zeros((band, lo), out_ref.dtype)
    for j in range(g):
        row = tile[:, j * pc:(j + 1) * pc]
        am = (k_iota == (row >> lo_bits)).astype(odt)
        pm = (l_iota == (row & (lo - 1))).astype(odt)
        acc += jax.lax.dot_general(
            am, pm, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype)
    out_ref[0, pl.dslice(start, band), :] += acc


def _verdict_kernel(lab_ref, m_ref, out_ref, *, g, pc, band, lo_bits, a, w,
                    h_hist, int8: bool):
    gi = pl.program_id(1)
    lo = 1 << lo_bits
    start = pk._speckle_band_start(gi, g=g, pc=pc, w=w, a=a, band=band,
                                   h_hist=h_hist)
    m_band = m_ref[0, pl.dslice(start, band), :]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (band, pc), 0) + start
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, pc), 0)
    tile = lab_ref[0, 0]
    adt = jnp.int32 if int8 else jnp.float32
    pdt = jnp.int8 if int8 else jnp.bfloat16
    rows = []
    for j in range(g):
        row = tile[:, j * pc:(j + 1) * pc]
        am = (k_iota == (row >> lo_bits)).astype(adt)
        pm = (l_iota == (row & (lo - 1))).astype(pdt)
        q = jax.lax.dot_general(
            m_band, pm, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=adt)
        rows.append(jnp.sum(am * q, axis=0, keepdims=True).astype(jnp.float32))
    out_ref[0, 0] = jnp.concatenate(rows, axis=1)


def _fused_kernel(lab_ref, out_ref, counts, small, *, g, pc, band, lo_bits,
                  a, w, h_hist, ngroups, min_area, int8: bool):
    gi = pl.program_id(1)
    lo = 1 << lo_bits
    phase2 = gi >= ngroups
    gj = jax.lax.rem(gi, ngroups)
    start = pk._speckle_band_start(gj, g=g, pc=pc, w=w, a=a, band=band,
                                   h_hist=h_hist)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (band, pc), 0) + start
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (lo, pc), 0)
    tile = lab_ref[0, 0]
    cdt = counts.dtype
    odt = jnp.int8 if int8 else jnp.bfloat16

    @pl.when(gi == 0)
    def _():
        counts[...] = jnp.zeros_like(counts)

    @pl.when(jnp.logical_not(phase2))
    def _hist():
        acc = jnp.zeros((band, lo), cdt)
        for j in range(g):
            row = tile[:, j * pc:(j + 1) * pc]
            am = (k_iota == (row >> lo_bits)).astype(odt)
            pm = (l_iota == (row & (lo - 1))).astype(odt)
            acc += jax.lax.dot_general(
                am, pm, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=cdt)
        counts[pl.dslice(start, band), :] += acc

    @pl.when(gi == ngroups)
    def _root_small():
        c = counts[...]
        small[...] = ((c > 0) & (c < min_area)).astype(small.dtype)

    @pl.when(phase2)
    def _verdict():
        m_band = small[pl.dslice(start, band), :]
        adt = jnp.int32 if int8 else jnp.float32
        rows = []
        for j in range(g):
            row = tile[:, j * pc:(j + 1) * pc]
            am = (k_iota == (row >> lo_bits)).astype(adt)
            pm = (l_iota == (row & (lo - 1))).astype(small.dtype)
            q = jax.lax.dot_general(
                m_band, pm, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=adt)
            rows.append(jnp.sum(am * q, axis=0,
                                keepdims=True).astype(jnp.float32))
        out_ref[0, 0] = jnp.concatenate(rows, axis=1)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend(log=log)
    assert jax.default_backend() == "tpu", "probe needs the real chip"
    jax.config.update("jax_compilation_cache_dir", "/tmp/soc_sgm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import dataclasses

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)
    from soc_project_stereo_matching_tpu.models.sgm import sgm_forward
    from soc_project_stereo_matching_tpu.utils.profiling import (
        chained_delta_time)

    base_dir = "/root/reference/SemiGlobalMatching/Data/cone/"
    cl = load_image_gray_stb(base_dir + "im2.png")
    cr = load_image_gray_stb(base_dir + "im6.png")
    no_spk = dataclasses.replace(SGMOptions(), is_remove_speckles=False)
    disp = sgm_forward(jnp.asarray(np.broadcast_to(cl, (B, H, W))),
                       jnp.asarray(np.broadcast_to(cr, (B, H, W))),
                       no_spk, use_pallas=True)
    disp.block_until_ready()
    log("pre-speckle input ready")

    # production labels (the tail's input)
    lo_bits = max(pk._ceil_log2(W), 7)
    lo = 1 << lo_bits
    plane = pl.BlockSpec((1, H, W), lambda bi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    labels = pl.pallas_call(
        functools.partial(pk._speckle_labels_kernel, h=H, w=W, diff=1.0,
                          lo_bits=lo_bits),
        grid=(B,), in_specs=[plane], out_specs=plane,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((H, W), jnp.int32)],
        compiler_params=_VMEM,
    )(disp)

    pc = pk._SPECKLE_PC
    g, band, h_hist = pk._speckle_band_geometry(H, W, MIN_AREA, pc)
    n = H * W
    npad = pk._round_up(n, g * pc)
    ngroups = npad // (g * pc)
    sentinel = h_hist << lo_bits
    lab_flat = jnp.where(jnp.isfinite(disp), labels,
                         jnp.int32(sentinel)).reshape(B, n)
    lab_grp = jnp.pad(lab_flat, ((0, 0), (0, npad - n)),
                      constant_values=sentinel).reshape(B, ngroups, 1, g * pc)
    lab_grp = jax.device_put(lab_grp)
    log(f"geometry: g={g} band={band} h_hist={h_hist} lo={lo} "
        f"ngroups={ngroups} macs/frame={2 * npad * band * lo / 1e9:.1f}G")

    grp_spec = pl.BlockSpec((1, 1, 1, g * pc), lambda bi, gi: (bi, gi, 0, 0),
                            memory_space=pltpu.VMEM)
    kargs = dict(g=g, pc=pc, band=band, lo_bits=lo_bits, a=MIN_AREA, w=W,
                 h_hist=h_hist)

    def build_hist(int8):
        cdt = jnp.int32 if int8 else jnp.float32
        return lambda lg: pl.pallas_call(
            functools.partial(_hist_kernel, int8=int8, **kargs),
            grid=(B, ngroups),
            in_specs=[grp_spec],
            out_specs=pl.BlockSpec((1, h_hist, lo),
                                   lambda bi, gi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, h_hist, lo), cdt),
            compiler_params=_VMEM)(lg)

    def build_verdict(int8):
        mdt = jnp.int8 if int8 else jnp.bfloat16
        run = lambda lg, m: pl.pallas_call(
            functools.partial(_verdict_kernel, int8=int8, **kargs),
            grid=(B, ngroups),
            in_specs=[grp_spec,
                      pl.BlockSpec((1, h_hist, lo),
                                   lambda bi, gi: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=grp_spec,
            out_shape=jax.ShapeDtypeStruct((B, ngroups, 1, g * pc),
                                           jnp.float32),
            compiler_params=_VMEM)(lg, m)
        return run, mdt

    def tail_two_launch(int8):
        hist = build_hist(int8)
        verdict, mdt = build_verdict(int8)

        def run(lg):
            counts = hist(lg)
            small = ((counts > 0) & (counts < MIN_AREA)).astype(mdt)
            return verdict(lg, small)

        return run

    def tail_fused(int8):
        cdt = jnp.int32 if int8 else jnp.float32
        mdt = jnp.int8 if int8 else jnp.bfloat16
        grp2 = pl.BlockSpec(
            (1, 1, 1, g * pc),
            lambda bi, gi: (bi, jax.lax.rem(gi, ngroups), 0, 0),
            memory_space=pltpu.VMEM)
        return lambda lg: pl.pallas_call(
            functools.partial(_fused_kernel, ngroups=ngroups,
                              min_area=MIN_AREA, int8=int8, **kargs),
            grid=(B, 2 * ngroups),
            in_specs=[grp2],
            out_specs=grp2,
            out_shape=jax.ShapeDtypeStruct((B, ngroups, 1, g * pc),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((h_hist, lo), cdt),
                            pltpu.VMEM((h_hist, lo), mdt)],
            compiler_params=_VMEM)(lg)

    variants = {
        "base": tail_two_launch(False),
        "base8": tail_two_launch(True),
        "fused": tail_fused(False),
        "fused8": tail_fused(True),
    }

    results = {}
    ref = None
    for name, run in variants.items():
        try:
            t0 = time.perf_counter()
            out = np.asarray(jax.jit(run)(lab_grp)) > 0
            compile_s = time.perf_counter() - t0
            if ref is None:
                ref = out
                equal = True
            else:
                equal = bool((out == ref).all())

            def step(lg, run=run):
                v = run(lg)
                return lg ^ (v > 0).astype(jnp.int32)

            s = chained_delta_time(step, lab_grp, iters=ITERS)
            results[name] = {"ms_per_frame": round(s * 1e3 / B, 4),
                             "verdict_bit_equal": equal,
                             "compile_first_s": round(compile_s, 1)}
            log(f"{name:12s} {s * 1e3 / B:7.4f} ms/frame  bit_equal={equal}")
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    # attribution: each launch alone (float32 path)
    hist = build_hist(False)
    verdict, mdt = build_verdict(False)
    counts0 = jax.jit(hist)(lab_grp)
    small0 = jax.device_put(np.asarray(
        ((counts0 > 0) & (counts0 < MIN_AREA))).astype(np.float32))
    small0 = jax.jit(lambda x: x.astype(mdt))(small0)
    for name, step in (
        ("hist_only", lambda lg: lg ^ (hist(lg)[:, :1, :1] > 0)
         .astype(jnp.int32).reshape(B, 1, 1, 1)),
        ("verdict_only", lambda lg: lg ^ (verdict(lg, small0) > 0)
         .astype(jnp.int32)),
    ):
        try:
            s = chained_delta_time(step, lab_grp, iters=ITERS)
            results[name] = {"ms_per_frame": round(s * 1e3 / B, 4)}
            log(f"{name:12s} {s * 1e3 / B:7.4f} ms/frame")
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    out_path = REPO / "results" / "speckle_tail_probe.json"
    out_path.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "batch": B, "height": H, "width": W, "iters": ITERS,
        "geometry": {"g": g, "band": band, "h_hist": h_hist, "lo": lo,
                     "ngroups": ngroups, "pc": pc},
        "input": "cone production labels",
        "variants": results}, indent=2))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
