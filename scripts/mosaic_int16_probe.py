"""Bisect the compute16 Mosaic compile crash with minimal probe kernels.

results/scan_variants.json (r4) records the int16 DP-scan variant failing
with ``tpu_compile_helper subprocess exit code 1`` — a compiler-internal
crash with no diagnostic.  This script AOT-compiles (.lower().compile(),
nothing executed) a ladder of tiny Pallas kernels, each adding one of the
int16 ops the compute16 recurrence uses, so the first rung that crashes
names the culprit:

  p0  int8 load -> int16 widen (&0xFF) -> uint16 store
  p1  + lane roll  (_roll16 axis=-1, bitcast uint32 rotate)
  p2  + sublane roll, even shift (bitcast rotate by shift/2)
  p3  + sublane roll, odd shift (halfword weave)
  p4  + iota select against an int16 sentinel
  p5  + int16 VMEM scratch carried across a fori_loop
  p6  + the circular doubling-tree min (sublane rolls 1,2,4,...)
  p7  the real _fused_scan_step, compute16=True, tiny shape (8 rows, D=16)

Writes results/mosaic_int16_probe.json; conclusions go to BASELINE.md.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

D, W = 16, 256          # tiny: isolates op legality from VMEM pressure
ROWS = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend(log=log)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

    def widen(ref):
        return ref[0].astype(jnp.int16) & 0xFF

    def k_p0(c_ref, o_ref):
        o_ref[0] = widen(c_ref).astype(jnp.uint16)

    def k_p1(c_ref, o_ref):
        x = widen(c_ref)
        o_ref[0] = (x + pk._roll(x, 1, axis=1)).astype(jnp.uint16)

    def k_p2(c_ref, o_ref):
        x = widen(c_ref)
        o_ref[0] = (x + pk._roll(x, 2, axis=0)).astype(jnp.uint16)

    def k_p3(c_ref, o_ref):
        x = widen(c_ref)
        o_ref[0] = (x + pk._roll(x, 1, axis=0)).astype(jnp.uint16)

    def k_p4(c_ref, o_ref):
        x = widen(c_ref)
        d_iota = jax.lax.broadcasted_iota(jnp.int32, (D, W), 0)
        sent = jnp.asarray(pk.SENTINEL, jnp.int16)
        o_ref[0] = jnp.where(d_iota == 0, sent,
                             pk._roll(x, 1, axis=0)).astype(jnp.uint16)

    def k_p5(c_ref, o_ref, scratch):
        # scratch is (1, W) int16 — the same odd-sublane-count shape the
        # real kernel's carry_min plane uses
        scratch[...] = jnp.zeros_like(scratch)

        def step(s, _):
            x = c_ref[0, pl.ds(s, 1)].astype(jnp.int16) & 0xFF   # (1, W)
            scratch[...] = jnp.minimum(scratch[...], x + 1)
            o_ref[0, pl.ds(s, 1)] = (x + scratch[...]).astype(jnp.uint16)
            return ()

        jax.lax.fori_loop(0, ROWS, step, ())

    def k_p6(c_ref, o_ref):
        x = widen(c_ref)
        cm, shift = x, 1
        while shift < D:
            cm = jnp.minimum(cm, pk._roll(cm, shift, axis=0))
            shift *= 2
        o_ref[0] = (x + cm).astype(jnp.uint16)

    def compile_probe(name, kernel, in_shape, out_shape, scratch=None):
        t0 = time.time()
        try:
            fn = pl.pallas_call(
                kernel,
                grid=(1,),
                in_specs=[pl.BlockSpec(in_shape, lambda i: (0,) * len(in_shape),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint16),
                scratch_shapes=scratch or [],
                compiler_params=pk._VMEM_PARAMS,
            )
            x = jnp.zeros(in_shape, jnp.int8)
            jax.jit(fn).lower(x).compile()
            rec = {"ok": True, "compile_s": round(time.time() - t0, 1)}
        except Exception as e:
            line = str(e).splitlines()
            key = next((l for l in line if "Mosaic" in l or "INTERNAL" in l
                        or "NotImplemented" in l), line[0] if line else "?")
            rec = {"ok": False, "error": key.strip()[:200]}
        log(f"{name}: {rec}")
        return rec

    # --- second ladder: p5/p6 both fail and share one op absent from the
    # passing p0-p4 — jnp.minimum on int16.  Separate the suspects:
    def k_p8(c_ref, o_ref):          # int16 minimum, no loop/scratch
        x = widen(c_ref)
        o_ref[0] = jnp.minimum(x, pk._roll(x, 1, axis=1)).astype(jnp.uint16)

    def k_p9(c_ref, o_ref):          # int16 compare + where
        x = widen(c_ref)
        y = pk._roll(x, 1, axis=1)
        o_ref[0] = jnp.where(x < y, x, y).astype(jnp.uint16)

    def k_p10(c_ref, o_ref):         # arithmetic min: b + ((a-b) & (a-b)>>15)
        x = widen(c_ref)
        y = pk._roll(x, 1, axis=1)
        diff = x - y
        o_ref[0] = (y + (diff & (diff >> 15))).astype(jnp.uint16)

    def k_p5b(c_ref, o_ref, scratch):  # p5's scratch loop, adds only
        scratch[...] = jnp.zeros_like(scratch)

        def step(s, _):
            x = c_ref[0, pl.ds(s, 1)].astype(jnp.int16) & 0xFF
            scratch[...] = scratch[...] + x
            o_ref[0, pl.ds(s, 1)] = (x + scratch[...]).astype(jnp.uint16)
            return ()

        jax.lax.fori_loop(0, ROWS, step, ())

    results = {}
    results["p0_widen_store"] = compile_probe("p0", k_p0, (1, D, W), (1, D, W))
    results["p1_lane_roll"] = compile_probe("p1", k_p1, (1, D, W), (1, D, W))
    results["p2_sublane_roll_even"] = compile_probe(
        "p2", k_p2, (1, D, W), (1, D, W))
    results["p3_sublane_roll_odd"] = compile_probe(
        "p3", k_p3, (1, D, W), (1, D, W))
    results["p4_iota_select"] = compile_probe("p4", k_p4, (1, D, W), (1, D, W))
    results["p5_scratch_loop"] = compile_probe(
        "p5", k_p5, (1, ROWS, W), (1, ROWS, W),
        scratch=[pltpu.VMEM((1, W), jnp.int16)])
    results["p6_doubling_tree"] = compile_probe(
        "p6", k_p6, (1, D, W), (1, D, W))
    results["p8_min16"] = compile_probe("p8", k_p8, (1, D, W), (1, D, W))
    results["p9_cmp_where16"] = compile_probe("p9", k_p9, (1, D, W), (1, D, W))
    results["p10_arith_min16"] = compile_probe(
        "p10", k_p10, (1, D, W), (1, D, W))
    results["p5b_scratch_loop_add"] = compile_probe(
        "p5b", k_p5b, (1, ROWS, W), (1, ROWS, W),
        scratch=[pltpu.VMEM((1, W), jnp.int16)])

    # p7: the real fused scan step at a tiny shape
    t0 = time.time()
    try:
        import numpy as np
        rng = np.random.default_rng(0)
        cost = jnp.asarray(rng.integers(0, 128, (1, ROWS, D, W), dtype=np.int8))
        img = jnp.asarray(rng.integers(0, 256, (1, ROWS, W)).astype(np.int32))
        p2 = pk._p2_planes(img, (0, 1, -1), +1, 10, 150)
        run = jax.jit(functools.partial(
            pk._directional_scan_group, rolls=(0, 1, -1), reverse=False,
            p1=10, restart=False, block_rows=ROWS, compute16=True))
        run.lower(cost, p2, None).compile()
        results["p7_full_step_tiny"] = {
            "ok": True, "compile_s": round(time.time() - t0, 1)}
    except Exception as e:
        line = str(e).splitlines()
        key = next((l for l in line if "Mosaic" in l or "INTERNAL" in l
                    or "NotImplemented" in l), line[0] if line else "?")
        results["p7_full_step_tiny"] = {"ok": False, "error": key.strip()[:200]}
    log(f"p7: {results['p7_full_step_tiny']}")

    out = REPO / "results" / "mosaic_int16_probe.json"
    out.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "shape": {"D": D, "W": W, "ROWS": ROWS},
        "probes": results,
    }, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
