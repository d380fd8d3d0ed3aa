"""A/B harness for DP-scan kernel variants on real TPU.

Times the fused 3-direction vertical scan launch (the hot half of the
aggregation stage, ops/pallas_kernels._directional_scan_group) across
compute-width / unroll variants, plus the full fused aggregation+WTA stage
(compute16 off/on) and the census+cost store width (int32 staging vs uint8
tile slabs) — asserting bit-equality against the int32 baseline before any
variant is timed; a non-equal variant records ``bit_equal: false`` and no
timing, so results/scan_variants.json never carries a broken variant's
number as if validated.

Chained dependency timing per CLAUDE.md: the relay dispatches lazily, so
each timed run is an n-long chain whose per-launch time is the
(n - 1)-normalised difference of two chain lengths.

Writes results/scan_variants.json and prints a table to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, H, D, W = 8, 375, 64, 450
ROLLS = (0, 1, -1)
ITERS = 12
REPEATS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend(log=log)

    import jax

    # persistent compile cache: relay compiles cost minutes; lets retry
    # attempts (and bench.py) share compiled programs
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/soc_sgm_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

    log(f"backend={jax.default_backend()} B={B} H={H} D={D} W={W}")

    def chain_time(fn, feedback, *args):
        """Per-launch seconds for ``fn(*args)`` via two-length chains.

        ``feedback(prev_out, first_arg)`` must derive the next first
        argument from the previous output so no link can be elided.  Falls
        back to the 1-chain time when the relay's noise makes the long
        chain measure faster than the short one (same guard as
        utils/profiling.chained_match_time).
        """
        @jax.jit
        def chained(a0, rest, n):
            def body(_, a):
                return feedback(fn(a, *rest), a)
            return fn(jax.lax.fori_loop(0, n, body, a0), *rest)

        a0, rest = args[0], args[1:]
        o = chained(a0, rest, 1)
        jax.device_get(jnp.ravel(o)[0])
        best = {}
        for n in (1, ITERS):
            b = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                o = chained(a0, rest, n)
                jax.device_get(jnp.ravel(o)[0])
                b = min(b, time.perf_counter() - t0)
            best[n] = b
        if best[ITERS] <= best[1]:
            return best[1]      # relay noise: chains inverted; be honest
        return (best[ITERS] - best[1]) / (ITERS - 1)

    def ab_section(variants, ref_name, feedback, *args):
        """Run every variant; record bit_equal vs ``ref_name`` and time only
        the equal ones.  Returns {name: {bit_equal, s_per_launch?}}."""
        ref = np.asarray(variants[ref_name](*args))
        out = {}
        for name, fn in variants.items():
            try:
                if name == ref_name:
                    equal = True
                else:
                    equal = bool(np.array_equal(ref, np.asarray(fn(*args))))
                    log(f"{name}: bit-equal={equal}")
                if not equal:
                    out[name] = {"bit_equal": False}
                    continue
                t = chain_time(fn, feedback, *args)
            except Exception as e:
                # a variant that fails to compile (e.g. a Mosaic limitation)
                # must not sink the whole artifact: record why, keep going
                msg = str(e).splitlines()
                key = next((l for l in msg if "Mosaic" in l or "INTERNAL" in l
                            or "NotImplemented" in l), msg[0] if msg else "?")
                out[name] = {"error": key.strip()[:200]}
                log(f"{name}: ERROR {out[name]['error']}")
                continue
            out[name] = {"bit_equal": True, "s_per_launch": t}
            log(f"{name:16s} {t * 1e3:8.3f} ms/launch")
        return out

    rng = np.random.default_rng(0)

    # --- fused 3-direction vertical scan launch ---------------------------
    cost = jnp.asarray(rng.integers(0, 128, (B, H, D, W), dtype=np.int8))
    img = jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.int32))
    p2 = pk._p2_planes(img, ROLLS, +1, 10, 150)
    hp = pk._round_up(H, 32)
    pad = ((0, 0), (0, hp - H), (0, 0), (0, 0))
    cost_p = jnp.pad(cost, pad)
    p2_p = jnp.pad(p2, pad)

    def make_run(**kw):
        @jax.jit
        def run(c, p):
            return pk._directional_scan_group(
                c, p, None, ROLLS, False, 10, False, 32, **kw)
        return run

    scan_fb = lambda out, c: c ^ (out[:, :1, :1, :1] & 1).astype(jnp.int8)
    # unroll=32 is FULL unroll of the 32-row chunk loop — the only non-1
    # value this stack's Mosaic accepts ("Only unroll=num_steps=32 and
    # unroll=1 supported", recorded in the r4 artifact for unroll=2)
    results = ab_section(
        {
            "i32": make_run(),
            "i16": make_run(compute16=True),
            "i32_unroll_full": make_run(unroll=32),
            "i16_unroll_full": make_run(compute16=True, unroll=32),
        },
        "i32", scan_fb, cost_p, p2_p)
    for r in results.values():
        if "s_per_launch" in r:
            r["ms_per_launch"] = round(r.pop("s_per_launch") * 1e3, 4)
    base = results["i32"]["ms_per_launch"]
    for r in results.values():
        if r.get("ms_per_launch"):
            r["speedup_vs_i32"] = round(base / r["ms_per_launch"], 3)

    # --- full fused aggregation+WTA stage, compute16 off/on ---------------
    # (the decision number for the EngineConfig.compute16 default: all four
    # DP launches plus the fused WTA reduce, exactly as the pipeline runs it)
    from soc_project_stereo_matching_tpu.config import SGMOptions

    opt = SGMOptions(max_disparity=D)
    imgi = jnp.asarray(rng.integers(0, 256, (B, H, W)).astype(np.uint8))
    cost_u8 = jnp.asarray(
        rng.integers(0, 128, (B, H, D, W), dtype=np.uint8))

    def make_stage(c16):
        return jax.jit(lambda c, i: pk.aggregate_paths_wta(
            c, i, opt, include_inverse=True, compute16=c16)[0].best_idx)

    stage_fb = lambda out, c: c ^ (out[:, :1, :1, None] & 1).astype(jnp.uint8)
    stage = ab_section(
        {"stage_i32": make_stage(False), "stage_i16": make_stage(True)},
        "stage_i32", stage_fb, cost_u8, imgi)
    for r in stage.values():
        if "s_per_launch" in r:
            r["ms_per_frame"] = round(r.pop("s_per_launch") * 1e3 / B, 4)
            log(f"  = {r['ms_per_frame']:.3f} ms/frame")

    # --- census+cost store-width A/B (uint8 tile slabs vs int32 + XLA
    # narrowing; see _census_cost_kernel's store8 doc) ---------------------
    imgl = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    imgr = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))

    def make_census(s8):
        return jax.jit(lambda l, r: pk.census_cost_volume_pallas(
            l, r, 0, D, store8=s8))

    census_fb = lambda out, l: l ^ (out[:, :1, 0, :1] & 1)
    census = ab_section(
        {"int32+narrow": make_census(False), "uint8_slab": make_census(True)},
        "int32+narrow", census_fb, imgl, imgr)
    for r in census.values():
        if "s_per_launch" in r:
            r["ms_per_launch"] = round(r.pop("s_per_launch") * 1e3, 4)

    out = REPO / "results" / "scan_variants.json"
    out.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "shape": {"B": B, "H": H, "D": D, "W": W, "rolls": list(ROLLS)},
        "variants": results,
        "aggregation_stage": stage,
        "census_store": census,
    }, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
