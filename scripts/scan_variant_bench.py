"""A/B harness for DP-scan kernel variants on real TPU.

Times the fused 3-direction vertical scan launch (the hot half of the
aggregation stage, ops/pallas_kernels._directional_scan_group) across
compute-width / unroll variants, asserting bit-equality against the int32
baseline first.  Chained dependency timing per CLAUDE.md: the relay
dispatches lazily, so each timed run is an n-long chain whose per-launch
time is the (n − 1)-normalised difference of two chain lengths.

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
    rng = np.random.default_rng(0)
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

    variants = {
        "i32": make_run(),
        "i16": make_run(compute16=True),
        "i32_unroll2": make_run(unroll=2),
        "i16_unroll2": make_run(compute16=True, unroll=2),
    }

    def chain_time(fn):
        @jax.jit
        def chained(c, p, n):
            def body(_, cc):
                out = fn(cc, p)
                return cc ^ (out[:, :1, :1, :1] & 1).astype(jnp.int8)
            return fn(jax.lax.fori_loop(0, n, body, c), p)

        o = chained(cost_p, p2_p, 1)
        jax.device_get(jnp.ravel(o)[0])
        best = {}
        for n in (1, ITERS):
            b = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                o = chained(cost_p, p2_p, n)
                jax.device_get(jnp.ravel(o)[0])
                b = min(b, time.perf_counter() - t0)
            best[n] = b
        return (best[ITERS] - best[1]) / (ITERS - 1)

    o32 = np.asarray(variants["i32"](cost_p, p2_p))
    results = {}
    for name, fn in variants.items():
        if name != "i32":
            equal = bool(np.array_equal(o32, np.asarray(fn(cost_p, p2_p))))
            log(f"{name}: bit-equal={equal}")
            if not equal:
                results[name] = {"bit_equal": False}
                continue
        t = chain_time(fn)
        results[name] = {"bit_equal": True, "ms_per_launch": round(t * 1e3, 4)}
        log(f"{name:12s} {t * 1e3:8.3f} ms/launch")

    base = results["i32"]["ms_per_launch"]
    for name, r in results.items():
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
    stage = {}
    ref_planes = None
    for name, c16 in (("stage_i32", False), ("stage_i16", True)):
        fn = jax.jit(lambda c, i, c16=c16: pk.aggregate_paths_wta(
            c, i, opt, include_inverse=True, compute16=c16)[0].best_idx)

        @jax.jit
        def chained(c, i, n, fn=fn):
            def body(_, cc):
                out = fn(cc, i)
                return cc ^ (out[:, :1, :1, None] & 1).astype(jnp.uint8)
            return fn(jax.lax.fori_loop(0, n, body, c), i)

        got = np.asarray(fn(cost_u8, imgi))
        if ref_planes is None:
            ref_planes = got
        else:
            log(f"{name}: bit-equal={np.array_equal(ref_planes, got)}")
        jax.device_get(jnp.ravel(chained(cost_u8, imgi, 1))[0])
        best = {}
        for n in (1, ITERS):
            bt = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                o = chained(cost_u8, imgi, n)
                jax.device_get(jnp.ravel(o)[0])
                bt = min(bt, time.perf_counter() - t0)
            best[n] = bt
        t = (best[ITERS] - best[1]) / (ITERS - 1)
        stage[name] = {"ms_per_frame": round(t * 1e3 / B, 4)}
        log(f"{name:12s} {t * 1e3 / B:8.3f} ms/frame")

    # --- census+cost store-width A/B (uint8 tile slabs vs int32 + XLA
    # narrowing; see _census_cost_kernel's store8 doc) ---------------------
    imgl = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    imgr = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    census = {}
    for name, s8 in (("int32+narrow", False), ("uint8_slab", True)):
        fn = jax.jit(lambda l, r, s8=s8: pk.census_cost_volume_pallas(
            l, r, 0, D, store8=s8))

        @jax.jit
        def chained(l, r, n, fn=fn):
            def body(_, ll):
                out = fn(ll, r)
                return ll ^ (out[:, :1, 0, :1] & 1)
            return fn(jax.lax.fori_loop(0, n, body, l), r)

        ref = np.asarray(fn(imgl, imgr))
        if name == "int32+narrow":
            c_ref = ref
        else:
            log(f"census uint8_slab bit-equal="
                f"{np.array_equal(c_ref, ref)}")
        jax.device_get(jnp.ravel(chained(imgl, imgr, 1))[0])
        best = {}
        for n in (1, ITERS):
            bt = float("inf")
            for _ in range(REPEATS):
                t0 = time.perf_counter()
                o = chained(imgl, imgr, n)
                jax.device_get(jnp.ravel(o)[0])
                bt = min(bt, time.perf_counter() - t0)
            best[n] = bt
        t = (best[ITERS] - best[1]) / (ITERS - 1)
        census[name] = {"ms_per_launch": round(t * 1e3, 4)}
        log(f"census {name:14s} {t * 1e3:8.3f} ms/launch")

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
