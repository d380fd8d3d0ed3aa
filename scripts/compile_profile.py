"""Per-launch compile-time profile (VERDICT r2 weak #3: first compile blew
up 155 s -> 969 s between rounds with no attribution).

Times ``jax.jit(...).lower()`` and ``.compile()`` separately for each
pipeline unit at the headline cone config (B=32, 450x375, D=64), plus the
fused-vs-two-pass aggregation+WTA variants, with the persistent compilation
cache DISABLED so the numbers are true cold compiles.  Writes
results/compile_profile.json and a summary to stderr.

Run on TPU:  python scripts/compile_profile.py [--big]
(--big adds the Middlebury D=256 geometry units; expect minutes per unit.)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()

    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="also profile the Middlebury-2014 D=256 geometry")
    args = ap.parse_args()

    import jax

    # True cold compiles: force the persistent compilation cache OFF even if
    # the environment carries JAX_COMPILATION_CACHE_DIR (bench.py and
    # scan_variant_bench.py populate /tmp/soc_sgm_jax_cache — a silent hit
    # here would record warm numbers as cold ones).
    jax.config.update("jax_compilation_cache_dir", None)

    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.models.sgm import sgm_forward
    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

    log(f"backend={jax.default_backend()}, devices={jax.devices()}")

    results = []

    def timed(name, fn, *fargs):
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(*fargs)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        rec = {"unit": name, "lower_s": round(t_lower, 2),
               "compile_s": round(t_compile, 2)}
        results.append(rec)
        log(f"{name:42s} lower {t_lower:7.2f}s  compile {t_compile:8.2f}s")
        return rec

    def profile_config(tag, b, h, w, d):
        opts = SGMOptions(max_disparity=d)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
        img2 = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
        cost = jnp.asarray(
            rng.integers(0, 128, (b, h, d, w), dtype=np.uint8))
        aggr = jnp.asarray(
            rng.integers(0, 60000, (b, h, d, w), dtype=np.uint16))
        disp = jnp.asarray(rng.uniform(0, d - 1, (b, h, w)).astype(np.float32))

        timed(f"{tag}/census_cost",
              partial(pk.census_cost_volume_pallas,
                      min_disparity=0, max_disparity=d), img, img2)
        timed(f"{tag}/aggregate_paths",
              partial(pk.aggregate_paths, options=opts), cost, img)
        timed(f"{tag}/aggregate_paths_wta(fused)",
              partial(pk.aggregate_paths_wta, options=opts), cost, img)
        timed(f"{tag}/wta_reduce",
              partial(pk.wta_reduce_pallas, options=opts), aggr)
        timed(f"{tag}/lr_check",
              partial(pk.lr_check_pallas, thres=1.0, max_shift=d),
              disp, disp)
        timed(f"{tag}/remove_speckles",
              partial(pk.remove_speckles_pallas, min_area=50), disp)
        timed(f"{tag}/full_pipeline(fused)",
              partial(sgm_forward, options=opts, use_pallas=True), img, img2)

    profile_config("cone-b32", 32, 375, 450, 64)
    if args.big:
        profile_config("middlebury-b1", 1, 1000, 1500, 256)

    out = REPO / "results" / "compile_profile.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
         "backend": __import__("jax").default_backend(),
         "persistent_cache": False,
         "results": results}, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
