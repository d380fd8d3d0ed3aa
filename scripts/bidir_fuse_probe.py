"""A/B the bidirectional fused DP scans against the two-launch formulation.

r5 follow-through on the recurrence-floor analysis
(results/recurrence_floor.json): the shipped 4-launch aggregation ran at
1.67x the empirical serial floor, and the gap decomposition pointed at HBM
round trips — each direction pair writes a full (S, D, P) uint16 partial
volume that its second launch immediately reads back, and the final fused
WTA launch stores an aggregated volume nobody consumes.

``_directional_scan_group_bidir`` folds each pair into ONE launch (grid
(b, dir, chunk)): the forward pass parks its row sums in a full-frame VMEM
scratch, the backward pass adds them and emits the only HBM store.  With
``wta`` the aggregated volume store is dropped entirely.

This probe times, on the real chip at the production cone geometry
(B=8, 450x375, D=64, full 8-path):

  aggr_wta_2launch / aggr_wta_bidir   the fused aggregation+WTA entry
  pipeline_2launch / pipeline_bidir   the full sgm_forward pipeline
  hpart_2launch   / hpart_bidir       the horizontal pair alone

asserting bit-equality of every variant pair on-device first, and writes
results/bidir_fuse_probe.json.  Timing: RTT-cancelling two-length chains
(chained_delta_time), min-of-repeats.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

B, H, W, D = 8, 375, 450, 64
ITERS = 24
REPEATS = 3


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend(log=log)

    import functools

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "probe needs the real chip"
    jax.config.update("jax_compilation_cache_dir", "/tmp/soc_sgm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)
    from soc_project_stereo_matching_tpu.models.sgm import sgm_forward
    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk
    from soc_project_stereo_matching_tpu.utils.profiling import (
        chained_delta_time)

    opt = SGMOptions(max_disparity=D)
    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    left = load_image_gray_stb(base + "im2.png")
    right = load_image_gray_stb(base + "im6.png")
    lefts = jnp.asarray(np.broadcast_to(left, (B, H, W)))
    rights = jnp.asarray(np.broadcast_to(right, (B, H, W)))
    cost = pk.census_cost_volume_pallas(lefts, rights, 0, D)
    img = jax.jit(lambda x: x.astype(jnp.int32))(lefts)
    cost8 = jax.jit(lambda c: c.astype(jnp.int8))(cost)

    results = {}

    def record(name, fn, note=""):
        try:
            s = min(fn() for _ in range(REPEATS))
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:300]}"}
            log(f"{name:18s} FAILED: {type(e).__name__}: {str(e)[:200]}")
            return None
        ms = s * 1e3 / B
        results[name] = {"ms_per_frame": round(ms, 4)}
        if note:
            results[name]["note"] = note
        log(f"{name:18s} {ms:8.4f} ms/frame")
        return ms

    # ---- bit-equality gates ----------------------------------------------
    f2, i2 = pk.aggregate_paths_wta(cost, lefts, opt, bidir=False)
    fb, ib = pk.aggregate_paths_wta(cost, lefts, opt, bidir=True)
    eq_wta = all(
        bool(jnp.array_equal(a, b))
        for pair in ((f2, fb), (i2, ib)) for a, b in zip(*pair))
    log(f"aggregate_paths_wta bit-equal: {eq_wta}")

    a2 = pk.aggregate_paths(cost, lefts, opt, bidir=False)
    ab = pk.aggregate_paths(cost, lefts, opt, bidir=True)
    eq_aggr = bool(jnp.array_equal(a2, ab))
    log(f"aggregate_paths bit-equal:     {eq_aggr}")

    d2 = sgm_forward(lefts, rights, opt, use_pallas=True)
    results["bit_equal"] = {"aggregate_paths_wta": eq_wta,
                            "aggregate_paths": eq_aggr}
    assert eq_wta and eq_aggr, "bidir must be bit-equal before timing"

    # ---- timings -----------------------------------------------------------
    def aggr_wta_step(bidir):
        def step(im):
            f, i = pk.aggregate_paths_wta(cost, im, opt, bidir=bidir)
            return im + (f.best_idx & 1).astype(jnp.uint8)
        return step

    def hpart_step(bidir):
        def step(c8):
            out = pk.horizontal_partial(c8, img, opt.p1, opt.p2_init,
                                        False, bidir=bidir)
            return c8 ^ (out & 1).astype(jnp.int8)
        return step

    def pipe_step(bidir):
        # bidir rides the default "auto" gate inside sgm_forward; the probe
        # pins it per variant through aggregate_paths_wta only, so for the
        # pipeline A/B we call the fused entry directly at both settings
        def step(im):
            f, i = pk.aggregate_paths_wta(
                pk.census_cost_volume_pallas(im, rights, 0, D), im, opt,
                bidir=bidir)
            return im + (f.best_idx & 1).astype(jnp.uint8)
        return step

    record("aggr_wta_2launch",
           lambda: chained_delta_time(aggr_wta_step(False), lefts,
                                      iters=ITERS))
    record("aggr_wta_bidir",
           lambda: chained_delta_time(aggr_wta_step(True), lefts,
                                      iters=ITERS))
    record("hpart_2launch",
           lambda: chained_delta_time(hpart_step(False), cost8, iters=ITERS))
    record("hpart_bidir",
           lambda: chained_delta_time(hpart_step(True), cost8, iters=ITERS))
    record("census_aggr_wta_2launch",
           lambda: chained_delta_time(pipe_step(False), lefts, iters=ITERS))
    record("census_aggr_wta_bidir",
           lambda: chained_delta_time(pipe_step(True), lefts, iters=ITERS))

    out_path = REPO / "results" / "bidir_fuse_probe.json"
    out_path.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": "tpu",
        "batch": B, "height": H, "width": W, "d": D, "iters": ITERS,
        "repeats": REPEATS,
        "variants": results,
    }, indent=2))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
