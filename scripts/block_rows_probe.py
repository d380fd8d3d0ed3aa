"""A/B the scan-chunk size (block_rows) for the bidirectional launches.

The floor analysis v2 (results/recurrence_floor.json) leaves the horizontal
pair at ~2.3x its achievable bound with per-chunk grid overhead as the
prime suspect: at block_rows=32 the cone horizontal launch runs
(B, 2, 15) = 240 grid steps, each paying prologue + DMA handshakes.
Larger chunks cut the step count linearly while the bidir VMEM budget
(scratch + 2x revolving blocks) still fits comfortably at cone size.

Times aggregate_paths_wta and horizontal_partial at block_rows in
{16, 32, 64, 96} on the real chip (bit-equality asserted per variant) and
writes results/block_rows_probe.json.
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

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    jax.config.update("jax_compilation_cache_dir", "/tmp/soc_sgm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)
    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk
    from soc_project_stereo_matching_tpu.utils.profiling import (
        chained_delta_time)

    opt = SGMOptions(max_disparity=D)
    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    left = load_image_gray_stb(base + "im2.png")
    lefts = jnp.asarray(np.broadcast_to(left, (B, H, W)))
    right = load_image_gray_stb(base + "im6.png")
    rights = jnp.asarray(np.broadcast_to(right, (B, H, W)))
    cost = pk.census_cost_volume_pallas(lefts, rights, 0, D)
    img = jax.jit(lambda x: x.astype(jnp.int32))(lefts)
    cost8 = jax.jit(lambda c: c.astype(jnp.int8))(cost)

    ref_f, ref_i = pk.aggregate_paths_wta(cost, lefts, opt, block_rows=32)
    results = {}

    for br in (16, 32, 64, 96):
        rec = {}
        try:
            f, i = pk.aggregate_paths_wta(cost, lefts, opt, block_rows=br)
            eq = all(bool(jnp.array_equal(a, b))
                     for pair in ((ref_f, f), (ref_i, i))
                     for a, b in zip(*pair))
            rec["bit_equal"] = eq

            def wta_step(im, br=br):
                ff, _ = pk.aggregate_paths_wta(cost, im, opt, block_rows=br)
                return im + (ff.best_idx & 1).astype(jnp.uint8)

            s = min(chained_delta_time(wta_step, lefts, iters=ITERS)
                    for _ in range(REPEATS))
            rec["aggr_wta_ms_per_frame"] = round(s * 1e3 / B, 4)

            def hp_step(c8, br=br):
                out = pk.horizontal_partial(c8, img, opt.p1, opt.p2_init,
                                            False, block_rows=br)
                return c8 ^ (out & 1).astype(jnp.int8)

            s = min(chained_delta_time(hp_step, cost8, iters=ITERS)
                    for _ in range(REPEATS))
            rec["hpart_ms_per_frame"] = round(s * 1e3 / B, 4)
            log(f"block_rows={br}: aggr_wta {rec['aggr_wta_ms_per_frame']}"
                f" hpart {rec['hpart_ms_per_frame']} eq={eq}")
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"block_rows={br}: FAILED {rec['error'][:160]}")
        results[str(br)] = rec

    out_path = REPO / "results" / "block_rows_probe.json"
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
