"""A/B the big-frame speckle strip policy: budget-max strips vs
deliberate over-splitting under the pyramid cap.

Production (`remove_speckles_pallas`) splits frames over
``_SPECKLE_VMEM_PIXELS`` (950K px) into as FEW strips as the VMEM budget
allows — at 1500x1000 that is 2 strips of 600 rows (900K px each), which
sit above ``_PYR_PIXEL_CAP`` and therefore run the recompute-per-round
propagation scheme.  results/speckle_compile_probe.json measured the
label-kernel compile as pixel-count-driven and superlinear in strip
rows, and results/speckle_probe.json measured the pyramid scheme ~24%
faster per pixel on cone — so OVER-splitting to 3 strips of 434 rows
(651K px, under the cap) should compile much faster AND may run faster
despite 8.5% more total halo rows.  This probe measures both on the real
chip (chained RTT-cancelling methodology) and asserts the two filtered
disparities bit-equal (the strip exactness argument holds for any strip
height >= max(8, min_area)).

Input: the cone pre-speckle disparity nearest-neighbour-resized to
1500x1000 (same content policy as scripts/big_config_bench.py — no
Middlebury pixels ship in this container).

Writes results/strip_pyr_probe.json.  Run on TPU (expect ~10 min of
cold kernel compiles):
    python scripts/strip_pyr_probe.py
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1000, 1500
FORCED_BUDGET = 660_000   # -> 3 strips of 434 rows = 651K px < _PYR_PIXEL_CAP


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()
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

    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    cl = load_image_gray_stb(base + "im2.png")
    cr = load_image_gray_stb(base + "im6.png")
    no_spk = dataclasses.replace(SGMOptions(), is_remove_speckles=False)
    small = np.asarray(sgm_forward(jnp.asarray(cl[None]),
                                   jnp.asarray(cr[None]),
                                   no_spk, use_pallas=True))[0]
    ri = (np.arange(H) * small.shape[0] // H)[:, None]
    ci = (np.arange(W) * small.shape[1] // W)[None, :]
    disp = jnp.asarray(small[ri, ci][None])        # (1, H, W) float32
    log("pre-speckle input ready (cone NN-resized to 1500x1000)")

    out = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
           "backend": jax.default_backend(), "height": H, "width": W,
           "input": "cone pre-speckle NN-resized", "variants": {}}
    path = REPO / "results" / "strip_pyr_probe.json"
    saved = pk._SPECKLE_VMEM_PIXELS
    ref = None
    for name, budget in (("prod_2strips", saved),
                         ("pyr_3strips", FORCED_BUDGET)):
        pk._SPECKLE_VMEM_PIXELS = budget
        try:
            strip = budget // W - 100
            n = -(-H // strip)
            step = jax.jit(lambda x: pk.remove_speckles_pallas(x, 1.0, 50))
            t0 = time.perf_counter()
            filt = np.asarray(step(disp))
            compile_s = time.perf_counter() - t0
            if ref is None:
                ref = filt
            bit_equal = bool(np.array_equal(ref, filt, equal_nan=True))
            ms = chained_delta_time(step, disp, iters=12, repeats=3) * 1e3
            out["variants"][name] = {
                "vmem_pixel_budget": budget, "n_strips": n,
                "strip_rows_with_halo": -(-H // n) + 100,
                "compile_plus_first_dispatch_s": round(compile_s, 1),
                "ms_per_frame": round(ms, 3), "bit_equal": bit_equal}
            log(f"{name}: n={n} compile+first {compile_s:.1f}s "
                f"{ms:.3f} ms/frame bit_equal={bit_equal}")
            path.write_text(json.dumps(out, indent=2) + "\n")
        finally:
            pk._SPECKLE_VMEM_PIXELS = saved
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
