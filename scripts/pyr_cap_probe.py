"""Validate the speckle doubling-mask pyramid near its pixel cap (ADVICE r4).

The pyramid path (_cc_propagate, use_pyr = h*w <= _PYR_PIXEL_CAP) was only
compile-validated at cone size (169K px); near the 700K cap with a wide
aspect the pyramid's ~44 B/pixel of loop-invariant VMEM rides on top of the
label kernel's ~95 B/pixel, and 1.10M-pixel strips previously failed to
compile — so a mid-size wide frame could hit a Mosaic compile failure that
no test sees.

This probe Mosaic-compiles AND runs remove_speckles_pallas at:

  * 332 x 2048  = 679,936 px — just under the cap, the widest plausible
    aspect (w=2048)
  * 680 x 1024  = 696,320 px — tall variant, also under the cap
  * cone-sized control

checking each against the jnp fallback for correctness, and writes
results/pyr_cap_probe.json.  If a geometry fails, _PYR_PIXEL_CAP must be
lowered below it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend(log=log)

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    jax.config.update("jax_compilation_cache_dir", None)  # true cold compiles

    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk
    from soc_project_stereo_matching_tpu.ops.postprocess import (
        remove_speckles)

    rng = np.random.default_rng(3)
    results = {}
    for name, h, w in [("wide_680k", 332, 2048), ("tall_696k", 680, 1024),
                       ("cone_control", 375, 450)]:
        px = h * w
        use_pyr = px <= pk._PYR_PIXEL_CAP
        # blocky disparity field: real component structure (plateaus with
        # speckle-scale islands), not iid noise
        base = rng.integers(0, 60, (h // 8 + 1, w // 8 + 1))
        disp = np.kron(base, np.ones((8, 8)))[:h, :w].astype(np.float32)
        mask = rng.random((h, w)) < 0.01
        disp[mask] += rng.integers(3, 20, mask.sum())
        dj = jnp.asarray(disp)
        rec = {"h": h, "w": w, "pixels": px, "pyramid": bool(use_pyr)}
        try:
            t0 = time.perf_counter()
            out = pk.remove_speckles_pallas(dj, 1.0, 50)
            got = np.asarray(out)
            rec["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            want = np.asarray(remove_speckles(dj, 1.0, 50))
            eq = np.array_equal(got, want) or bool(
                np.all((got == want) | (np.isinf(got) & np.isinf(want))))
            rec["bit_equal_vs_jnp"] = eq
            log(f"{name}: ok, {rec['compile_plus_first_s']}s, eq={eq}")
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:300]}"
            log(f"{name}: FAILED {rec['error'][:160]}")
        results[name] = rec

    out_path = REPO / "results" / "pyr_cap_probe.json"
    out_path.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": "tpu",
        "pyr_pixel_cap": pk._PYR_PIXEL_CAP,
        "results": results,
    }, indent=2))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
