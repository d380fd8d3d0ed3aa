"""Attribute the big-frame speckle COMPILE outlier to an axis.

results/compile_profile.json pins 390 s of the 434 s Middlebury D=256
pipeline compile on ``remove_speckles`` — the only launch whose Mosaic
program grows with the frame plane rather than the (rows, D, W) chunk.
The production strip there is (600, 1500): 900K pixels, 1500 lanes.
This probe times true cold compiles of ``remove_speckles_pallas`` over
shapes that decouple the candidate drivers:

  wide   (600, 1500)  900K px, 1500 lanes — the production strip
  tall   (1200, 750)  900K px,  750 lanes — same pixels, half the lanes
  short  (480, 1500)  720K px, 1500 lanes — same lanes, 20% fewer pixels

All three exceed ``_PYR_PIXEL_CAP`` (700K), so they compile the same
recompute-per-round propagation scheme as the production strip; only the
plane geometry varies.  If wide ≈ short >> tall, Mosaic compile time is
lane-width-driven (the unrolled doubling rolls span ceil_log2(w) strides
across w/128 lane tiles); if wide ≈ tall, it is pixel-count-driven and
only a smaller VMEM budget would cut it.

Writes results/speckle_compile_probe.json (read-modify-write, so shapes
can be probed one per invocation — each cold compile runs minutes).
Run on TPU:
    python scripts/speckle_compile_probe.py [shape ...]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SHAPES = {
    "wide_600x1500": (600, 1500),
    "tall_1200x750": (1200, 750),
    "short_480x1500": (480, 1500),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()

    import jax

    # True cold compiles (same guard as scripts/compile_profile.py).
    jax.config.update("jax_compilation_cache_dir", None)

    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

    log(f"backend={jax.default_backend()}, devices={jax.devices()}")
    path = REPO / "results" / "speckle_compile_probe.json"
    out = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "pyr_pixel_cap": pk._PYR_PIXEL_CAP,
        "results": {},
    }
    if path.exists():
        prev = json.loads(path.read_text())
        out["results"] = prev.get("results", {})

    wanted = sys.argv[1:] or list(SHAPES)
    rng = np.random.default_rng(0)
    for name in wanted:
        h, w = SHAPES[name]
        assert h * w > pk._PYR_PIXEL_CAP, name  # keep the scheme uniform
        disp = jnp.asarray(
            rng.integers(0, 64, (1, h, w)).astype(np.float32))
        fn = jax.jit(lambda d: pk.remove_speckles_pallas(d, 1.0, 50))
        t0 = time.perf_counter()
        lowered = fn.lower(disp)
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        lowered.compile()
        t_compile = time.perf_counter() - t0
        out["results"][name] = {
            "h": h, "w": w, "pixels": h * w,
            "lower_s": round(t_lower, 2),
            "compile_s": round(t_compile, 2),
        }
        log(f"{name:16s} lower {t_lower:6.2f}s  compile {t_compile:8.2f}s")
        # write after every shape: a killed run keeps its finished points
        path.write_text(json.dumps(out, indent=2) + "\n")
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
