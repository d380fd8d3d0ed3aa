"""North-star size configs on real TPU hardware (BASELINE.json configs).

Runs the two large geometries the reference could never touch (its C core
is statically capped at 450x375x64, SemiGlobalMatching.h:14-16):

  * KITTI-2015 geometry: 1242x375, D=192
  * Middlebury-2014 half-res geometry: 1500x1000, D=256

No KITTI/Middlebury-2014 pixels exist in this container (zero egress), so
the frames are the real cone pair resized to the target geometry — the
disparity field scales with width (x2.76 -> ~176 < 192; x3.33 -> ~213 <
256), giving genuinely matchable stereo content so valid_frac is
meaningful.  Accuracy numbers on real data live in
results/reference_data_eval.json (the four reference pairs); KITTI-2015
accuracy remains unmeasured until real KITTI data is available.

Timing: chained dependency methodology (see bench.py / CLAUDE.md).
Writes results/big_configs.json and prints a summary to stderr.
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


def load_resized(w, h):
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb, resize_image)

    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    left = load_image_gray_stb(base + "im2.png")
    right = load_image_gray_stb(base + "im6.png")
    return resize_image(left, w, h), resize_image(right, w, h)


def run_config(name, w, h, d, batch, iters=4, tiled=False, dmin=0):
    import jax
    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu import EngineConfig, SGMOptions
    from soc_project_stereo_matching_tpu.models.sgm import SGMEngine
    from soc_project_stereo_matching_tpu.parallel.mesh import make_mesh

    from soc_project_stereo_matching_tpu.utils.profiling import (
        chained_match_time)

    opts = SGMOptions(min_disparity=dmin, max_disparity=d)
    left, right = load_resized(w, h)
    lefts = jnp.asarray(np.broadcast_to(left, (batch, h, w)))
    rights = jnp.asarray(np.broadcast_to(right, (batch, h, w)))

    if tiled:
        # single-chip tiled path (tile=1): validates the Pallas tiled
        # program (halo census, carry-aware group scans, Pallas WTA tail)
        # compiles and runs at size on real hardware
        from soc_project_stereo_matching_tpu.parallel.tiles import (
            make_tiled_matcher)

        mesh = make_mesh(data=1, tile=1)
        fn = make_tiled_matcher(opts, mesh, h, w, cross_tile="exact",
                                use_pallas=jax.default_backend() == "tpu")
        match = fn
    else:
        engine = SGMEngine(opts, EngineConfig(use_pallas=True))
        match = engine._batched

    dt_call, out0, (compile_s, first_s, samples) = chained_match_time(
        match, lefts, rights, iters=iters, return_compile=True,
        compile_repeats=2)
    dt = dt_call / batch
    valid = float(np.isfinite(out0[0]).mean())
    res = {"config": name, "width": w, "height": h, "max_disparity": d,
           "min_disparity": dmin, "batch": batch, "tiled": tiled,
           "ms_per_frame": round(dt * 1e3, 2),
           "fps_per_chip": round(1.0 / dt, 1),
           "valid_frac": round(valid, 3),
           # structural .lower().compile() wall time vs the first dispatch
           # through the lazily-executing relay — kept separate so tunnel
           # weather can't masquerade as compile time (BENCH_r02 lesson);
           # min of compile_samples so one weather-struck attempt can't
           # become the record (the r3 kitti2012 1019 s outlier)
           "compile_s": round(compile_s, 1),
           "compile_samples_s": [round(s, 1) for s in samples],
           "first_dispatch_s": round(first_s, 1)}
    log(f"{name}: {res['ms_per_frame']} ms/frame ({res['fps_per_chip']} fps)"
        f" valid_frac={valid:.3f} compile={compile_s:.0f}s"
        f" (samples {res['compile_samples_s']})"
        f" first_dispatch={first_s:.0f}s tiled={tiled}")
    return res


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()

    import jax

    log(f"backend={jax.default_backend()}, devices={jax.devices()}")
    results = []
    for cfg in (
            # 128 disparity levels shifted to cover the scaled content
            # (cone GT spans 5.5-55 px at 450 wide -> 15-152 at 1242; the
            # old [0, 128) config put a third of the scene out of range by
            # construction and valid_frac measured that mismatch, not
            # pipeline health — VERDICT r2 weak #8)
            ("kitti2012-fullres", 1242, 375, 152, dict(batch=4, dmin=24)),
            ("kitti2015-geometry", 1242, 375, 192, dict(batch=4)),
            ("middlebury2014-half", 1500, 1000, 256, dict(batch=1, iters=3)),
            ("middlebury2014-half-tiled", 1500, 1000, 256,
             dict(batch=1, iters=3, tiled=True))):
        name, w, h, d, kw = cfg
        try:
            results.append(run_config(name, w, h, d, **kw))
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {str(e)[:500]}")
            results.append({"config": name, "error": str(e)[:500]})
    out = REPO / "results" / "big_configs.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(
        {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
         "backend": jax.default_backend(),
         "results": results}, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
