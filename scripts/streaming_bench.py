"""Streaming throughput run — continuous host-fed batched inference.

The DrivingStereo-analog config from BASELINE.json ("continuous batched
inference, frames/s scaling sweep"): a producer thread streams stereo
frames through the double-buffered prefetch pipeline (data/pipeline.py,
the reference's two-slot shared-memory overlap, main.c:224-233) into the
jit-compiled engine at the reference's device frame format (1280x720,
D=64).  No DrivingStereo pixels ship in this container (zero egress), so
the frames are the cone pair resized to the device format — content does
not affect throughput.

Timing is honest under the lazily-dispatching TPU relay because every
batch's output has a scalar fetched before the clock stops — all device
work must have completed.  Reported:

  * sustained fps (host feed + transfer + compute overlapped)
  * device-resident fps: the SAME unchained loop on pre-staged device
    batches — no host->device transfer, so (streaming vs this) isolates
    the transfer cost and (this vs chained) the per-dispatch overhead
    the relay cannot hide (VERDICT r4 weak#7 isolation experiment)
  * host->device transfer bandwidth alone (device_put of one fresh
    input batch, forced)
  * device-only chained fps at the same config (upper bound)
  * overlap efficiency = sustained / device-only

Writes results/streaming_bench.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

W, H, D = 1280, 720, 64
BATCH = 8
N_BATCHES = 24


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()

    import jax
    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu import EngineConfig, SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb, resize_image)
    from soc_project_stereo_matching_tpu.data.pipeline import PrefetchIterator
    from soc_project_stereo_matching_tpu.models.sgm import SGMEngine

    log(f"backend={jax.default_backend()} {W}x{H} D={D} batch={BATCH}")
    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    try:
        left = resize_image(load_image_gray_stb(base + "im2.png"), W, H)
        right = resize_image(load_image_gray_stb(base + "im6.png"), W, H)
    except Exception:
        rng = np.random.default_rng(0)
        left = rng.integers(0, 256, (H, W), dtype=np.uint8)
        right = rng.integers(0, 256, (H, W), dtype=np.uint8)

    engine = SGMEngine(SGMOptions(max_disparity=D), EngineConfig())
    lefts0 = np.broadcast_to(left, (BATCH, H, W)).copy()
    rights0 = np.broadcast_to(right, (BATCH, H, W)).copy()

    # warm-up / compile
    t0 = time.perf_counter()
    out = engine.match_batch(lefts0, rights0)
    _ = jax.device_get(out[0, 0, 0])
    log(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    # --- streaming: producer thread feeds fresh host batches -------------
    def produce():
        for i in range(N_BATCHES):
            # fresh per-batch host arrays (top-left byte varies per frame
            # so no caching layer can collapse the stream)
            l = lefts0.copy()
            l[:, 0, 0] ^= np.uint8(i + 1)
            yield l, rights0

    stream = PrefetchIterator(produce(), depth=3)
    outs = []
    t0 = time.perf_counter()
    for l, r in stream:
        outs.append(engine.match_batch(l, r))
    # force every batch before stopping the clock
    for o in outs:
        _ = jax.device_get(o[0, 0, 0])
    dt = time.perf_counter() - t0
    fps_stream = N_BATCHES * BATCH / dt
    log(f"streaming: {N_BATCHES} x batch {BATCH}: {dt:.2f}s "
        f"-> {fps_stream:.1f} fps sustained")

    # --- device-resident: same loop shape, inputs pre-staged on device ---
    # (each batch distinct so no caching collapses the stream; ~350 MB HBM)
    dev_pairs = []
    for i in range(N_BATCHES):
        l = lefts0.copy()
        l[:, 0, 0] ^= np.uint8(i + 1)
        dev_pairs.append((jax.device_put(l), jax.device_put(rights0)))
    for l, r in dev_pairs:
        _ = jax.device_get(l[0, 0, 0])
        _ = jax.device_get(r[0, 0, 0])
    outs = []
    t0 = time.perf_counter()
    for l, r in dev_pairs:
        outs.append(engine._batched(l, r))
    for o in outs:
        _ = jax.device_get(o[0, 0, 0])
    dt = time.perf_counter() - t0
    fps_resident = N_BATCHES * BATCH / dt
    log(f"device-resident unchained: {fps_resident:.1f} fps")

    # --- host->device transfer bandwidth alone ---------------------------
    mb = 2 * lefts0.nbytes / 1e6
    ts = []
    for i in range(6):
        l = lefts0.copy()
        l[:, 0, 0] ^= np.uint8(100 + i)
        t0 = time.perf_counter()
        dl = jax.device_put(l)
        dr = jax.device_put(rights0.copy())
        _ = jax.device_get(dl[0, 0, 0])
        _ = jax.device_get(dr[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    t_h2d = min(ts)
    log(f"h2d transfer: {mb:.1f} MB/batch in {t_h2d * 1e3:.1f} ms "
        f"-> {mb / t_h2d / 1e3:.2f} GB/s")

    # --- device-only chained upper bound ---------------------------------
    from soc_project_stereo_matching_tpu.utils.profiling import (
        chained_match_time)

    dt_call, _out = chained_match_time(engine._batched, lefts0, rights0,
                                       iters=N_BATCHES)
    fps_dev = BATCH / dt_call
    log(f"device-only chained: {fps_dev:.1f} fps "
        f"({dt_call / BATCH * 1e3:.2f} ms/frame)")
    eff = fps_stream / fps_dev
    log(f"input-pipeline overlap efficiency: {eff:.1%}")

    res = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(),
        "config": {"width": W, "height": H, "max_disparity": D,
                   "batch": BATCH, "batches": N_BATCHES},
        "fps_streaming": round(fps_stream, 1),
        "fps_device_resident": round(fps_resident, 1),
        "fps_device_only": round(fps_dev, 1),
        "overlap_efficiency": round(eff, 3),
        "h2d_transfer_ms_per_batch": round(t_h2d * 1e3, 1),
        "h2d_transfer_gb_s": round(mb / t_h2d / 1e3, 2),
        "attribution": {
            "transfer_loss": round(1 - fps_stream / fps_resident, 3)
            if fps_resident else None,
            "dispatch_loss": round(1 - fps_resident / fps_dev, 3),
            "note": "streaming/resident gap = host->device transfer not "
                    "hidden by prefetch; resident/chained gap = per-batch "
                    "dispatch overhead the relay cannot overlap",
        },
    }
    out_path = REPO / "results" / "streaming_bench.json"
    out_path.parent.mkdir(exist_ok=True)
    out_path.write_text(json.dumps(res, indent=2))
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
