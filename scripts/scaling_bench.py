"""Multi-device scaling benchmark (frames/s vs mesh size).

Measures the tiled/sharded matcher on 1..N devices of the current platform
and reports scaling efficiency (BASELINE.md target: >= 80% at a full
slice).  On a CPU host it uses virtual devices and validates the sharded
program end-to-end; wall-clock efficiency is only meaningful on real
chips.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_bench.py --mode data
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=("data", "tile"), default="data",
                    help="scale the batch axis (data) or the H-tile axis")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--height", type=int, default=368)
    ap.add_argument("--width", type=int, default=450)
    ap.add_argument("--max-disparity", type=int, default=64)
    ap.add_argument("--cross-tile", choices=("exact", "pipelined", "local"),
                    default="exact")
    ap.add_argument("--json", type=Path, default=None,
                    help="append a result record to this JSON file")
    args = ap.parse_args()

    import os

    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var; a CPU
    # virtual-mesh run must force the platform through the config API
    # (same dance as __graft_entry__.dryrun_multichip / tests/conftest.py)
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.parallel.mesh import make_mesh
    from soc_project_stereo_matching_tpu.parallel.tiles import make_tiled_matcher

    ndev = len(jax.devices())
    opt = SGMOptions(max_disparity=args.max_disparity)
    rng = np.random.default_rng(0)
    h, w = args.height, args.width

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev]
    base_fps = None
    rows = []
    for n in sizes:
        if args.mode == "data":
            data, tile = n, 1
        else:
            data, tile = 1, n
        mesh = make_mesh(data=data, tile=tile, devices=jax.devices()[:n])
        matcher = make_tiled_matcher(opt, mesh, h, w, cross_tile=args.cross_tile)
        b = args.batch * data
        lefts = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
        rights = jnp.asarray(rng.integers(0, 256, (b, h, w), dtype=np.uint8))

        out = matcher(lefts, rights)
        _ = jax.device_get(out.ravel()[0])
        t0 = time.perf_counter()
        x = lefts
        for _ in range(args.iters):
            x = x ^ jnp.isfinite(matcher(x, rights)).astype(jnp.uint8)
        _ = jax.device_get(x.ravel()[0])
        dt = (time.perf_counter() - t0) / args.iters
        fps = b / dt
        if base_fps is None:
            base_fps = fps
        eff = fps / (base_fps * n)
        rows.append({"devices": n, "mesh": f"{data}x{tile}", "batch": b,
                     "ms_per_step": round(dt * 1e3, 2),
                     "fps": round(fps, 1),
                     "scaling_eff": round(eff, 4)})
        print(f"devices={n:2d} mesh=({data}x{tile}) batch={b:3d} "
              f"{dt * 1e3:8.2f} ms/step  {fps:8.1f} fps  "
              f"scaling-eff={eff:6.1%}")

    if args.json:
        platform = jax.default_backend()
        record = {
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            "platform": platform,
            # virtual CPU devices validate the sharded PROGRAM (compile +
            # collectives + bit-equal output); their wall-clock does not
            # measure ICI scaling — see PARITY.md's multi-chip disclosure
            "wall_clock_meaningful": platform == "tpu" and ndev > 1,
            "mode": args.mode, "cross_tile": args.cross_tile,
            "shape": {"batch_per_device": args.batch, "h": args.height,
                      "w": args.width, "d": args.max_disparity},
            "rows": rows,
        }
        prev = []
        if args.json.exists():
            prev = json.loads(args.json.read_text())
        prev.append(record)
        args.json.parent.mkdir(parents=True, exist_ok=True)
        args.json.write_text(json.dumps(prev, indent=2))
        print(f"appended to {args.json}")


if __name__ == "__main__":
    main()
