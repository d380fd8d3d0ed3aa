"""In-pipeline stage attribution by ablation (chained honest timing).

The per-launch numbers in ``profile_stages.py`` carry fixed dispatch
overhead that the fused pipeline amortises (their sum is ~2x the full
pipeline time), so they cannot rank in-pipeline optimisation targets.
This script times the FULL fused pipeline with individual post-stages
toggled off via ``SGMOptions`` and reports the deltas — the true
marginal cost of each stage inside the compiled program.

Reference stage semantics: ``SemiGlobalMatching.c:68-125`` (SGM_Match
calls census/cost/aggregate/WTA/LR/speckle/median in sequence).

Writes results/ablation_profile.json.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from soc_project_stereo_matching_tpu import SGMOptions
from soc_project_stereo_matching_tpu.models.sgm import sgm_forward

B, H, W = 8, 375, 450
ITERS = 12


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()
    use_pallas = jax.default_backend() == "tpu"

    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)

    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    left = load_image_gray_stb(base + "im2.png")
    right = load_image_gray_stb(base + "im6.png")
    lefts = jnp.asarray(np.broadcast_to(left, (B, H, W)))
    rights = jnp.asarray(np.broadcast_to(right, (B, H, W)))

    opt = SGMOptions()
    variants = {
        "full": opt,
        "no_speckle": dataclasses.replace(opt, is_remove_speckles=False),
        "no_lr": dataclasses.replace(opt, is_check_lr=False),
        "no_lr_no_speckle": dataclasses.replace(
            opt, is_check_lr=False, is_remove_speckles=False),
        "no_unique": dataclasses.replace(opt, is_check_unique=False),
    }

    results = {}
    spreads = {}
    for name, o in variants.items():
        fn = jax.jit(lambda l, o=o: sgm_forward(l, rights, o,
                                                use_pallas=use_pallas))
        chain = lambda x, fn=fn: lefts ^ jnp.isfinite(fn(x)).astype(jnp.uint8)
        t0 = time.perf_counter()
        x = chain(lefts)
        _ = jax.device_get(jnp.ravel(x)[0])
        compile_s = time.perf_counter() - t0
        samples = []
        for _ in range(3):                      # min-of-repeats: relay RTT
            t0 = time.perf_counter()
            x = lefts
            for _ in range(ITERS):
                x = chain(x)
            _ = jax.device_get(jnp.ravel(x)[0])
            samples.append((time.perf_counter() - t0) / ITERS / B * 1e3)
        best = min(samples)
        results[name] = round(best, 4)
        spreads[name] = round(max(samples) - best, 4)
        print(f"{name:18s} {best:7.4f} ms/frame  spread {spreads[name]:.4f}"
              f"   (compile+first {compile_s:.1f}s)", file=sys.stderr)

    deltas = {
        "speckle_in_pipeline": round(results["full"] - results["no_speckle"], 4),
        "lr_plus_inverse_wta": round(results["full"] - results["no_lr"], 4),
        "uniqueness": round(results["full"] - results["no_unique"], 4),
    }
    out = Path(__file__).resolve().parents[1] / "results" / "ablation_profile.json"
    noise = max(spreads.values())
    out.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(), "pallas": use_pallas,
        "batch": B, "height": H, "width": W,
        "ms_per_frame": results, "repeat_spread_ms": spreads,
        "noise_floor_ms": round(noise, 4),
        "note": "deltas smaller than noise_floor_ms (max spread across the "
                "3 repeats of any variant) are indistinguishable from "
                "measurement noise — negative small deltas are noise, not "
                "negative stage costs",
        "deltas_ms": deltas}, indent=2))
    print(json.dumps(deltas), file=sys.stderr)
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
