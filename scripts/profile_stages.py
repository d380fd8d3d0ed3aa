"""Per-stage timing of the SGM pipeline on the current backend.

The axon TPU relay executes lazily: ``block_until_ready`` alone does not
guarantee device execution, so naive dispatch loops report fantasy numbers.
Honest methodology (used here and in bench.py): build a *dependency chain*
of N iterations (each iteration consumes the previous output) and fetch a
scalar from the final result — execution of every link is then forced and
wall-clock / N is a true per-iteration time.

On TPU the stages timed are the production Pallas kernels (the path
bench.py's headline runs); ``--jnp`` switches to the lax.scan/XLA ops.
Results are appended to results/stage_profile_<backend>.json so the
numbers live in the repo as an artifact.
"""

from __future__ import annotations

import argparse
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
from soc_project_stereo_matching_tpu.ops.aggregation import aggregate_paths
from soc_project_stereo_matching_tpu.ops.census import census_5x5
from soc_project_stereo_matching_tpu.ops.cost_volume import hamming_cost_volume
from soc_project_stereo_matching_tpu.ops.postprocess import (
    lr_check, median_filter_3x3, remove_speckles)
from soc_project_stereo_matching_tpu.ops.wta import (
    compute_disparity, finalize_disparity)

B, H, W = 8, 375, 450
OPT = SGMOptions()
D = OPT.max_disparity
ITERS = 10
RESULTS = {}


def timeit_chain(name, fn, x0, iters=ITERS):
    """fn: x -> x (same shape/dtype); times a dependency chain of `iters`."""
    x = fn(x0)
    _ = jax.device_get(jax.numpy.ravel(x)[0])  # warm-up + force
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn(x)
    _ = jax.device_get(jax.numpy.ravel(x)[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt * 1e3 / B:8.4f} ms/frame   {dt * 1e3:8.3f} ms/batch")
    RESULTS[name] = round(dt * 1e3 / B, 4)
    return dt


def main():
    from soc_project_stereo_matching_tpu.utils.relay import wait_for_backend

    wait_for_backend()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--jnp", action="store_true",
                    help="time the jnp/lax.scan ops instead of Pallas")
    args = ap.parse_args()
    use_pallas = not args.jnp and jax.default_backend() == "tpu"

    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    right = jnp.asarray(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    cost0 = jnp.asarray(rng.integers(0, 128, (B, H, D, W), dtype=np.uint8))
    aggr0 = jnp.asarray(rng.integers(0, 2040, (B, H, D, W), dtype=np.uint16))
    disp0 = jnp.asarray(rng.uniform(0, 64, (B, H, W)).astype(np.float32))
    speckle_input = "random"
    try:
        # The speckle stage's propagation round count is DATA-dependent
        # (random noise fragments into tiny fast-converging components;
        # real content has large snaking regions needing ~15 rounds on
        # cone) — feed it a real pre-speckle pipeline output so the stage
        # number reflects production convergence behaviour.
        import dataclasses

        from soc_project_stereo_matching_tpu.data.imageio import (
            load_image_gray_stb)

        base = "/root/reference/SemiGlobalMatching/Data/cone/"
        cl_, cr_ = (load_image_gray_stb(base + "im2.png"),
                    load_image_gray_stb(base + "im6.png"))
        if cl_.shape == (H, W):
            no_spk = dataclasses.replace(OPT, is_remove_speckles=False)
            disp0 = sgm_forward(
                jnp.asarray(np.broadcast_to(cl_, (B, H, W))),
                jnp.asarray(np.broadcast_to(cr_, (B, H, W))),
                no_spk, use_pallas=use_pallas)
            disp0.block_until_ready()
            speckle_input = "cone pre-speckle (real component structure)"
    except Exception as e:
        print(f"falling back to random speckle input: {e}")
    print(f"backend={jax.default_backend()} pallas={use_pallas} "
          f"B={B} H={H} W={W} D={D} iters={ITERS} "
          f"speckle_input={speckle_input}")

    if use_pallas:
        from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

        cc = jax.jit(lambda a, b: pk.census_cost_volume_pallas(
            a, b, OPT.min_disparity, OPT.max_disparity))
        # feedback must be a minimal slice: extracting a full d=0 plane
        # (the old feedback) costs a strided relayout of the uint8-tiled
        # volume that dwarfs the launch itself — harness cost, not kernel
        # cost (scripts/scan_variant_bench.py times the same launch with
        # the same minimal-slice style)
        timeit_chain("census+cost (fused)",
                     lambda x: x ^ (cc(x, right)[:, :1, :1, 0] & 1
                                    ).astype(x.dtype), left)

        aggr_fn = jax.jit(lambda c: pk.aggregate_paths(c, left, OPT))
        timeit_chain("aggregation (8 paths)",
                     lambda c: (aggr_fn(c) & 0x7F).astype(jnp.uint8), cost0)

        wta_both = jax.jit(lambda a: finalize_disparity(
            pk.wta_reduce_pallas(a, OPT, True)[0], OPT))
        timeit_chain(
            "WTA fwd+inv (fused)",
            lambda a: a ^ jnp.isfinite(wta_both(a)).astype(jnp.uint16)[..., None, :],
            aggr0)

        spk = jax.jit(lambda d: pk.remove_speckles_pallas(
            d, 1.0, OPT.min_speckle_area))
        timeit_chain(
            "speckle removal",
            lambda d: jnp.where(jnp.isfinite(spk(d)), disp0, disp0 + 1), disp0)

        lrp = jax.jit(lambda a, b: pk.lr_check_pallas(
            a, b, OPT.lrcheck_thres, max_shift=OPT.max_disparity))
        timeit_chain("LR check (pallas)", lambda d: lrp(d, disp0), disp0)
    else:
        census = jax.jit(jax.vmap(census_5x5))
        timeit_chain("census",
                     lambda x: (census(x) & 0xFF).astype(jnp.uint8), left)

        cost_fn = jax.jit(jax.vmap(lambda a, b: hamming_cost_volume(
            a, b, OPT.min_disparity, OPT.max_disparity)))
        cl, cr = census(left), census(right)
        timeit_chain(
            "cost volume",
            lambda x: cost_fn(
                x.astype(jnp.uint32) << 16 | cl[..., :1].astype(jnp.uint32),
                cr)[..., 0, :],
            (cl & 0xFF).astype(jnp.uint8).astype(jnp.uint32)[..., :],
        )

        aggr_fn = jax.jit(jax.vmap(lambda c, i: aggregate_paths(c, i, OPT)))
        timeit_chain(
            "aggregation (8 paths)",
            lambda c: (aggr_fn(c, left) & 0x7F).astype(jnp.uint8), cost0)

        wta_fwd = jax.jit(jax.vmap(
            lambda a: compute_disparity(a, OPT, inverse=False)))
        timeit_chain(
            "WTA fwd",
            lambda a: a ^ jnp.isfinite(wta_fwd(a)).astype(jnp.uint16)[..., None, :],
            aggr0)
        wta_inv = jax.jit(jax.vmap(
            lambda a: compute_disparity(a, OPT, inverse=True)))
        timeit_chain(
            "WTA inverse",
            lambda a: a ^ jnp.isfinite(wta_inv(a)).astype(jnp.uint16)[..., None, :],
            aggr0)

        spk = jax.jit(jax.vmap(
            lambda d: remove_speckles(d, 1.0, OPT.min_speckle_area)))
        timeit_chain(
            "speckle removal",
            lambda d: jnp.where(jnp.isfinite(spk(d)), disp0, disp0 + 1), disp0)

    lr_fn = jax.jit(jax.vmap(lambda a, b: lr_check(
        a, b, OPT.lrcheck_thres, max_shift=OPT.max_disparity)))
    timeit_chain("LR check", lambda d: lr_fn(d, disp0), disp0)

    med = jax.jit(jax.vmap(median_filter_3x3))
    timeit_chain("median 3x3", med, disp0)

    full = jax.jit(lambda l, r: sgm_forward(l, r, OPT,
                                            use_pallas=use_pallas))
    timeit_chain(
        "FULL pipeline",
        lambda x: left ^ jnp.isfinite(full(x, right)).astype(jnp.uint8), left)

    out = (Path(__file__).resolve().parents[1] / "results" /
           f"stage_profile_{jax.default_backend()}.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps({
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": jax.default_backend(), "pallas": use_pallas,
        "batch": B, "height": H, "width": W, "max_disparity": D,
        "speckle_input": speckle_input,
        "ms_per_frame": RESULTS}, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
