"""Attribute the XLA volume transposes around horizontal_partial.

The aggregation stage (66% of the frame) includes two full-volume XLA
transposes that no artifact had attributed (VERDICT r4 weak#1a):

    cost8 (B,H,D,W) int8   -> (B,W,D,H)   in  (~10.4 MB/frame at cone)
    part_h (B,W,D,H) uint16 -> (B,H,D,W)  out (~20.7 MB/frame)

Variants (all on the real chip, RTT-cancelling two-length chains,
min-of-repeats, B=8 cone geometry):

  full           aggregate_paths_wta (headline aggregation+WTA path)
  xin8           standalone int8 volume transpose (per direction)
  xout16         standalone uint16 volume transpose (per direction)
  hpart          horizontal_partial as shipped (transpose in + 2 scans +
                 transpose out)
  hpart_not      the same two scan launches on a pre-transposed volume,
                 output left transposed — hpart minus hpart_not is the
                 IN-CONTEXT cost of both transposes
  ktrans16       in-kernel Pallas transpose of the uint16 volume
                 (jnp.swapaxes on VMEM blocks) — is a hand transpose
                 kernel viable / faster than XLA?
  mxutrans16     in-kernel MXU transpose (eye contraction, f32 exact for
                 uint16 sums <= 2040) of the same volume

The last two only run if they survive the TPU lowering + Mosaic compile;
compile failures are recorded per-variant, not fatal (the r4 A/B-harness
convention).  Writes results/aggr_transpose_probe.json.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

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

    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", "/tmp/soc_sgm_jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.data.imageio import (
        load_image_gray_stb)
    from soc_project_stereo_matching_tpu.ops import pallas_kernels as pk

    opt = SGMOptions()
    base = "/root/reference/SemiGlobalMatching/Data/cone/"
    left = load_image_gray_stb(base + "im2.png")
    right = load_image_gray_stb(base + "im6.png")
    lefts = jnp.asarray(np.broadcast_to(left, (B, H, W)))
    rights = jnp.asarray(np.broadcast_to(right, (B, H, W)))
    cost = pk.census_cost_volume_pallas(lefts, rights, 0, D)
    cost8 = jax.jit(lambda c: c.astype(jnp.int8))(cost)
    cost8_t = jax.jit(lambda c: c.transpose(0, 3, 2, 1))(cost8)
    img = jax.jit(lambda x: x.astype(jnp.int32))(lefts)
    img_d = jax.device_get(img)

    def delta_time(step, x0, iters=ITERS, repeats=REPEATS):
        """Seconds per step: (iters+1)-chain minus 1-chain, min-of-repeats —
        the relay RTT and fixed dispatch overhead cancel in the diff."""

        @jax.jit
        def chain(x, n):
            return jax.lax.fori_loop(0, n, lambda _, c: step(c), x)

        def timed(n):
            best = float("inf")
            nn = jnp.int32(n)
            r = chain(x0, nn)                       # warm-up/compile
            jax.device_get(jnp.ravel(r)[0])
            for _ in range(repeats):
                t0 = time.perf_counter()
                r = chain(x0, nn)
                jax.device_get(jnp.ravel(r)[0])
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(iters + 1) - timed(1)) / iters

    results = {}

    def record(name, fn):
        try:
            s = fn()
        except Exception as e:  # compile failures recorded, not fatal
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            log(f"{name:12s} FAILED: {e}")
            return
        results[name] = {"ms_per_frame": round(s * 1e3 / B, 4)}
        log(f"{name:12s} {s * 1e3 / B:7.4f} ms/frame")

    # -- full aggregation+WTA ---------------------------------------------
    def full_step(c8):
        fwd, inv = pk.aggregate_paths_wta(
            (c8 & 0x7F).astype(jnp.uint8), img.astype(jnp.uint8), opt)
        return c8 ^ (fwd.best_idx[:, :, None, :] & 1).astype(jnp.int8)

    record("full", lambda: delta_time(full_step, cost8))

    # -- standalone XLA transposes (two per step, barrier-separated so the
    #    algebraic simplifier cannot fold them into identity) -------------
    def xpose_pair(c):
        t = jax.lax.optimization_barrier(c.transpose(0, 3, 2, 1))
        return t.transpose(0, 3, 2, 1) ^ 1

    record("xin8", lambda: delta_time(xpose_pair, cost8) / 2)
    u16 = jax.jit(lambda c: (c & 0x7F).astype(jnp.uint16) * 9)(cost8)
    record("xout16", lambda: delta_time(xpose_pair, u16) / 2)

    # -- horizontal_partial with and without the transposes ---------------
    def hpart_step(c8):
        ph = pk.horizontal_partial((c8 & 0x7F).astype(jnp.int8), img,
                                   opt.p1, opt.p2_init, False)
        return c8 ^ (ph & 1).astype(jnp.int8)

    record("hpart", lambda: delta_time(hpart_step, cost8))

    def hpart_not_step(c8t):
        ct = (c8t & 0x7F).astype(jnp.int8)
        img_t = img.transpose(0, 2, 1)
        p2_hf = pk._p2_planes(img_t, (0,), +1, opt.p1, opt.p2_init)
        p2_hb = pk._p2_planes(img_t, (0,), -1, opt.p1, opt.p2_init)
        br = pk._plain_block_rows(D, H, 32)
        wp = pk._round_up(W, br)
        pad = ((0, 0), (0, wp - W), (0, 0), (0, 0))
        part = pk._directional_scan_group(
            jnp.pad(ct, pad), jnp.pad(p2_hf, pad), None, (0,), False,
            opt.p1, False, br)
        part = pk._directional_scan_group(
            jnp.pad(ct, pad), jnp.pad(p2_hb, pad), part, (0,), True,
            opt.p1, False, br)[:, :W]
        return c8t ^ (part & 1).astype(jnp.int8)

    record("hpart_not", lambda: delta_time(hpart_not_step, cost8_t))

    # -- in-kernel transpose kernels --------------------------------------
    # (B, W, D, H) uint16 -> (B, H, D, W): grid over (batch, W-chunks); each
    # step reads a (rows_w, D, H) block and writes the (H, D, rows_w) block
    # of the output at the same W offset.
    ROWS_W = 30                 # divides 450; (30, 64, 384) u16 = 1.4 MB

    hp = pk._round_up(H, 8)

    def make_ktrans(body):
        def kern(x_ref, o_ref):
            body(x_ref, o_ref)

        def run(xt):
            return pl.pallas_call(
                kern,
                grid=(B, W // ROWS_W),
                in_specs=[pl.BlockSpec((1, ROWS_W, D, hp),
                                       lambda bi, ci: (bi, ci, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, hp, D, ROWS_W),
                                       lambda bi, ci: (bi, 0, 0, ci),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, hp, D, W), jnp.uint16),
                compiler_params=pk._VMEM_PARAMS,
            )(xt)

        return run

    def swap_body(x_ref, o_ref):
        x = x_ref[0]                                   # (ROWS_W, D, hp)
        o_ref[0] = jnp.transpose(x, (2, 1, 0))

    def mxu_body(x_ref, o_ref):
        eye = (jax.lax.broadcasted_iota(jnp.int32, (ROWS_W, ROWS_W), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (ROWS_W, ROWS_W), 1)
               ).astype(jnp.float32)
        for d0 in range(0, D, 8):
            x = x_ref[0, :, d0:d0 + 8, :].astype(jnp.float32)  # (R, 8, hp)
            # out[h, 8, R] = sum_r eye[r, R] * x[r, 8, h]
            t = jax.lax.dot_general(
                x, eye, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)     # (8, hp, R)
            o_ref[0, :, d0:d0 + 8, :] = jnp.transpose(
                t, (1, 0, 2)).astype(jnp.uint16)

    u16_t = jax.jit(lambda c: c.transpose(0, 3, 2, 1))(u16)
    u16_tp = jnp.pad(u16_t, ((0, 0), (0, 0), (0, 0), (0, hp - H)))

    for name, body in (("ktrans16", swap_body), ("mxutrans16", mxu_body)):
        run = make_ktrans(body)

        def check_and_time(run=run):
            out = jax.jit(run)(u16_tp)
            ref = u16_tp.transpose(0, 3, 2, 1)
            np.testing.assert_array_equal(jax.device_get(out),
                                          jax.device_get(ref))

            def step(xt):
                o = run(xt)
                return xt ^ (o & 1).transpose(0, 3, 2, 1).astype(jnp.uint16)

            # the back-transpose inside the chain is XLA; subtract xout16
            return delta_time(step, u16_tp)

        record(name, check_and_time)
        if name in results and "ms_per_frame" in results[name] \
                and "ms_per_frame" in results.get("xout16", {}):
            results[name]["ms_per_frame_minus_xla_back"] = round(
                results[name]["ms_per_frame"]
                - results["xout16"]["ms_per_frame"], 4)

    conclusion = None
    if all("ms_per_frame" in results.get(k, {})
           for k in ("xin8", "xout16", "hpart", "hpart_not")):
        standalone = results["xin8"]["ms_per_frame"] \
            + results["xout16"]["ms_per_frame"]
        in_ctx = results["hpart"]["ms_per_frame"] \
            - results["hpart_not"]["ms_per_frame"]
        conclusion = (
            f"both transposes cost {standalone:.4f} ms/frame standalone and "
            f"{in_ctx:+.4f} ms/frame in context (hpart - hpart_not; negative"
            " = noise) — negligible vs the ~1.4-1.7 ms stage; elimination "
            "not warranted, the stage cost is the recurrence itself "
            "(see results/recurrence_floor.json)")

    out = REPO / "results" / "aggr_transpose_probe.json"
    doc = {
        "conclusion": conclusion,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "backend": "tpu",
        "batch": B, "height": H, "width": W, "d": D,
        "iters": ITERS, "repeats": REPEATS,
        "note": "xin8/xout16 = one XLA volume transpose each; hpart - "
                "hpart_not = in-context cost of both transposes around "
                "horizontal_partial; ktrans/mxutrans chain includes one "
                "XLA back-transpose (see _minus_xla_back)",
        "variants": results,
    }
    out.write_text(json.dumps(doc, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
