"""Depth conversion and evaluation metrics.

Semantics mirror the reference test platform exactly
(HostScript_Server/depth_image.py):

* ``depth = baseline * fx / (disp + doffs)`` in millimetres (:138-165);
* ground truth fuses left and right disparities — left NaNs/infs filled from
  the right depth map (:167-197);
* depth maps resize with nearest-neighbour (:59-87); disparity maps
  additionally scale values horizontally and preserve the NaN mask
  (:89-132);
* ``compare_img`` (:276-319): over pixels finite in both maps — RMSE (mm),
  BPR = frac(|err| > abs_thresh, default 10 mm), ME, B1m (>1000 mm), B1dm
  (>100 mm), n_valid.

Both a numpy implementation (bit-parity with the server) and a jit-able jnp
implementation (used by the batched harness) are provided.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.calib import StereoCalib


# ---------------------------------------------------------------------------
# Depth conversion (numpy, server-parity)
# ---------------------------------------------------------------------------

def disparity_to_depth(disp: np.ndarray, calib: StereoCalib, cam: int = 0) -> np.ndarray:
    """depth[mm] = baseline * fx / (disp + doffs).  NB: like the reference,
    +inf disparities (Middlebury invalid) produce depth 0.0 — preserved for
    metric parity."""
    fx = calib.fx0 if cam == 0 else calib.fx1
    with np.errstate(divide="ignore", invalid="ignore"):
        return (calib.baseline * fx / (disp + calib.doffs)).astype(np.float32)


def depth_to_disparity(depth: np.ndarray, calib: StereoCalib, cam: int = 0) -> np.ndarray:
    fx = calib.fx0 if cam == 0 else calib.fx1
    with np.errstate(divide="ignore", invalid="ignore"):
        return (calib.baseline * fx / depth - calib.doffs).astype(np.float32)


def fuse_depth(disp_left: np.ndarray, disp_right: np.ndarray,
               calib: StereoCalib) -> np.ndarray:
    """Left depth with non-finite pixels filled from the right camera."""
    depth = disparity_to_depth(disp_left, calib, 0)
    depth_r = disparity_to_depth(disp_right, calib, 1)
    fill = ~np.isfinite(depth) & np.isfinite(depth_r)
    depth = depth.copy()
    depth[fill] = depth_r[fill]
    return depth


def resize_depth_nearest(depth: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize (reference resize_depth_image)."""
    h, w = depth.shape[:2]
    if (w, h) == (width, height):
        return depth
    rows = (np.arange(height) * (h / height)).astype(np.int64)
    cols = (np.arange(width) * (w / width)).astype(np.int64)
    return depth[rows][:, cols]


def resize_disparity(disp: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resize with horizontal value rescaling and NaN-mask
    preservation (reference resize_disparity)."""
    h, w = disp.shape[:2]
    if (w, h) == (width, height):
        return disp
    out = resize_depth_nearest(disp, width, height) * np.float32(width / w)
    mask = resize_depth_nearest(np.isfinite(disp).astype(np.float32), width, height)
    out = out.copy()
    out[mask < 0.5] = np.nan
    return out


def ground_truth_depth(disp_left: np.ndarray, disp_right: np.ndarray,
                       calib: StereoCalib, width: int, height: int) -> np.ndarray:
    """Reference get_depth_image: fuse L/R then nearest-resize."""
    return resize_depth_nearest(fuse_depth(disp_left, disp_right, calib),
                                width, height)


# ---------------------------------------------------------------------------
# Metrics
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DepthMetrics:
    rmse: float       # mm, over valid pixels
    bpr: float        # frac(|err| > abs_thresh)
    n_valid: int
    me: float         # mean |err|
    b1m: float        # frac(|err| > 1000 mm)
    b1dm: float       # frac(|err| > 100 mm)

    def as_dict(self):
        return dataclasses.asdict(self)


def compare_depth(ground_truth: np.ndarray, test: np.ndarray,
                  abs_thresh: float = 10.0) -> DepthMetrics:
    """Numpy metrics, bit-parity with the server's compare_img."""
    valid = np.isfinite(test) & np.isfinite(ground_truth)
    n_valid = int(np.count_nonzero(valid))
    if n_valid == 0:
        return DepthMetrics(float("nan"), float("nan"), 0,
                            float("nan"), float("nan"), float("nan"))
    diff = test[valid] - ground_truth[valid]
    return DepthMetrics(
        rmse=float(np.sqrt(np.mean(np.square(diff)))),
        bpr=float(np.count_nonzero(np.abs(diff) > abs_thresh) / n_valid),
        n_valid=n_valid,
        me=float(np.mean(np.abs(diff))),
        b1m=float(np.count_nonzero(np.abs(diff) > 1000) / n_valid),
        b1dm=float(np.count_nonzero(np.abs(diff) > 100) / n_valid),
    )


@jax.jit
def compare_depth_jnp(ground_truth: jnp.ndarray, test: jnp.ndarray,
                      abs_thresh: float = 10.0):
    """jnp metrics for fused on-device evaluation.  Returns a dict of
    scalars; batched via vmap in the harness."""
    valid = jnp.isfinite(test) & jnp.isfinite(ground_truth)
    n = jnp.sum(valid)
    diff = jnp.where(valid, test - ground_truth, 0.0)
    adiff = jnp.abs(diff)
    denom = jnp.maximum(n, 1).astype(jnp.float32)
    return {
        "rmse": jnp.sqrt(jnp.sum(jnp.square(diff)) / denom),
        "bpr": jnp.sum(valid & (adiff > abs_thresh)) / denom,
        "n_valid": n,
        "me": jnp.sum(adiff) / denom,
        "b1m": jnp.sum(valid & (adiff > 1000.0)) / denom,
        "b1dm": jnp.sum(valid & (adiff > 100.0)) / denom,
    }


# ---------------------------------------------------------------------------
# Disparity-space metrics (Middlebury/KITTI-style, framework addition)
# ---------------------------------------------------------------------------

def compare_disparity(gt_disp: np.ndarray, test_disp: np.ndarray,
                      tau: float = 3.0) -> dict:
    """Bad-pixel rate in disparity space (KITTI D1: |err|>tau px), plus
    avg error and density.  The reference only scores in depth space; this
    is the standard stereo benchmark metric added for parity with public
    leaderboards."""
    gt_valid = np.isfinite(gt_disp) & (gt_disp > 0)
    est_valid = np.isfinite(test_disp)
    both = gt_valid & est_valid
    n = int(both.sum())
    if n == 0:
        return {"bad_tau": float("nan"), "avg_err": float("nan"),
                "density": 0.0, "n_valid": 0}
    err = np.abs(test_disp[both] - gt_disp[both])
    return {
        "bad_tau": float((err > tau).mean()),
        "avg_err": float(err.mean()),
        "density": float(est_valid[gt_valid].mean()),
        "n_valid": n,
    }
