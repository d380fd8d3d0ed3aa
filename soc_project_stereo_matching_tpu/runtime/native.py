"""Python interface to the native host-runtime ops (_native.c).

Builds the extension on demand (gcc -O3) and caches the .so next to the
source; every op has a pure-numpy fallback so the framework works without a
compiler.  ``HAVE_NATIVE`` tells you which path is active.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sysconfig
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "_native.c"
_LOCK = threading.Lock()
_mod = None
_build_error: Optional[str] = None


def _load():
    global _mod, _build_error
    if _mod is not None or _build_error is not None:
        return _mod
    with _LOCK:
        if _mod is not None or _build_error is not None:
            return _mod
        suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
        so = _DIR / f"_native{suffix}"
        try:
            if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
                include = sysconfig.get_paths()["include"]
                cmd = ["gcc", "-O3", "-shared", "-fPIC", f"-I{include}",
                       str(_SRC), "-o", str(so)]
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            spec = importlib.util.spec_from_file_location(
                "soc_project_stereo_matching_tpu.runtime._native", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _mod = mod
        except Exception as e:  # pragma: no cover - compiler missing
            _build_error = str(e)
    return _mod


def have_native() -> bool:
    return _load() is not None


def gray_from_bgr_planes(planes: np.ndarray, wr: int = 76, wg: int = 150,
                         wb: int = 29) -> np.ndarray:
    """(3, H, W) uint8 planar BGR -> (H, W) uint8 fixed-point luma.

    Default weights are the ZedBoard firmware's (stereo_matching.c:19-25);
    use (77, 150, 29) for stb parity."""
    planes = np.ascontiguousarray(planes, dtype=np.uint8)
    if planes.ndim != 3 or planes.shape[0] != 3:
        # an (H, W, 3) interleaved image would silently reinterpret as
        # (H=W, W=3) planes and return structurally wrong luma
        raise ValueError(f"expected planar (3, H, W) BGR, got {planes.shape}")
    _c, h, w = planes.shape
    mod = _load()
    out = np.empty((h, w), dtype=np.uint8)
    if mod is not None:
        mod.gray_from_bgr_planes(planes, h, w, wr, wg, wb, out)
        return out
    b, g, r = (planes[i].astype(np.uint32) for i in range(3))
    return ((wr * r + wg * g + wb * b) >> 8).astype(np.uint8)


def median3x3_inplace(disp: np.ndarray) -> np.ndarray:
    """Reference-exact sequential in-place median; returns a filtered copy."""
    out = np.ascontiguousarray(disp, dtype=np.float32).copy()
    mod = _load()
    h, w = out.shape
    if mod is not None:
        mod.median3x3_inplace(out, h, w)
        return out
    from .. import oracle
    return oracle.median_filter_3x3(out, inplace=True)


def speckle_filter(disp: np.ndarray, diff: float = 1.0,
                   min_area: int = 50) -> np.ndarray:
    """Reference-exact BFS speckle removal; returns a filtered copy."""
    out = np.ascontiguousarray(disp, dtype=np.float32).copy()
    mod = _load()
    h, w = out.shape
    if mod is not None:
        mod.speckle_filter(out, h, w, float(diff), int(min_area))
        return out
    from .. import oracle
    return oracle.remove_speckles(out, diff, min_area)
