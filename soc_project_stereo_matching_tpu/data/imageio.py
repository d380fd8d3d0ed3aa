"""Image loading / conversion with reference-compatible semantics.

The reference loads PNGs two ways:
  * the C CLI uses stb_image with forced 1-channel output, whose RGB->gray
    conversion is ``(77 R + 150 G + 29 B) >> 8`` (stb_image.h,
    ``stbi__compute_y``);
  * the ZedBoard firmware converts BGR planes with ``(76 R + 150 G + 29 B)
    >> 8`` (ZedBoard/Vitis/lwip_tcp_perf_client/src/stereo_matching.c:13-32).

Both fixed-point variants are provided; golden parity uses the stb one.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import numpy as np
from PIL import Image

PathLike = Union[str, Path]


def rgb_to_gray_stb(rgb: np.ndarray) -> np.ndarray:
    """stb_image's fixed-point luma: (77R + 150G + 29B) >> 8."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((77 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def rgb_to_gray_device(rgb: np.ndarray) -> np.ndarray:
    """The ZedBoard firmware's luma: (76R + 150G + 29B) >> 8."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((76 * r + 150 * g + 29 * b) >> 8).astype(np.uint8)


def load_image_rgb(path: PathLike) -> np.ndarray:
    """Load any image as (H, W, 3) uint8 RGB."""
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def load_image_gray_stb(path: PathLike) -> np.ndarray:
    """Load an image exactly as the reference CLI does (stb grayscale).

    Gray-scale sources pass through untouched, colour sources go through the
    stb fixed-point conversion.
    """
    img = Image.open(path)
    if img.mode in ("L", "I;16", "I"):
        return np.asarray(img.convert("L"), dtype=np.uint8)
    return rgb_to_gray_stb(np.asarray(img.convert("RGB"), dtype=np.uint8))


def save_disparity_png(path: PathLike, disparity: np.ndarray) -> Tuple[float, float]:
    """Min/max-normalise a float disparity map to uint8 and save it,
    mirroring the reference CLI output (main.c:90-120).  Invalid (non-finite)
    pixels map to 0.  Returns (min, max) used."""
    disp = np.asarray(disparity, dtype=np.float32)
    finite = np.isfinite(disp)
    if finite.any():
        lo = float(disp[finite].min())
        hi = float(disp[finite].max())
    else:
        lo, hi = 0.0, 0.0
    rng = (hi - lo) if hi != lo else 1.0
    out = np.zeros(disp.shape, dtype=np.uint8)
    scaled = np.clip((disp - lo) / rng * 255.0, 0.0, 255.0)
    out[finite] = scaled[finite].astype(np.uint8)
    Image.fromarray(out, mode="L").save(path)
    return lo, hi


def save_depth_png16(path: PathLike, depth: np.ndarray,
                     min_depth: float = None,
                     max_depth: float = None) -> Tuple[float, float]:
    """Save a depth map as a normalised 16-bit grayscale PNG.

    Reference semantics (HostScript_Server/depth_image.py:231-269
    ``convert_and_save_depth_image``): with explicit ``min_depth``/
    ``max_depth`` the map is clipped then scaled to [0, 65535]; otherwise
    auto-normalised by nanmin/nanmax; NaN/inf pixels map to 0; values are
    rounded to uint16.  Returns the depth map's (nanmin, nanmax) like the
    reference does."""
    depth = np.asarray(depth, dtype=np.float64)
    if min_depth is not None and max_depth is not None:
        scaled = np.clip(depth, min_depth, max_depth)
        scaled = (scaled - min_depth) / (max_depth - min_depth) * 65535.0
    elif np.any(np.isfinite(depth)):
        with np.errstate(invalid="ignore"):
            lo, hi = np.nanmin(depth), np.nanmax(depth)
        scaled = (depth - lo) / ((hi - lo) or 1.0) * 65535.0
    else:
        scaled = np.zeros_like(depth)
    scaled = np.nan_to_num(scaled, nan=0.0, posinf=0.0, neginf=0.0)
    out = np.round(scaled).astype(np.uint16)
    Image.fromarray(out).save(path)  # uint16 -> 16-bit grayscale PNG
    with np.errstate(invalid="ignore"):
        return (float(np.nanmin(depth)) if np.any(np.isfinite(depth)) else float("nan"),
                float(np.nanmax(depth)) if np.any(np.isfinite(depth)) else float("nan"))


def load_depth_png16(path: PathLike) -> np.ndarray:
    """Load a 16-bit grayscale PNG as uint16 (round-trip of
    ``save_depth_png16``'s quantised values)."""
    img = Image.open(path)
    return np.asarray(img, dtype=np.uint16)


def resize_image(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Resize mirroring the host platform (stereo_image.py:4-34):
    area-average for downscale, bilinear for upscale."""
    h, w = img.shape[:2]
    if (w, h) == (width, height):
        return img
    import cv2  # lazily: only the eval platform path needs it

    interp = cv2.INTER_AREA if (width < w or height < h) else cv2.INTER_LINEAR
    return cv2.resize(img, (width, height), interpolation=interp)
