"""Middlebury PFM disparity IO (pure numpy).

Mirrors the reference reader's semantics (HostScript_Server/depth_image.py:
13-53): the returned map is the stored float data multiplied by |scale|,
rows top-down.  PFM stores rows bottom-up; a negative scale marks
little-endian data.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Union

import numpy as np

PathLike = Union[str, Path]


def read_pfm(path: PathLike) -> np.ndarray:
    """Read a PFM file -> float32 (H, W) or (H, W, 3), rows top-down,
    values scaled by |scale| (reference behaviour)."""
    with open(path, "rb") as f:
        header = f.readline().decode("ascii").rstrip()
        if header not in ("PF", "Pf"):
            raise ValueError(f"{path}: not a PFM file (header {header!r})")
        channels = 3 if header == "PF" else 1

        dim_line = f.readline().decode("ascii")
        m = re.match(r"^\s*(\d+)\s+(\d+)\s*$", dim_line)
        if not m:
            raise ValueError(f"{path}: malformed PFM dimensions {dim_line!r}")
        width, height = int(m.group(1)), int(m.group(2))

        scale = float(f.readline().decode("ascii").rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.frombuffer(f.read(width * height * channels * 4),
                             dtype=endian + "f4")

    shape = (height, width) if channels == 1 else (height, width, channels)
    img = data.reshape(shape)[::-1]  # bottom-up storage -> top-down
    return np.ascontiguousarray(img.astype(np.float32)) * np.float32(abs(scale))


def write_pfm(path: PathLike, img: np.ndarray, scale: float = -1.0) -> None:
    """Write (H, W[, 3]) float32 as PFM (little-endian when scale < 0)."""
    img = np.asarray(img, dtype=np.float32)
    if img.ndim == 2:
        header = b"Pf"
    elif img.ndim == 3 and img.shape[2] == 3:
        header = b"PF"
    else:
        raise ValueError(f"unsupported PFM shape {img.shape}")
    h, w = img.shape[:2]
    data = img[::-1].astype("<f4" if scale < 0 else ">f4")
    with open(path, "wb") as f:
        f.write(header + b"\n")
        f.write(f"{w} {h}\n".encode("ascii"))
        f.write(f"{scale:.6g}\n".encode("ascii"))
        f.write(data.tobytes())
