"""Stereo calibration: Middlebury calib.txt parsing, rescaling and the
80-byte wire format.

Mirrors HostScript_Server/stereo_calibration.py: key=value parsing with
``[a b c; d e f; g h i]`` matrices (:10-38, :88-144), proportional intrinsic
scaling with horizontal doffs scaling (:146-174), and the binary layout of
20 little-endian floats — cam0 (9), cam1 (9), doffs, baseline (:177-195).
"""

from __future__ import annotations

import dataclasses
import re
import struct
from pathlib import Path
from typing import Union

import numpy as np

PathLike = Union[str, Path]

WIRE_FORMAT = "<20f"
WIRE_SIZE = struct.calcsize(WIRE_FORMAT)  # 80 bytes


def _parse_matrix(text: str) -> np.ndarray:
    inner = text.strip().lstrip("[").rstrip("]")
    rows = [r.strip() for r in inner.split(";") if r.strip()]
    mat = [[float(x) for x in re.split(r"[,\s]+", r) if x] for r in rows]
    return np.array(mat, dtype=np.float32)


@dataclasses.dataclass
class StereoCalib:
    """Intrinsics + stereo geometry.  depth = baseline * fx / (disp + doffs)."""

    width: int
    height: int
    cam0: np.ndarray  # 3x3 float32
    cam1: np.ndarray  # 3x3 float32
    doffs: float
    baseline: float

    @classmethod
    def from_file(cls, path: PathLike) -> "StereoCalib":
        data = {}
        for line in Path(path).read_text(encoding="utf-8").splitlines():
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, val = (s.strip() for s in line.split("=", 1))
            if val.startswith("[") and val.endswith("]"):
                data[key] = _parse_matrix(val)
            elif re.fullmatch(r"-?\d+", val):
                data[key] = int(val)
            else:
                try:
                    data[key] = float(val)
                except ValueError:
                    data[key] = val
        missing = {"width", "height", "cam0", "cam1", "doffs", "baseline"} - set(data)
        if missing:
            raise ValueError(f"{path}: calib missing {sorted(missing)}")
        return cls(width=data["width"], height=data["height"],
                   cam0=data["cam0"], cam1=data["cam1"],
                   doffs=float(data["doffs"]), baseline=float(data["baseline"]))

    @property
    def fx0(self) -> float:
        return float(self.cam0[0, 0])

    @property
    def fx1(self) -> float:
        return float(self.cam1[0, 0])

    def scaled(self, width: int, height: int) -> "StereoCalib":
        """Calibration rescaled to a new resolution (fx/cx by sx, fy/cy by
        sy, doffs by sx) — reference scale_calib semantics, non-mutating."""
        sx = width / self.width
        sy = height / self.height
        def scale_cam(cam):
            cam = cam.copy()
            cam[0, 0] *= sx
            cam[1, 1] *= sy
            cam[0, 2] *= sx
            cam[1, 2] *= sy
            return cam
        return StereoCalib(
            width=int(self.width * sx), height=int(self.height * sy),
            cam0=scale_cam(self.cam0), cam1=scale_cam(self.cam1),
            doffs=self.doffs * sx, baseline=self.baseline,
        )

    def pack(self) -> bytes:
        """80-byte wire format: cam0(9f) + cam1(9f) + doffs + baseline, LE."""
        vals = (self.cam0.flatten().tolist() + self.cam1.flatten().tolist()
                + [self.doffs, self.baseline])
        return struct.pack(WIRE_FORMAT, *vals)

    @classmethod
    def unpack(cls, blob: bytes, width: int = 0, height: int = 0) -> "StereoCalib":
        vals = struct.unpack(WIRE_FORMAT, blob)
        return cls(width=width, height=height,
                   cam0=np.array(vals[0:9], dtype=np.float32).reshape(3, 3),
                   cam1=np.array(vals[9:18], dtype=np.float32).reshape(3, 3),
                   doffs=float(vals[18]), baseline=float(vals[19]))

    def to_text(self) -> str:
        def fmt(cam):
            return "[" + "; ".join(" ".join(f"{v:g}" for v in row) for row in cam) + "]"
        return (f"cam0={fmt(self.cam0)}\ncam1={fmt(self.cam1)}\n"
                f"doffs={self.doffs:g}\nbaseline={self.baseline:g}\n"
                f"width={self.width}\nheight={self.height}\n")
