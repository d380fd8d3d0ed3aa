"""Dataset layout conversion utilities.

``to_middlebury2014`` rewrites any supported pair into the Middlebury-2014
layout the reference test platform expects (im0/im1.png, disp0/disp1.pfm,
calib.txt) — used to feed the *unmodified* reference server with the PNG
pairs shipped in the reference repo, and to prepare data/all folders.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image

from .datasets import StereoPair, load_pair
from .pfm import write_pfm

PathLike = Union[str, Path]


def to_middlebury2014(src: PathLike, dst: PathLike) -> Path:
    pair = load_pair(src)
    return pair_to_middlebury2014(pair, dst)


def pair_to_middlebury2014(pair: StereoPair, dst: PathLike) -> Path:
    dst = Path(dst)
    dst.mkdir(parents=True, exist_ok=True)
    Image.fromarray(pair.rgb_left).save(dst / "im0.png")
    Image.fromarray(pair.rgb_right).save(dst / "im1.png")

    def to_pfm(name, disp):
        if disp is None:
            disp = np.full(pair.img_left.shape, np.inf, dtype=np.float32)
        # Middlebury 2014 marks unknown disparity as +inf
        out = np.where(np.isfinite(disp), disp, np.inf).astype(np.float32)
        write_pfm(dst / name, out)

    to_pfm("disp0.pfm", pair.gt_disp_left)
    to_pfm("disp1.pfm", pair.gt_disp_right)
    calib = pair.calib
    text = calib.to_text() + f"ndisp={pair.dmax}\n"
    (dst / "calib.txt").write_text(text)
    return dst
