"""Dataset discovery and loading.

The reference test platform walks a base folder and treats every directory
containing ``calib.txt`` as a test pair (server.py:82-95) in Middlebury-2014
layout (im0/im1.png, disp0/disp1.pfm, calib.txt).  The reference repo itself
ships Middlebury 2003/2005/2006-style pairs (im2/im6 or view1/view5 PNGs,
uint8 disparity PNGs scaled by 2 or 4, drange.txt) under
SemiGlobalMatching/Data/ — both layouts are supported here.
"""

from __future__ import annotations

import dataclasses
import os
import re
from pathlib import Path
from typing import List, Optional, Union

import numpy as np

from .calib import StereoCalib
from .imageio import load_image_gray_stb, load_image_rgb
from .pfm import read_pfm

PathLike = Union[str, Path]


@dataclasses.dataclass
class StereoPair:
    """One evaluation sample: grayscale pair + ground-truth disparities."""

    name: str
    img_left: np.ndarray            # uint8 (H, W), stb-luma grayscale
    img_right: np.ndarray           # uint8 (H, W)
    gt_disp_left: np.ndarray        # float32 (H, W); NaN/inf = unknown
    gt_disp_right: Optional[np.ndarray]
    calib: StereoCalib
    dmin: int = 0
    dmax: int = 64
    rgb_left: Optional[np.ndarray] = None   # (H, W, 3) when available
    rgb_right: Optional[np.ndarray] = None

    @property
    def shape(self):
        return self.img_left.shape


def discover_datasets(base: PathLike) -> List[Path]:
    """Every directory under `base` containing calib.txt (server.py:82-95)."""
    found = []
    for dirpath, _dirnames, filenames in os.walk(base):
        if "calib.txt" in filenames:
            found.append(Path(dirpath))
    return sorted(found)


def _detect_gt_scale(gt_png: np.ndarray, dmax: int) -> int:
    """Middlebury PNG ground truths store disparity * {1,2,4} depending on
    downsampling generation; pick the smallest scale consistent with the
    declared range."""
    top = int(gt_png.max())
    for scale in (1, 2, 4, 8):
        if top / scale < dmax:
            return scale
    return 1


def _read_drange(path: Path) -> tuple:
    dmin, dmax = 0, 64
    if path.exists():
        for line in path.read_text().split():
            m = re.match(r"dmin=(\d+)", line)
            if m:
                dmin = int(m.group(1))
            m = re.match(r"dmax=(\d+)", line)
            if m:
                dmax = int(m.group(1))
    return dmin, dmax


def synthetic_calib(width: int, height: int, fx: float = 1000.0,
                    baseline: float = 100.0, doffs: float = 0.0) -> StereoCalib:
    """Calibration for datasets that ship no calib.txt (the reference repo's
    own PNG pairs).  depth = fx * baseline / (disp + doffs) mm."""
    cam = np.array([[fx, 0, width / 2], [0, fx, height / 2], [0, 0, 1]],
                   dtype=np.float32)
    return StereoCalib(width=width, height=height, cam0=cam, cam1=cam.copy(),
                       doffs=doffs, baseline=baseline)


def load_pair_legacy_png(folder: PathLike) -> StereoPair:
    """Middlebury 2003/2005/2006-style folder: {im2,im6|view1,view5}.png +
    uint8 disparity PNGs + drange.txt (the reference Data/ layout)."""
    folder = Path(folder)
    if (folder / "im2.png").exists():
        lf, rf, dl, dr = "im2.png", "im6.png", "disp2.png", "disp6.png"
    elif (folder / "view1.png").exists():
        lf, rf, dl, dr = "view1.png", "view5.png", "disp1.png", "disp5.png"
    else:
        raise FileNotFoundError(f"{folder}: no recognised stereo pair")

    left = load_image_gray_stb(folder / lf)
    right = load_image_gray_stb(folder / rf)
    dmin, dmax = _read_drange(folder / "drange.txt")

    def gt(path: Path) -> Optional[np.ndarray]:
        if not path.exists():
            return None
        from PIL import Image
        raw = np.asarray(Image.open(path).convert("L"), dtype=np.float32)
        scale = _detect_gt_scale(raw, dmax)
        out = raw / scale
        out[raw == 0] = np.nan  # 0 = unknown in Middlebury PNG ground truth
        return out

    h, w = left.shape
    return StereoPair(
        name=folder.name,
        img_left=left, img_right=right,
        gt_disp_left=gt(folder / dl), gt_disp_right=gt(folder / dr),
        calib=synthetic_calib(w, h),
        dmin=dmin, dmax=dmax,
        rgb_left=load_image_rgb(folder / lf),
        rgb_right=load_image_rgb(folder / rf),
    )


def load_pair_2014(folder: PathLike) -> StereoPair:
    """Middlebury-2014 layout folder: im0/im1.png, disp0/disp1.pfm,
    calib.txt (the layout the reference server streams)."""
    folder = Path(folder)
    calib = StereoCalib.from_file(folder / "calib.txt")
    left = load_image_gray_stb(folder / "im0.png")
    right = load_image_gray_stb(folder / "im1.png")
    gt_l = read_pfm(folder / "disp0.pfm") if (folder / "disp0.pfm").exists() else None
    gt_r = read_pfm(folder / "disp1.pfm") if (folder / "disp1.pfm").exists() else None
    ndisp = 256
    for line in (folder / "calib.txt").read_text().splitlines():
        m = re.match(r"\s*ndisp\s*=\s*(\d+)", line)
        if m:
            ndisp = int(m.group(1))
    return StereoPair(
        name=folder.name, img_left=left, img_right=right,
        gt_disp_left=gt_l, gt_disp_right=gt_r, calib=calib,
        dmin=0, dmax=ndisp,
        rgb_left=load_image_rgb(folder / "im0.png"),
        rgb_right=load_image_rgb(folder / "im1.png"),
    )


def load_pair_kitti(root: PathLike, frame_id: str,
                    use_noc: bool = False) -> StereoPair:
    """KITTI-2015 layout: image_2/image_3 left/right PNGs, disp_occ_0 /
    disp_noc_0 uint16 ground truth scaled by 256, 0 = unknown.

    KITTI ships per-date camera calibrations; when absent a nominal
    KITTI-2015 geometry (fx 721.5377 px, baseline 537 mm) is used so the
    depth-domain metrics stay meaningful."""
    from PIL import Image

    root = Path(root)
    name = f"{frame_id}_10.png"
    left = load_image_gray_stb(root / "image_2" / name)
    right = load_image_gray_stb(root / "image_3" / name)

    gt_dir = "disp_noc_0" if use_noc else "disp_occ_0"
    gt = None
    gt_path = root / gt_dir / name
    if gt_path.exists():
        raw = np.asarray(Image.open(gt_path), dtype=np.float32)
        gt = raw / 256.0
        gt[raw == 0] = np.nan
    h, w = left.shape
    return StereoPair(
        name=f"kitti2015/{frame_id}",
        img_left=left, img_right=right,
        gt_disp_left=gt, gt_disp_right=None,
        calib=synthetic_calib(w, h, fx=721.5377, baseline=537.0),
        dmin=0, dmax=192,
        rgb_left=load_image_rgb(root / "image_2" / name),
        rgb_right=load_image_rgb(root / "image_3" / name),
    )


def discover_kitti(root: PathLike) -> List[str]:
    """Frame ids of a KITTI-2015 training/testing directory."""
    img_dir = Path(root) / "image_2"
    if not img_dir.is_dir():
        return []
    return sorted(p.name[:-7] for p in img_dir.glob("*_10.png"))


@dataclasses.dataclass(frozen=True)
class KittiFrameRef:
    """Lazy handle to one KITTI frame: resolved by ``load_pair`` inside the
    evaluation loop, so a 200-frame run never materialises ~1 GB of pixel
    data up front."""

    root: str
    frame_id: str

    @property
    def name(self) -> str:
        return f"kitti2015/{self.frame_id}"


def kitti_frame_refs(root: PathLike) -> List["KittiFrameRef"]:
    return [KittiFrameRef(str(root), fid) for fid in discover_kitti(root)]


def load_pair(folder: PathLike) -> StereoPair:
    if isinstance(folder, StereoPair):
        return folder
    if isinstance(folder, KittiFrameRef):
        return load_pair_kitti(folder.root, folder.frame_id)
    folder = Path(folder)
    if (folder / "calib.txt").exists():
        return load_pair_2014(folder)
    if (folder / "image_2").is_dir():
        ids = discover_kitti(folder)
        if not ids:
            raise FileNotFoundError(f"{folder}: KITTI layout but no frames")
        return load_pair_kitti(folder, ids[0])
    return load_pair_legacy_png(folder)


def reference_data_pairs(reference_root: PathLike = "/root/reference") -> List[Path]:
    """The stereo pairs checked into the reference repo."""
    base = Path(reference_root) / "SemiGlobalMatching" / "Data"
    if not base.exists():
        return []
    return sorted(p for p in base.iterdir()
                  if p.is_dir() and (
                      (p / "im2.png").exists() or (p / "view1.png").exists()))
