"""TPU-engine client speaking the reference wire protocol.

The software analogue of the ZedBoard firmware (and of the reference's
simulated client, HostScript_Server/client.py) with the SGM running on TPU:
requests frames from a test-platform server — the original unmodified
``server.py`` or our CompatServer — computes depth with the jit-compiled SGM
engine, and streams float32 depth rows back for scoring.

Pipeline per frame (mirroring client.py:47-120 / the firmware superloop):
  request -> receive header+calib+BGR planes -> fixed-point grayscale
  (the firmware's (76R+150G+29B)>>8, stereo_matching.c:13-32) -> SGM ->
  disparity -> depth = fx*baseline/(disp+doffs), invalid -> NaN -> upload.

Usage:
    python -m soc_project_stereo_matching_tpu.compat.client --host H --port P
"""

from __future__ import annotations

import argparse
import logging
import socket
import struct
import time
from typing import Optional

import numpy as np

from ..config import SGMOptions
from ..data.imageio import rgb_to_gray_device
from ..models.sgm import SGMEngine
from . import protocol as proto

log = logging.getLogger("soc_sgm_tpu.compat.client")


def bgr_planes_to_gray(img_bgr: np.ndarray) -> np.ndarray:
    """Firmware grayscale conversion on a BGR image."""
    return rgb_to_gray_device(img_bgr[..., ::-1])


def run_client(host: str = "127.0.0.1", port: int = 5001,
               max_frames: int = 1_000_000,
               options: SGMOptions = SGMOptions(),
               engine: Optional[SGMEngine] = None,
               calib_every_frame: bool = False) -> int:
    """Stream frames until the server closes; returns frames processed.

    ``calib_every_frame``: request type 1 (image + calibration) for every
    frame instead of only the first.  The firmware default is once (a
    board's camera rig is fixed, tcp_perf_client.c:73-89), but a server
    walking several *datasets* sends different calibrations per frame —
    reusing the first one would silently mis-convert depth for the rest
    (this is how the reference's own simulated client behaves,
    client.py:54)."""
    engine = engine or SGMEngine(options)
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.connect((host, port))
    calib = None
    frames = 0
    try:
        while frames < max_frames:
            # first frame needs calibration; later frames reuse it (the
            # firmware requests type 1 once, then type 2)
            want = proto.REQ_IMG_CALIB \
                if calib is None or calib_every_frame else proto.REQ_IMG
            sock.sendall(struct.pack("<B", want))
            header, new_calib, left_bgr, right_bgr = proto.recv_stereo_frame(sock)
            if header.type_id == proto.REQ_CLOSE:
                log.info("server closed after %d frames", frames)
                break
            if new_calib is not None:
                calib = new_calib

            t0 = time.perf_counter()
            gray_l = bgr_planes_to_gray(left_bgr)
            gray_r = bgr_planes_to_gray(right_bgr)
            disp = np.asarray(engine.match(gray_l, gray_r))
            valid = np.isfinite(disp)
            denom = disp + np.float32(calib.doffs)
            with np.errstate(divide="ignore", invalid="ignore"):
                depth = np.where(valid & (denom != 0),
                                 np.float32(calib.fx0) * np.float32(calib.baseline) / denom,
                                 np.nan).astype(np.float32)
            dt = time.perf_counter() - t0

            # NB: the type-3 upload header's first byte IS the request byte
            # (client.py:101-106 sends only the 9-byte payload header)
            proto.send_depth_image(sock, header.seq, depth)
            frames += 1
            log.info("seq=%d %dx%d computed+sent in %.1f ms",
                     header.seq, header.width, header.height, dt * 1e3)
        else:
            sock.sendall(struct.pack("<B", proto.REQ_CLOSE))
    finally:
        sock.close()
    return frames


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=5001)
    ap.add_argument("--max-frames", type=int, default=1_000_000)
    ap.add_argument("--max-disparity", type=int, default=64)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    run_client(args.host, args.port, args.max_frames,
               SGMOptions(max_disparity=args.max_disparity))


if __name__ == "__main__":
    main()
