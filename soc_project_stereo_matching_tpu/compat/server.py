"""Test-platform TCP server speaking the reference wire protocol.

A drop-in replacement for HostScript_Server/server.py: streams stereo pairs
(+calibration) to any client — including the unmodified ZedBoard firmware —
scores returned float32 depth maps against ground truth, and writes
per-client stats JSON in the reference schema (server.py:292-310).

Differences from the reference, on purpose:
* images are sent as-is (the reference whites them out before sending — an
  active wire-debugging stub, server.py:122-124);
* any dataset layout supported by data/datasets.py works (2014 calib.txt
  dirs or the legacy PNG pairs in the reference repo);
* port/size/paths are constructor arguments instead of module constants.

Usage:
    python -m soc_project_stereo_matching_tpu.compat.server --data DIR
"""

from __future__ import annotations

import argparse
import json
import logging
import math
import socket
import struct
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np

from ..data.datasets import StereoPair, discover_datasets, load_pair, reference_data_pairs
from ..data.imageio import resize_image
from ..eval import metrics as M
from . import protocol as proto

log = logging.getLogger("soc_sgm_tpu.compat.server")


class _ClientLogAdapter(logging.LoggerAdapter):
    """Per-client log tagging, the reference server's ergonomics
    (HostScript_Server/server.py:43-51): every line a client handler emits
    carries its id without per-call-site interpolation."""

    def process(self, msg, kwargs):
        return f"[{self.extra['client_id']}] {msg}", kwargs


@dataclass
class Measurement:
    seq: int
    start_time: float = float("nan")
    end_time: float = float("nan")
    rmse: float = float("nan")
    bpr: float = float("nan")
    n_valid: int = 0

    def duration(self) -> float:
        if math.isnan(self.start_time) or math.isnan(self.end_time):
            return float("nan")
        return self.end_time - self.start_time


class CompatServer:
    def __init__(self, data_dirs: List[Path], host: str = "0.0.0.0",
                 port: int = 5001, width: int = 1280, height: int = 720,
                 stats_dir: Path = Path("result/stats"),
                 abs_thresh_mm: float = 10.0):
        self.data_dirs = list(data_dirs)
        self.host, self.port = host, port
        self.width, self.height = width, height
        self.stats_dir = Path(stats_dir)
        self.abs_thresh_mm = abs_thresh_mm
        self._sock: Optional[socket.socket] = None
        self._threads: List[threading.Thread] = []
        self._stop = threading.Event()

    # -- data ---------------------------------------------------------------
    def _load(self, seq: int) -> StereoPair:
        return load_pair(self.data_dirs[seq])

    def _frame_for(self, pair: StereoPair):
        left = resize_image(pair.rgb_left, self.width, self.height)[..., ::-1]
        right = resize_image(pair.rgb_right, self.width, self.height)[..., ::-1]
        calib = pair.calib.scaled(self.width, self.height)
        return np.ascontiguousarray(left), np.ascontiguousarray(right), calib

    def _ground_truth(self, pair: StereoPair) -> np.ndarray:
        gt_r = pair.gt_disp_right if pair.gt_disp_right is not None \
            else pair.gt_disp_left
        return M.ground_truth_depth(pair.gt_disp_left, gt_r, pair.calib,
                                    self.width, self.height)

    # -- client handling ------------------------------------------------------
    def _handle_client(self, conn: socket.socket, addr) -> None:
        client_id = f"{addr[0]}:{addr[1]}"
        clog = _ClientLogAdapter(log, {"client_id": client_id})
        clog.info("[+] new connection")
        seq = 0
        measurements: List[Measurement] = []
        try:
            while not self._stop.is_set():
                req = conn.recv(1)
                if not req:
                    break
                request = req[0]
                if request in (proto.REQ_IMG_CALIB, proto.REQ_IMG) \
                        and seq >= len(self.data_dirs):
                    conn.sendall(struct.pack("<B", proto.REQ_CLOSE))
                    break
                if request == proto.REQ_CLOSE:
                    break
                elif request in (proto.REQ_IMG_CALIB, proto.REQ_IMG):
                    pair = self._load(seq)
                    left, right, calib = self._frame_for(pair)
                    proto.send_stereo_frame(
                        conn, request, seq, left, right,
                        calib if request == proto.REQ_IMG_CALIB else None,
                    )
                    measurements.append(Measurement(seq=seq, start_time=time.time()))
                    seq += 1
                elif request == proto.REQ_DEPTH_UPLOAD:
                    end_time = time.time()
                    seq_comp, depth = proto.recv_depth_image(conn)
                    if depth.shape != (self.height, self.width):
                        clog.warning("size mismatch: %s", depth.shape)
                        conn.sendall(struct.pack("<B", proto.REQ_CLOSE))
                        break
                    pair = self._load(seq_comp)
                    gt = self._ground_truth(pair)
                    res = M.compare_depth(gt, depth, self.abs_thresh_mm)
                    if 0 <= seq_comp < len(measurements):
                        m = measurements[seq_comp]
                        m.end_time, m.rmse, m.bpr, m.n_valid = (
                            end_time, res.rmse, res.bpr, res.n_valid)
                    clog.info("seq=%d rmse=%.2f bpr=%.4f n=%d",
                              seq_comp, res.rmse, res.bpr, res.n_valid)
                else:
                    clog.warning("unknown request %d", request)
        except (ConnectionError, OSError) as e:
            clog.error("connection error: %s", e)
        finally:
            conn.close()
        self._write_stats(addr, client_id, measurements, clog)

    def _write_stats(self, addr, client_id, measurements, clog=log) -> None:
        done = [m for m in measurements if not math.isnan(m.end_time)]
        duration = sum(m.duration() for m in done)
        fps = len(done) / duration if duration > 0 else 0
        self.stats_dir.mkdir(parents=True, exist_ok=True)
        stats = {
            "client": client_id,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S", time.localtime()),
            "total_frames": len(done),
            "total_time_s": duration,
            "fps": fps,
            "measurements": [
                {"seq": m.seq, "duration_s": m.duration(), "rmse_mm": m.rmse,
                 "bpr": m.bpr, "n_valid": m.n_valid} for m in done
            ],
        }
        path = self.stats_dir / f"{addr[0]}_{addr[1]}.txt"
        path.write_text(json.dumps(stats, ensure_ascii=False, indent=2))
        clog.info("stats -> %s (frames=%d fps=%.2f)", path, len(done), fps)

    # -- lifecycle ------------------------------------------------------------
    def start(self) -> int:
        """Bind + serve in background threads; returns the bound port."""
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self.port))
        self._sock.listen(4)
        self.port = self._sock.getsockname()[1]
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self.port

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self._sock.accept()
            except OSError:
                break
            t = threading.Thread(target=self._handle_client, args=(conn, addr),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        self._stop.set()
        if self._sock:
            self._sock.close()

    def serve_forever(self) -> None:
        self.start()
        log.info("listening on %s:%d (%d datasets)", self.host, self.port,
                 len(self.data_dirs))
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            self.stop()


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=Path, default=None)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=5001)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s [%(levelname)s] %(message)s")
    if args.data is not None:
        dirs = discover_datasets(args.data) or sorted(
            p for p in Path(args.data).iterdir() if p.is_dir())
    else:
        dirs = reference_data_pairs()
    CompatServer(dirs, args.host, args.port, args.width, args.height).serve_forever()


if __name__ == "__main__":
    main()
