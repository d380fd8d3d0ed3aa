"""Honest round-trip FPS for the compat wire path (no tunnelled relay).

The reference platform treats per-client round-trip FPS as a first-class
metric (frames / sum of per-frame round-trip durations,
HostScript_Server/server.py:287-290).  The accuracy harness's engine_fps
was measured through the tunnelled TPU relay (one ~300 ms dispatch plus a
cold jit per frame), which says nothing about the wire path.  This script
measures two relay-free numbers over localhost TCP at the reference's
1280x720 device frame format:

  wire_only_fps       a client that echoes a precomputed depth plane —
                      pure protocol cost (encode/stream/decode + scoring),
                      the wire path itself;
  cpu_engine_fps      compat/client.py with the SGM engine on the CPU
                      backend (D=64, the device-format config of
                      results/streaming_bench.json) — end-to-end loopback
                      with real compute but no relay in the loop.

Both are merged into results/engine_vs_sgbm.json as the ``loopback``
section (the accuracy rows from the relay run are preserved).

Run:  python scripts/compat_loopback_fps.py
"""

from __future__ import annotations

import json
import socket
import struct
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

# CPU backend before first jax use (the axon plugin overrides JAX_PLATFORMS)
jax.config.update("jax_platforms", "cpu")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def collect_new_stats(stats_dir: Path, before: set,
                      timeout_s: float = 30.0) -> dict:
    deadline = time.monotonic() + timeout_s
    while True:
        new = [p for p in stats_dir.glob("*.txt") if p not in before]
        if new:
            try:
                return json.loads(new[0].read_text())
            except json.JSONDecodeError:
                pass
        if time.monotonic() >= deadline:
            raise RuntimeError("no stats file appeared")
        time.sleep(0.05)


def run_echo_client(host: str, port: int) -> int:
    """Protocol-only client: streams back one precomputed depth plane per
    frame — measures the wire path with zero compute."""
    from soc_project_stereo_matching_tpu.compat import protocol as proto

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.connect((host, port))
    frames = 0
    depth = None
    try:
        while True:
            sock.sendall(struct.pack("<B", proto.REQ_IMG_CALIB))
            header, calib, left_bgr, _ = proto.recv_stereo_frame(sock)
            if header.type_id == proto.REQ_CLOSE:
                break
            if depth is None or depth.shape != left_bgr.shape[:2]:
                depth = np.full(left_bgr.shape[:2], 1000.0, np.float32)
            proto.send_depth_image(sock, header.seq, depth)
            frames += 1
    finally:
        sock.close()
    return frames


def main():
    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.compat.client import run_client
    from soc_project_stereo_matching_tpu.compat.server import CompatServer
    from soc_project_stereo_matching_tpu.data.datasets import (
        reference_data_pairs)

    assert jax.default_backend() == "cpu", jax.default_backend()
    base_pairs = reference_data_pairs()

    results = {}
    # -- wire-only: many frames, trivial client ---------------------------
    tmp = Path(tempfile.mkdtemp(prefix="loopback_wire_"))
    server = CompatServer(base_pairs * 8, host="127.0.0.1", port=0,
                          stats_dir=tmp)
    port = server.start()
    try:
        before = set(tmp.glob("*.txt"))
        n = run_echo_client("127.0.0.1", port)
        stats = collect_new_stats(tmp, before)
    finally:
        server.stop()
    results["wire_only_fps"] = round(stats["fps"], 2)
    log(f"wire-only: {n} frames, fps={stats['fps']:.2f}")

    # -- CPU-engine loopback ----------------------------------------------
    tmp = Path(tempfile.mkdtemp(prefix="loopback_engine_"))
    server = CompatServer(base_pairs * 2, host="127.0.0.1", port=0,
                          stats_dir=tmp)
    port = server.start()
    try:
        before = set(tmp.glob("*.txt"))
        n = run_client("127.0.0.1", port,
                       options=SGMOptions(max_disparity=64),
                       calib_every_frame=True)
        stats = collect_new_stats(tmp, before, timeout_s=120.0)
    finally:
        server.stop()
    results["cpu_engine_fps"] = round(stats["fps"], 3)
    log(f"cpu-engine: {n} frames, fps={stats['fps']:.3f}")

    out = REPO / "results" / "engine_vs_sgbm.json"
    doc = json.loads(out.read_text()) if out.exists() else {}
    doc["loopback"] = {
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "format": "1280x720 device frames over localhost TCP, no relay",
        "wire_only_fps": results["wire_only_fps"],
        "wire_only_note": "precomputed-depth echo client: protocol "
                          "encode/stream/decode + server scoring only",
        "cpu_engine_fps": results["cpu_engine_fps"],
        "cpu_engine_note": "compat client with the SGM engine on the CPU "
                           "backend, D=64 (device-format config); the "
                           "TPU-engine throughput row for this format is "
                           "results/streaming_bench.json",
    }
    # the old degenerate engine_fps (every frame paying a tunnelled relay
    # dispatch + cold jit) stays only as context for the accuracy rows
    doc["fps_note"] = ("sgbm_fps/engine_fps are the ACCURACY harness's "
                       "round-trip rates (engine side pays the tunnelled "
                       "relay per frame — not a throughput number); see "
                       "'loopback' for relay-free wire-path FPS and "
                       "bench.py for engine throughput")
    out.write_text(json.dumps(doc, indent=2))
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
