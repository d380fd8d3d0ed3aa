"""Wire-protocol compatibility tests.

The crown jewel here: the **unmodified reference server** (imported from
/root/reference/HostScript_Server, its own socket/scoring code) scoring our
TPU-engine client over a real TCP connection.
"""

import importlib.util
import json
import socket
import struct
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pytest

from soc_project_stereo_matching_tpu import SGMOptions
from soc_project_stereo_matching_tpu.compat import protocol as proto
from soc_project_stereo_matching_tpu.compat.client import run_client
from soc_project_stereo_matching_tpu.compat.server import CompatServer
from soc_project_stereo_matching_tpu.data.calib import StereoCalib
from soc_project_stereo_matching_tpu.data.convert import to_middlebury2014


# ---------------------------------------------------------------------------
# Unit: framing round-trips
# ---------------------------------------------------------------------------

def test_image_planes_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 11, 3), dtype=np.uint8)
    blob = proto.encode_image_planes(img)
    assert len(blob) == 3 * 7 * 11
    assert np.array_equal(proto.decode_image_planes(blob, 11, 7), img)


def test_frame_over_socketpair():
    a, b = socket.socketpair()
    rng = np.random.default_rng(1)
    left = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    right = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    cam = np.array([[100.0, 0, 4.5], [0, 100.0, 3], [0, 0, 1]], np.float32)
    calib = StereoCalib(9, 6, cam, cam.copy(), 2.5, 40.0)
    t = threading.Thread(
        target=proto.send_stereo_frame, args=(a, proto.REQ_IMG_CALIB, 3, left, right, calib)
    )
    t.start()
    header, calib2, l2, r2 = proto.recv_stereo_frame(b)
    t.join()
    assert (header.type_id, header.seq, header.width, header.height) == (1, 3, 9, 6)
    assert np.allclose(calib2.cam0, calib.cam0)
    assert np.array_equal(l2, left) and np.array_equal(r2, right)
    a.close(), b.close()


def test_depth_over_socketpair():
    a, b = socket.socketpair()
    depth = np.random.default_rng(2).uniform(0, 100, (5, 8)).astype(np.float32)
    depth[0, 0] = np.nan
    t = threading.Thread(target=proto.send_depth_image, args=(a, 7, depth))
    t.start()
    first = proto.recv_exact(b, 1)
    assert first[0] == proto.REQ_DEPTH_UPLOAD
    seq, back = proto.recv_depth_image(b)
    t.join()
    assert seq == 7
    assert np.array_equal(np.isnan(back), np.isnan(depth))
    assert np.array_equal(back[~np.isnan(depth)], depth[~np.isnan(depth)])
    a.close(), b.close()


# ---------------------------------------------------------------------------
# End-to-end: our server <-> our TPU-engine client
# ---------------------------------------------------------------------------

def test_compat_server_with_engine_client(reference_dir, tmp_path):
    cone = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    server = CompatServer([cone], host="127.0.0.1", port=0,
                          width=320, height=240, stats_dir=tmp_path)
    port = server.start()
    try:
        frames = run_client("127.0.0.1", port, max_frames=5,
                            options=SGMOptions(max_disparity=48,
                                               is_remove_speckles=False))
        assert frames == 1  # one dataset, then close status
    finally:
        time.sleep(0.2)
        server.stop()
    stats_files = list(tmp_path.glob("127.0.0.1_*.txt"))
    assert stats_files, "server wrote no stats"
    stats = json.loads(stats_files[0].read_text())
    assert stats["total_frames"] == 1
    m = stats["measurements"][0]
    assert m["n_valid"] > 0 and np.isfinite(m["rmse_mm"]) and stats["fps"] > 0


def test_client_per_frame_calibration(reference_dir, tmp_path):
    """A server walking several datasets sends a different calibration per
    frame; the firmware-style request pattern (type 1 once, then type 2)
    silently converts later frames' depth with the FIRST dataset's
    calibration.  ``calib_every_frame=True`` must fix that: the second
    dataset's depth error drops vs the stale-calib run.  (cone is 450 px
    wide, Cloth3 626 px — after the server rescales both to 320 the two
    fx/doffs differ by ~1.4x, so the stale conversion is badly off.)"""
    data = reference_dir / "SemiGlobalMatching" / "Data"
    opts = SGMOptions(max_disparity=48, is_remove_speckles=False)
    rmse2 = {}
    for per_frame in (False, True):
        stats_dir = tmp_path / f"per_frame_{per_frame}"
        stats_dir.mkdir()
        server = CompatServer([data / "cone", data / "Cloth3"],
                              host="127.0.0.1", port=0,
                              width=320, height=240, stats_dir=stats_dir)
        port = server.start()
        try:
            frames = run_client("127.0.0.1", port, max_frames=5,
                                options=opts, calib_every_frame=per_frame)
            assert frames == 2
        finally:
            time.sleep(0.2)
            server.stop()
        stats = json.loads(next(iter(stats_dir.glob("127.0.0.1_*.txt")))
                           .read_text())
        assert stats["total_frames"] == 2
        second = next(m for m in stats["measurements"] if m["seq"] == 1)
        assert second["n_valid"] > 0
        rmse2[per_frame] = second["rmse_mm"]
    assert rmse2[True] < rmse2[False], rmse2


# ---------------------------------------------------------------------------
# End-to-end: UNMODIFIED reference server <-> our TPU-engine client
# ---------------------------------------------------------------------------

def test_reference_server_scores_our_engine(reference_dir, tmp_path, monkeypatch):
    pytest.importorskip("cv2")
    monkeypatch.chdir(tmp_path)  # reference writes result/stats in CWD

    # reference server wants 2014-layout folders (im0/im1.png + pfm + calib)
    data = to_middlebury2014(
        reference_dir / "SemiGlobalMatching" / "Data" / "cone",
        tmp_path / "data" / "all" / "cone",
    )

    host_dir = reference_dir / "HostScript_Server"
    sys.path.insert(0, str(host_dir))
    try:
        spec = importlib.util.spec_from_file_location("ref_server", host_dir / "server.py")
        ref_server = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_server)

        # point the unmodified handler at our data and a smaller frame size
        ref_server.test_data.clear()
        ref_server.test_data.append(str(data))
        ref_server.WIDTH, ref_server.HEIGHT = 320, 240

        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.bind(("127.0.0.1", 0))
        sock.listen(1)
        port = sock.getsockname()[1]

        def serve_one():
            conn, addr = sock.accept()
            ref_server.handle_client(conn, addr)

        def round_trip():
            t = threading.Thread(target=serve_one, daemon=True)
            t.start()
            frames = run_client("127.0.0.1", port, max_frames=5,
                                options=SGMOptions(max_disparity=48,
                                                   is_remove_speckles=False))
            t.join(timeout=120)
            assert frames == 1
            stats_files = sorted((tmp_path / "result" / "stats").glob("*.txt"),
                                 key=lambda p: p.stat().st_mtime)
            assert stats_files, "reference server wrote no stats"
            stats = json.loads(stats_files[-1].read_text())
            assert stats["total_frames"] == 1
            return stats["measurements"][0]

        # Pass 1: stock behaviour.  The reference server whites out every
        # image before sending (server.py:122-124, an active wire-debug
        # stub), so the engine sees blank frames -> all-invalid disparity ->
        # n_valid == 0.  The full protocol + scoring path still executes.
        m = round_trip()
        assert m["n_valid"] == 0

        # Pass 2: defeat the whiteout by injecting fill-inert arrays at the
        # reference's own image-loading seam (no reference code modified);
        # now the engine sees real frames and the reference server scores
        # them with finite metrics.
        class FillInert(np.ndarray):
            def fill(self, value):  # noqa: D401 - neutralised debug stub
                pass

        orig_read = ref_server.stereo_image.read_image

        def read_inert(path, width, height, logger=None):
            img = orig_read(path, width, height, logger=logger)
            return img.view(FillInert)

        ref_server.stereo_image.read_image = read_inert
        sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        sock.bind(("127.0.0.1", 0))
        sock.listen(1)
        port = sock.getsockname()[1]
        m = round_trip()
        assert m["n_valid"] > 0 and np.isfinite(m["rmse_mm"]) and m["bpr"] <= 1.0
    finally:
        sys.path.pop(0)
        for mod in ("stereo_calibration", "depth_image", "stereo_image"):
            sys.modules.pop(mod, None)
