"""Integration: the UNMODIFIED reference server.py scores our TPU engine.

Runs the reference test platform (``/root/reference/HostScript_Server/
server.py``) in a subprocess — imported from its read-only location, with
only module-level config (port, data dir, frame size) overridden — and
connects our wire-protocol client.  This is the reference's own
full-system test path (SURVEY.md §3.2/§3.4) with the TPU engine playing
the board.

Note the reference server deliberately whites-out images before sending
(``server.py:122-124``, an active wire-format test stub), so the scored
depth is vacuous — the assertion target is the protocol + scoring +
stats machinery end-to-end.
"""

import json
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REF_SERVER_DIR = Path("/root/reference/HostScript_Server")

pytest.importorskip("cv2", reason="reference server needs OpenCV")
pytestmark = pytest.mark.skipif(
    not (REF_SERVER_DIR / "server.py").exists(),
    reason="reference checkout not available")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


LAUNCHER = r"""
import os, sys
os.chdir(sys.argv[1])
sys.path.insert(0, "{ref_dir}")
import server
from pathlib import Path
server.DATA_BASE = Path(sys.argv[1]) / "data" / "all"
server.PORT = int(sys.argv[2])
server.WIDTH = int(sys.argv[3])
server.HEIGHT = int(sys.argv[4])
server.server_main()
"""


def test_reference_server_scores_engine(tmp_path):
    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.compat.client import run_client
    from soc_project_stereo_matching_tpu.data.convert import to_middlebury2014

    # the reference server serves each dataset once, then sends Ende-Status
    # (server.py "Maximum number of test data reached") — two folders = two
    # frames
    to_middlebury2014("/root/reference/SemiGlobalMatching/Data/cone",
                      tmp_path / "data" / "all" / "cone")
    to_middlebury2014("/root/reference/SemiGlobalMatching/Data/cone",
                      tmp_path / "data" / "all" / "cone2")

    port = _free_port()
    width, height = 160, 120
    launcher = tmp_path / "launch_ref_server.py"
    launcher.write_text(LAUNCHER.format(ref_dir=REF_SERVER_DIR))
    proc = subprocess.Popen(
        [sys.executable, str(launcher), str(tmp_path), str(port),
         str(width), str(height)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env={**__import__("os").environ, "JAX_PLATFORMS": ""},
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            try:
                socket.create_connection(("127.0.0.1", port), 0.5).close()
                break
            except OSError:
                if proc.poll() is not None:
                    pytest.fail(f"reference server died:\n{proc.stdout.read()}")
                time.sleep(0.3)
        else:
            pytest.fail("reference server never started listening")

        frames = run_client(
            "127.0.0.1", port, max_frames=2,
            options=SGMOptions(max_disparity=16, min_speckle_area=8))
        assert frames == 2

        stats_dir = tmp_path / "result" / "stats"
        deadline = time.time() + 20
        stats_files = []
        while time.time() < deadline:
            stats_files = list(stats_dir.glob("*.txt"))
            if stats_files:
                try:
                    stats = json.loads(stats_files[0].read_text())
                    if stats.get("total_frames") == 2:
                        break
                except (json.JSONDecodeError, ValueError):
                    pass
            time.sleep(0.5)
        assert stats_files, "reference server wrote no stats"
        stats = json.loads(stats_files[0].read_text())
        assert stats["total_frames"] == 2
        assert len(stats["measurements"]) == 2
        for m in stats["measurements"]:
            assert {"seq", "duration_s", "rmse_mm", "bpr", "n_valid"} <= set(m)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
