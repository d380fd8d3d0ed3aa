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

import hashlib
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REF_SERVER_DIR = Path("/root/reference/HostScript_Server")

# The reference checkout is untrusted public content we execute in a
# subprocess; pin the modules the launcher imports by content hash so an
# altered checkout is detected rather than run (recorded 2026-08-16).
REF_SERVER_SHA256 = {
    "server.py":
        "956ad8eefef9d474be2202ba8914eafeca0f39c234cf1124bec6bdc7269fe48b",
    "stereo_image.py":
        "c43f8df87e30d2ebe286463685a5e95e10edc39e2ccb4ade5bce0571aa636ff0",
    "stereo_calibration.py":
        "4ffc6958f31c60e69c33088ec0323ed5d5cb7f29c4f52189406c6b9ccc72222f",
    "depth_image.py":
        "b61992ff1778b25ed54611247e38e138957f4468650cd97a84d9492918ad6461",
}

pytest.importorskip("cv2", reason="reference server needs OpenCV")
pytestmark = pytest.mark.skipif(
    not (REF_SERVER_DIR / "server.py").exists(),
    reason="reference checkout not available")


def _check_reference_pinned():
    for name, want in REF_SERVER_SHA256.items():
        got = hashlib.sha256((REF_SERVER_DIR / name).read_bytes()).hexdigest()
        if got != want:
            pytest.fail(
                f"reference {name} content changed (sha256 {got[:12]}… != "
                f"pinned {want[:12]}…); refusing to execute an altered "
                "checkout — re-review and re-pin")


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

    _check_reference_pinned()
    port = _free_port()
    width, height = 160, 120
    launcher = tmp_path / "launch_ref_server.py"
    launcher.write_text(LAUNCHER.format(ref_dir=REF_SERVER_DIR))
    # Minimal environment: the untrusted server subprocess gets only what
    # the interpreter + cv2/numpy need, not this session's full env.
    minimal_env = {k: v for k, v in os.environ.items()
                   if k in ("PATH", "HOME", "LANG", "LC_ALL", "TMPDIR")}
    proc = subprocess.Popen(
        [sys.executable, str(launcher), str(tmp_path), str(port),
         str(width), str(height)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=minimal_env,
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

        # NB: the port-readiness probe above also registered as a client, so
        # the server writes a zero-frame stats file for it — scan all stats
        # files for the engine client's (the one that scored 2 frames).
        stats_dir = tmp_path / "result" / "stats"
        deadline = time.time() + 20
        stats = None
        seen = []
        while time.time() < deadline:
            seen = list(stats_dir.glob("*.txt"))
            for f in seen:
                try:
                    candidate = json.loads(f.read_text())
                except (json.JSONDecodeError, ValueError):
                    continue
                if candidate.get("total_frames") == 2:
                    stats = candidate
                    break
            if stats is not None:
                break
            time.sleep(0.5)
        assert stats is not None, (
            f"no stats file with total_frames == 2; saw "
            f"{[(f.name, f.read_text()[:200]) for f in seen]}")
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
