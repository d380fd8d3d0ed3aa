"""Two-process jax.distributed bring-up on the CPU backend.

The reference's multi-client analog is the server accepting several boards
at once (HostScript_Server/server.py:322-331).  Here two OS processes form
a distributed JAX runtime over a local coordinator — each contributes 4
virtual CPU devices to a global 8-device mesh — and exercise the
``process_count() > 1`` branches of parallel/multihost.py plus a
cross-process exact tiled match whose carry chain ppermutes across the
process boundary (DCN-shaped communication on the validation backend).
"""

import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])

from soc_project_stereo_matching_tpu.parallel import multihost

multihost.initialize(coordinator_address=coordinator, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())  # 4 local x 2 processes

# --- cross-host metric reduction (the >1-process gather branch) ----------
got = multihost.allsum_metrics({"sum_err": pid + 1.5, "n": 10})
assert got == {"n": 20.0, "sum_err": 4.0}, got

# --- cross-process exact tiled match ------------------------------------
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from soc_project_stereo_matching_tpu import SGMOptions
from soc_project_stereo_matching_tpu.models.sgm import SGMEngine
from soc_project_stereo_matching_tpu.parallel.tiles import make_tiled_matcher

opts = SGMOptions(max_disparity=16, min_speckle_area=8)
rng = np.random.default_rng(0)
h, w = 16, 64
left = rng.integers(0, 256, (1, h, w), dtype=np.uint8)
right = rng.integers(0, 256, (1, h, w), dtype=np.uint8)

# tile=8: the row-tile carry chain crosses the process boundary between
# global devices 3 and 4
mesh = multihost.global_mesh(data=1, tile=8)
sharding = NamedSharding(mesh, P("data", "tile", None))
gl = jax.make_array_from_process_local_data(sharding, left[:, pid*(h//2):(pid+1)*(h//2)])
gr = jax.make_array_from_process_local_data(sharding, right[:, pid*(h//2):(pid+1)*(h//2)])

matcher = make_tiled_matcher(opts, mesh, h, w, cross_tile="exact")
out = matcher(gl, gr)

from jax.experimental import multihost_utils
# assembles the non-fully-addressable output into the full global array
full = np.asarray(multihost_utils.process_allgather(out, tiled=True))[0]

want = np.asarray(SGMEngine(opts).match(left[0], right[0]))
both_inf = np.isinf(want) & np.isinf(full)
ok = ((np.isinf(want) == np.isinf(full)) & (both_inf | (want == full))).all()
assert ok, "cross-process tiled match != single-device"

# --- production Pallas carries across the process boundary ----------------
# The directional_scan_group carry tensors (the ones a real multi-host
# slice ships over DCN) ppermute between global devices 3 and 4, i.e.
# across the two OS processes; interpret-mode kernels on CPU.
matcher_pk = make_tiled_matcher(opts, mesh, h, w, cross_tile="exact",
                                use_pallas=True)
full_pk = np.asarray(multihost_utils.process_allgather(
    matcher_pk(gl, gr), tiled=True))[0]
both_inf = np.isinf(want) & np.isinf(full_pk)
ok_pk = ((np.isinf(want) == np.isinf(full_pk))
         & (both_inf | (want == full_pk))).all()
assert ok_pk, "cross-process Pallas-carry tiled match != single-device"
print(json.dumps({"pid": pid, "ok": True, "pallas_ok": True,
                  "metrics": got}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}"}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coordinator, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]

    deadline = time.time() + 540
    outs = []
    try:
        for p in procs:
            remaining = max(1.0, deadline - time.time())
            out = p.communicate(timeout=remaining)[0]
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process run timed out:\n" + "\n".join(
            o if isinstance(o, str) else "?" for o in outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        last = [l for l in out.strip().splitlines() if l.startswith("{")]
        assert last, f"process {pid} printed no result:\n{out}"
        res = json.loads(last[-1])
        assert res["ok"] and res["pid"] == pid
        assert res["metrics"] == {"n": 20.0, "sum_err": 4.0}
