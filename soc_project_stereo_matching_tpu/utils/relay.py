"""Relay-outage resilience for the tunnelled TPU backend.

The axon TPU relay goes UNAVAILABLE for stretches (observed: ~1 h).  Once
``jax.devices()`` fails *in-process* the backend state is poisoned for the
process lifetime, so every TPU-run entry point (bench.py, scripts/*) should
probe the backend in a SUBPROCESS before its first in-process jax use.

No reference equivalent: the reference's analog is the lwIP error callback +
reconnect loop on the device client (tcp_perf_client.c:37-49).
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_backend(max_wait_s: float = 1800.0, log=None) -> bool:
    """Block until ``jax.devices()`` succeeds in a fresh subprocess.

    Returns True if the probe succeeded, False if the budget ran out (the
    caller proceeds and lets the real init produce the error).  ``log`` is
    a ``print``-like callable; defaults to stderr.
    """
    if log is None:
        log = lambda m: print(m, file=sys.stderr, flush=True)

    deadline = time.monotonic() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.monotonic()
        try:
            ok = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=min(300.0, max(60.0, deadline - time.monotonic())),
            ).returncode == 0
        except subprocess.TimeoutExpired:
            ok = False          # a hung probe is an outage too
        if ok:
            if attempt > 1:
                log(f"backend probe succeeded on attempt {attempt}")
            return True
        if time.monotonic() >= deadline:
            log(f"backend probe still failing after {attempt} attempts / "
                f"{max_wait_s:.0f}s budget — proceeding anyway")
            return False
        log(f"backend unavailable (probe attempt {attempt}, "
            f"{time.monotonic() - t0:.0f}s); retrying in 60s")
        time.sleep(60)
