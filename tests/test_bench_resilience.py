"""bench.py must print exactly ONE parseable JSON line no matter what.

VERDICT r3 weak #1: the round-3 driver artifact was empty because a relay
outage out-waited the driver's command timeout and bench.py printed nothing.
These tests pin the failure-path contract: a dead backend (or any internal
error) still yields one stdout line with ``value: null`` and a
machine-readable ``error`` field, and the process exits 0 so the driver
records the line rather than a timeout.
"""

from __future__ import annotations

import json
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.modules.pop("bench", None)
    import bench as mod
    yield mod
    sys.modules.pop("bench", None)


def _run_main(bench, capsys) -> dict:
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 0          # failure is a result, not a crash
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"expected exactly one stdout line, got {out}"
    return json.loads(out[0])


def test_error_path_emits_one_json_line(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "run_bench",
                        lambda: (_ for _ in ()).throw(
                            RuntimeError("backend unavailable")))
    rec = _run_main(bench, capsys)
    assert rec["metric"] == "frames_per_sec_per_chip"
    assert rec["value"] is None
    assert rec["vs_baseline"] is None
    assert "backend unavailable" in rec["error"]


def test_keyboard_interrupt_still_emits(bench, capsys, monkeypatch):
    # a driver-side SIGINT mid-measurement must not leave an empty artifact
    monkeypatch.setattr(bench, "run_bench",
                        lambda: (_ for _ in ()).throw(KeyboardInterrupt()))
    rec = _run_main(bench, capsys)
    assert rec["value"] is None
    assert "KeyboardInterrupt" in rec["error"]


def test_success_path_emits_value(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, "run_bench", lambda: 333.3)
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["value"] == 333.3
    assert rec["vs_baseline"] == round(333.3 / bench.BASELINE_FPS, 2)
    assert "error" not in rec


def test_probe_budget_inside_driver_window(bench):
    # probe window + watchdog must both leave the driver time to read the
    # line; 25 min total is the agreed envelope (VERDICT r3 next-round #1)
    assert bench.PROBE_BUDGET_S <= 600
    assert bench.WATCHDOG_S <= 1500


def test_wait_for_backend_bails_on_broken_environment(monkeypatch):
    """Instant, identical probe failures = broken env, not an outage."""
    from soc_project_stereo_matching_tpu.utils import relay

    calls = []

    class FakeProc:
        returncode = 1
        stderr = b"ModuleNotFoundError: No module named 'jax'\n"

    def fake_run(*a, **k):
        calls.append(1)
        return FakeProc()

    monkeypatch.setattr(relay.subprocess, "run", fake_run)
    sleeps = []
    monkeypatch.setattr(relay.time, "sleep", lambda s: sleeps.append(s))
    t0 = relay.time.monotonic()
    ok = relay.wait_for_backend(max_wait_s=600.0, log=lambda m: None)
    assert ok is False
    assert len(calls) == 3              # bailed after 3 identical failures
    assert relay.time.monotonic() - t0 < 30.0


def test_wait_for_backend_retries_fast_outage_shaped_failures(monkeypatch):
    """The axon relay can fail FAST with 'UNAVAILABLE: ...' during an
    outage — that must keep retrying (until the budget), never bail as a
    broken environment."""
    from soc_project_stereo_matching_tpu.utils import relay

    calls = []

    class FakeProc:
        returncode = 1
        stderr = (b"RuntimeError: Unable to initialize backend 'axon': "
                  b"UNAVAILABLE: TPU backend setup/compile error\n")

    def fake_run(*a, **k):
        calls.append(1)
        if len(calls) >= 4:
            FakeProc.returncode = 0     # relay recovers on attempt 4
        return FakeProc()

    monkeypatch.setattr(relay.subprocess, "run", fake_run)
    monkeypatch.setattr(relay.time, "sleep", lambda s: None)
    ok = relay.wait_for_backend(max_wait_s=600.0, log=lambda m: None)
    assert ok is True
    assert len(calls) == 4              # retried through the fast failures
