"""Profiling / tracing utilities.

The reference's only timing is host wall-clock around the network round
trip (``HostScript_Server/server.py:58-74,237-255``).  Here:

* ``chained_time`` — honest device timing.  Some TPU runtimes dispatch
  lazily (``block_until_ready`` can return before execution, see
  bench.py), so the only reliable measurement builds a dependency chain —
  iteration k consumes iteration k-1's output — and fetches a scalar from
  the final result.
* ``StageTimer`` — accumulates named host-side spans into a report.
* ``trace`` — context manager around ``jax.profiler`` for XLA/TPU traces
  viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import jax
import jax.numpy as jnp


def chained_time(step: Callable, x0, iters: int = 10) -> float:
    """Seconds per iteration of ``x -> step(x)`` (same shape/dtype), with a
    warm-up call, dependency chaining, and a final scalar fetch that forces
    the whole chain to execute."""
    x = step(x0)
    jax.device_get(jnp.ravel(x)[0])
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = step(x)
    jax.device_get(jnp.ravel(x)[0])
    return (time.perf_counter() - t0) / iters


def chained_match_time(match_fn: Callable, left, right, iters: int = 3):
    """Honest per-call timing of a stereo match ``(l, r) -> disp``.

    Returns ``(seconds_per_call, disp)`` where ``disp`` is the true result
    for the *unperturbed* inputs (from the warm-up call).  Timing iterations
    derive the next left image from the previous disparity (low-bit XOR) so
    no call can be elided or overlapped by a lazily-dispatching runtime —
    the same methodology as bench.py, replacing the single-shot
    ``block_until_ready`` pattern that measures fantasy numbers under the
    tunnelled TPU relay (CLAUDE.md)."""
    import numpy as np

    @jax.jit
    def step(l, r):
        out = match_fn(l, r)
        return l ^ jnp.isfinite(out).astype(jnp.uint8), out

    left = jnp.asarray(left, jnp.uint8)
    right = jnp.asarray(right, jnp.uint8)
    _, out0 = step(left, right)            # warm-up / compile
    disp = np.asarray(out0)                # fetch forces execution

    t0 = time.perf_counter()
    l = left
    for _ in range(iters):
        l, out = step(l, right)
    jax.device_get(jnp.ravel(out)[0])      # forces the whole chain
    return (time.perf_counter() - t0) / iters, disp


class StageTimer:
    """Named host-side span accumulator.

    with timer.span("census"):
        ...
    print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t * 1e3:10.2f} ms total "
                         f"{t / n * 1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
