"""Pallas TPU kernels for the SGM hot path.

Kernels land here incrementally; any op not yet kernelised falls back to
its jnp implementation (XLA already fuses the elementwise stages well — the
wins here are the scan-heavy aggregation and bandwidth control).
"""

from __future__ import annotations

from .aggregation import aggregate_paths  # noqa: F401  (fallback)
from .census import census_5x5  # noqa: F401  (fallback)
from .cost_volume import hamming_cost_volume  # noqa: F401  (fallback)
