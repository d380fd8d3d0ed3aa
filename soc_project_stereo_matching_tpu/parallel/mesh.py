"""Device mesh helpers.

The reference's only "distributed" axis is host<->board Ethernet
(SURVEY.md section 2.4).  Here the first-class axes are:

* ``data``  — batch data parallelism (frames per chip),
* ``tile``  — spatial parallelism (image H-tiles with halo exchange and
              cross-tile scan-carry propagation, parallel/tiles.py).

Collectives ride ICI inside a slice; ``jax.distributed`` extends the same
mesh across hosts (DCN) without code changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, tile: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, tile) mesh.  ``data=None`` uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % tile:
            raise ValueError(f"{n} devices not divisible by tile={tile}")
        data = n // tile
    if data * tile > n:
        raise ValueError(f"mesh {data}x{tile} exceeds {n} devices")
    arr = np.array(devices[: data * tile]).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W) arrays: batch over 'data', rows over 'tile'."""
    return NamedSharding(mesh, P("data", "tile", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
