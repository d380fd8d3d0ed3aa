"""Multi-host bring-up and cross-host evaluation collectives.

The reference's "distributed backend" is one TCP socket between a host
server and a Zynq board (``tcp_perf_client.c``, ``server.py:322-331``).
The TPU-native equivalents:

* host<->device transfer: the input pipeline (``data/pipeline.py``) feeding
  HBM, not a network protocol;
* chip<->chip: ICI collectives inside ``shard_map`` (``parallel/tiles.py``);
* host<->host: DCN via ``jax.distributed`` — this module wraps bring-up and
  the cross-host metric reduction used by the evaluation platform.

Single-process use is zero-config: every helper degrades to a no-op when
``jax.process_count() == 1``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bring up jax.distributed across hosts.

    With no arguments, relies on the environment (TPU pod metadata or the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables);
    a lone process without any of those is left untouched.

    NB: must run before anything initialises the XLA backend — so the guard
    uses ``jax.distributed.is_initialized()``, NOT ``jax.process_count()``
    (which would itself initialise the backend)."""
    if jax.distributed.is_initialized():
        return  # already initialised
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and env_coord is None \
            and num_processes is None:
        return  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(data: Optional[int] = None, tile: int = 1):
    """Mesh over *all* processes' devices (data x tile), ICI-major."""
    from .mesh import make_mesh

    return make_mesh(data=data, tile=tile, devices=jax.devices())


def process_local_batch(global_batch: int) -> int:
    """Per-process share of a global batch (reference analog: one board =
    one client; here one host feeds its addressable chips)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n


def allsum_metrics(partial_metrics: dict) -> dict:
    """Sum each process's partial metric accumulators (sums/counts) into
    global totals, identically on every host.

    The TPU-native replacement for the reference server's per-client stats
    aggregation (server.py:287-310): each host evaluates its shard of the
    dataset and the (sum, count) pairs are reduced over DCN; ratios like
    RMSE/BPR/FPS are formed after the reduction.  Single-process: identity.
    """
    if jax.process_count() == 1:
        return dict(partial_metrics)
    from jax.experimental import multihost_utils

    names = sorted(partial_metrics)
    vals = np.asarray([float(partial_metrics[k]) for k in names], np.float32)
    gathered = multihost_utils.process_allgather(vals)   # (n_proc, len)
    totals = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(names, totals)}
