"""TPU-native stereo depth framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
``stvmsq/soc_project_stereo_matching`` project: a Semi-Global-Matching stereo
pipeline, a dataset/metrics evaluation platform, the host<->device streaming
protocol, and multi-chip scaling via ``jax.sharding``.

Layers (bottom-up), mirroring SURVEY.md section 1:
  ops/       Pallas + jnp compute kernels (census, cost volume, path
             aggregation, WTA, post-processing)
  models/    the SGM pipeline composition (jit-compiled matcher)
  parallel/  device meshes, batch sharding, spatial tiling + halo exchange
  data/      datasets, PFM/PNG IO, calibration, input pipeline
  eval/      metrics + batched evaluation harness (the "test platform")
  compat/    the reference TCP wire protocol (server + client)
  runtime/   native (C) runtime pieces: frame buffers, protocol framing
  oracle     bit-exact numpy contract validated against the reference C
"""

from .config import INVALID_FLOAT, EngineConfig, SGMOptions

__version__ = "0.1.0"

__all__ = ["SGMOptions", "EngineConfig", "INVALID_FLOAT", "__version__"]
