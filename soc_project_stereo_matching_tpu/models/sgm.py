"""The SGM pipeline — jit-compiled composition of the ops layer.

Mirrors ``SGM_Match`` (SemiGlobalMatching.c:68-125): census -> Hamming cost
-> multi-path aggregation -> WTA (+ inverse WTA, LR check) -> speckle
removal -> median filter.  The whole pipeline is one traced function: XLA
fuses the elementwise stages, the directional DP scans run as Pallas
kernels on TPU (ops/pallas_kernels.py) or ``lax.scan`` elsewhere.

Unlike the reference (static 450x375x64 buffers, one frame at a time), the
engine is shape-polymorphic per compilation, natively batched (leading B
dim threads through every stage — no vmap around the Pallas kernels), and
sharded via ``parallel/`` (batch data-parallel, H-tile spatial parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import EngineConfig, SGMOptions
from ..ops.aggregation import aggregate_paths
from ..ops.census import census_5x5
from ..ops.cost_volume import hamming_cost_volume
from ..ops.postprocess import (lr_check, median_filter_3x3,
                               median_filter_3x3_inplace, remove_speckles)
from ..ops.wta import compute_disparity, finalize_disparity


@functools.partial(jax.jit, static_argnames=(
    "options", "diagonal_mode", "use_pallas", "compute16"))
def sgm_forward(
    img_left: jnp.ndarray,
    img_right: jnp.ndarray,
    options: SGMOptions,
    diagonal_mode: str = "wrap",
    use_pallas: bool = False,
    compute16: bool = False,
) -> jnp.ndarray:
    """uint8 (..., H, W) stereo pair -> float32 (..., H, W) disparity
    (+inf invalid).  Accepts an optional leading batch dimension."""
    if use_pallas:
        from ..ops import pallas_kernels as pk

        cost = pk.census_cost_volume_pallas(
            img_left, img_right, options.min_disparity, options.max_disparity)
        # fused aggregation + WTA: the final DP launch emits the reduction
        # planes from VMEM, so the volume is never re-read by a WTA pass
        fwd, inv = pk.aggregate_paths_wta(
            cost, img_left, options, diagonal_mode,
            include_inverse=options.is_check_lr, compute16=compute16)
        disp = finalize_disparity(fwd, options)
        if options.is_check_lr:
            disp = pk.lr_check_pallas(disp, finalize_disparity(inv, options),
                                      options.lrcheck_thres,
                                      max_shift=max(options.max_disparity, 1))
    else:
        cl = census_5x5(img_left)
        cr = census_5x5(img_right)
        cost = hamming_cost_volume(
            cl, cr, options.min_disparity, options.max_disparity)
        if img_left.ndim == 2:
            aggr = aggregate_paths(cost, img_left, options, diagonal_mode)
        else:
            aggr = jax.vmap(
                lambda c, i: aggregate_paths(c, i, options, diagonal_mode)
            )(cost, img_left)

        # XLA TPU miscompiles the fused (vmapped scan sum) -> (two argmin
        # consumers incl. a shifted view) pattern: the uint16 aggregation
        # output itself comes back wrong under vmap.  The barrier
        # materialises the volume (which HBM residency requires anyway) and
        # sidesteps the bad fusion.  Verified: single==batched==oracle with
        # the barrier; 44% of entries diverge without it (TPU v5e, jax 0.9).
        aggr = jax.lax.optimization_barrier(aggr)

        disp = compute_disparity(aggr, options, inverse=False)
        if options.is_check_lr:
            disp_right = compute_disparity(aggr, options, inverse=True)
            disp = lr_check(disp, disp_right, options.lrcheck_thres,
                            max_shift=max(options.max_disparity, 1))
    if options.is_remove_speckles:
        if use_pallas:
            from ..ops import pallas_kernels as pk

            disp = pk.remove_speckles_pallas(disp, 1.0, options.min_speckle_area)
        elif disp.ndim == 2:
            disp = remove_speckles(disp, 1.0, options.min_speckle_area)
        else:
            batch = disp.shape[:-2]
            flat = disp.reshape((-1,) + disp.shape[-2:])
            disp = jax.vmap(
                lambda d: remove_speckles(d, 1.0, options.min_speckle_area)
            )(flat).reshape(batch + disp.shape[-2:])
    if options.median_inplace:
        # reference-exact raster-recurrence median (SemiGlobalMatching.c:120
        # calls MedianFilter with in == out); wavefront-sequential, so it is
        # the parity mode, not the perf path — see postprocess.py
        return median_filter_3x3_inplace(disp)
    return median_filter_3x3(disp)


class SGMEngine:
    """Convenience wrapper holding options + execution config.

    The reference equivalent is the global ``sgm`` instance +
    SGM_Initialize/SGM_Match; here initialisation is compilation (cached per
    input shape) and matching is a pure function call.

    With a ``mesh``, ``match_batch`` runs sharded: batch over the mesh's
    'data' axis, and — when ``config.tile_mode`` is 'exact', 'pipelined' or 'local' — image
    rows over its 'tile' axis with halo exchange and cross-tile scan-carry
    chaining (parallel/tiles.py).
    """

    def __init__(self, options: SGMOptions = SGMOptions(),
                 config: EngineConfig = EngineConfig(),
                 mesh=None):
        self.options = options
        self.config = config
        self.mesh = mesh
        self._tiled = {}
        self._batched = jax.jit(
            lambda l, r: sgm_forward(
                l, r, options, self._diag_mode(), self._use_pallas(),
                self.config.compute16,
            )
        )

    def _diag_mode(self) -> str:
        return self.config.diagonal_mode

    def _use_pallas(self) -> bool:
        return self.config.use_pallas and jax.default_backend() == "tpu"

    def match(self, img_left, img_right) -> jax.Array:
        """Single pair -> disparity.  Accepts numpy or jax uint8 arrays."""
        return sgm_forward(
            jnp.asarray(img_left, jnp.uint8),
            jnp.asarray(img_right, jnp.uint8),
            self.options,
            self._diag_mode(),
            self._use_pallas(),
            self.config.compute16,
        )

    def match_batch(self, imgs_left, imgs_right) -> jax.Array:
        """(B, H, W) pairs -> (B, H, W) disparities."""
        lefts = jnp.asarray(imgs_left, jnp.uint8)
        rights = jnp.asarray(imgs_right, jnp.uint8)
        if self.mesh is not None and self.config.tile_mode != "none":
            from ..parallel.tiles import make_tiled_matcher

            h, w = lefts.shape[-2:]
            key = (h, w)
            if key not in self._tiled:
                self._tiled[key] = make_tiled_matcher(
                    self.options, self.mesh, h, w,
                    cross_tile=self.config.tile_mode,
                    diagonal_mode=self._diag_mode(),
                    use_pallas=self._use_pallas(),
                    compute16=self.config.compute16,
                )
            return self._tiled[key](lefts, rights)
        return self._batched(lefts, rights)
