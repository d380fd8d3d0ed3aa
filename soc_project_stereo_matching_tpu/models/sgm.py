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
    (+inf invalid).  Accepts any number of leading batch dimensions."""
    # The aggregation entry points are written for one leading batch dim;
    # collapse extras inline and restore them on the way out.  (Inline, not
    # via a nested call around a reshape: that pattern re-triggers the XLA
    # fusion miscompile the optimization_barrier below works around.)
    batch_extra = img_left.shape[:-2] if img_left.ndim > 3 else None
    if batch_extra is not None:
        img_left = img_left.reshape((-1,) + img_left.shape[-2:])
        img_right = img_right.reshape((-1,) + img_right.shape[-2:])
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
                                      max_shift=options.max_disparity)
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
                            max_shift=options.max_disparity)
    if options.is_remove_speckles:
        if use_pallas:
            # pk is already bound by the use_pallas branch above
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
        disp = median_filter_3x3_inplace(disp)
    else:
        disp = median_filter_3x3(disp)
    if batch_extra is not None:
        # XLA miscompiles the median fused into this restore-reshape (first
        # batch plane comes back wrong, CPU and TPU-family fusion bug of the
        # same shape as the aggregation barrier above); materialise first
        disp = jax.lax.optimization_barrier(disp)
        disp = disp.reshape(batch_extra + disp.shape[-2:])
    return disp


class SGMEngine:
    """Convenience wrapper holding options + execution config.

    The reference equivalent is the global ``sgm`` instance +
    SGM_Initialize/SGM_Match; here initialisation is compilation (cached per
    input shape) and matching is a pure function call.

    With a ``mesh``, ``match_batch`` runs sharded: batch over the mesh's
    'data' axis, and — when ``config.tile_mode`` is 'exact', 'pipelined' or 'local' — image
    rows over its 'tile' axis with halo exchange and cross-tile scan-carry
    chaining (parallel/tiles.py).  With ``tile_mode='none'`` the batch is
    still data-parallel over 'data' (rows replicated over any 'tile' axis).
    """

    def __init__(self, options: SGMOptions = SGMOptions(),
                 config: EngineConfig = EngineConfig(),
                 mesh=None):
        self.options = options
        self.config = config
        self.mesh = mesh
        self._matchers = {}

    def _diag_mode(self) -> str:
        return self.config.diagonal_mode

    def _use_pallas(self) -> bool:
        return self.config.use_pallas and jax.default_backend() == "tpu"

    def _batched(self, lefts, rights) -> jax.Array:
        """Unsharded batched forward reading options/config live (jit
        caching keys on sgm_forward's static args, so a config change
        retraces instead of silently reusing a stale executable)."""
        return sgm_forward(lefts, rights, self.options, self._diag_mode(),
                           self._use_pallas(), self.config.compute16)

    def _matcher_key(self, tag: str, h: int, w: int) -> tuple:
        # everything the built matcher bakes in at construction time —
        # a config/options reassignment must miss the cache, not silently
        # reuse a matcher built for the old settings
        return (tag, h, w, self.options, self.config.tile_mode,
                self._diag_mode(), self._use_pallas(), self.config.compute16)

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
        h, w = lefts.shape[-2:]
        if self.mesh is not None and self.config.tile_mode != "none":
            from ..parallel.tiles import make_tiled_matcher

            key = self._matcher_key("tiled", h, w)
            if key not in self._matchers:
                self._matchers[key] = make_tiled_matcher(
                    self.options, self.mesh, h, w,
                    cross_tile=self.config.tile_mode,
                    diagonal_mode=self._diag_mode(),
                    use_pallas=self._use_pallas(),
                    compute16=self.config.compute16,
                )
            return self._matchers[key](lefts, rights)
        if self.mesh is not None and self.mesh.size > 1:
            # tile_mode='none' with a real mesh: still data-parallel over
            # 'data' (docstring contract); rows replicated over any 'tile'
            # axis.  1-device meshes take plain jit (the tunnelled relay
            # runs shard_map modules ~100x slower, see make_tiled_matcher).
            key = self._matcher_key("dp", h, w)
            if key not in self._matchers:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                spec = P("data", None, None)
                fwd = self._batched
                self._matchers[key] = jax.jit(shard_map(
                    lambda l, r: fwd(l, r), mesh=self.mesh,
                    in_specs=(spec, spec), out_specs=spec, check_vma=False))
            return self._matchers[key](lefts, rights)
        return self._batched(lefts, rights)
