"""TPU-lowering regression net for the Pallas kernels, runnable on CPU.

Interpret mode (how the CPU suite runs kernels) skips the Pallas TPU
lowering entirely, so block-spec violations — e.g. a block whose
second-to-last dim is neither 8-divisible nor the full array dim — pass
every CPU test and then fail on the first real-chip launch (this bit the
banded speckle kernels in round 4).  ``jax.export`` with
``platforms=["tpu"]`` runs that lowering (including
``_check_block_mappings``) without a TPU, catching the whole class here.

It does NOT run Mosaic itself (dynamic-offset alignment proofs, op
legalization), so real-chip verification stays required — this is the
cheap early net, not a replacement.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import soc_project_stereo_matching_tpu.ops.pallas_kernels as pk
from soc_project_stereo_matching_tpu.config import SGMOptions


@pytest.fixture
def tpu_lowering(monkeypatch):
    """Force the non-interpret (real TPU) Pallas path and return an
    export-lowering helper."""
    monkeypatch.setattr(pk, "_interpret", lambda: False)

    def lower(fn, *args):
        exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        assert len(exported.mlir_module()) > 0
        return exported

    return lower


RNG = np.random.default_rng(0)
# Odd-ish H and non-128-multiple W on purpose: padding/alignment paths are
# where lowering rules bite.
B, H, W, D = 2, 75, 450, 64


def _pair():
    l = jnp.asarray(RNG.integers(0, 256, (B, H, W), dtype=np.uint8))
    r = jnp.asarray(RNG.integers(0, 256, (B, H, W), dtype=np.uint8))
    return l, r


def test_census_cost_lowering(tpu_lowering):
    l, r = _pair()
    for store8 in (False, True):
        tpu_lowering(
            lambda a, b: pk.census_cost_volume_pallas(a, b, 0, D,
                                                      store8=store8), l, r)


@pytest.mark.parametrize("bidir", [False, True])
def test_aggregate_wta_lowering(tpu_lowering, bidir):
    cost = jnp.asarray(RNG.integers(0, 128, (B, H, D, W), dtype=np.uint8))
    img = jnp.asarray(RNG.integers(0, 256, (B, H, W), dtype=np.uint8))
    opt = SGMOptions(max_disparity=D)
    tpu_lowering(
        lambda c, i: pk.aggregate_paths_wta(
            c, i, opt, include_inverse=True, bidir=bidir)[0].best_idx,
        cost, img)


def test_carry_scan_lowering(tpu_lowering):
    """The tiled path's carry-aware scan (snp P2; H=75 with 32-row chunks
    exercises the padded partial-chunk path — s_true dynamic trip)."""
    rolls = (0, 1, -1)
    cost = jnp.asarray(RNG.integers(0, 128, (B, H, D, W), dtype=np.int8))
    img = jnp.asarray(RNG.integers(0, 256, (B, H, W)).astype(np.int32))
    p2 = pk._p2_planes(img, rolls, +1, 10, 150)
    cin = (jnp.zeros((B, len(rolls), D, W), jnp.int32),
           jnp.zeros((B, len(rolls), 1, W), jnp.int32))
    tpu_lowering(
        lambda c, p, c0, m0: pk._directional_scan_group(
            c, p, None, rolls, False, 10, False, 32,
            carry_in=(c0, m0), want_carry=True)[0],
        cost, p2, cin[0], cin[1])


def test_wta_reduce_lowering(tpu_lowering):
    aggr = jnp.asarray(
        RNG.integers(0, 2000, (B, H, D, W)).astype(np.uint16))
    opt = SGMOptions(max_disparity=D)
    tpu_lowering(
        lambda a: pk.wta_reduce_pallas(a, opt, include_inverse=True)[0][0],
        aggr)


def test_lr_check_lowering(tpu_lowering):
    dl = jnp.asarray(RNG.random((B, H, W), np.float32) * D)
    dr = jnp.asarray(RNG.random((B, H, W), np.float32) * D)
    tpu_lowering(lambda a, b: pk.lr_check_pallas(a, b, 1.0, D), dl, dr)


def test_speckle_lowering(tpu_lowering):
    disp = jnp.asarray(RNG.random((B, H, W), np.float32) * D)
    tpu_lowering(
        functools.partial(pk.remove_speckles_pallas, diff_insame=1.0,
                          min_area=50), disp)


def test_speckle_lowering_strip_path(tpu_lowering):
    """Frames beyond the VMEM pixel budget take the halo-strip split."""
    h = pk._SPECKLE_VMEM_PIXELS // W + 64
    disp = jnp.asarray(RNG.random((1, h, W), np.float32) * D)
    tpu_lowering(
        functools.partial(pk.remove_speckles_pallas, diff_insame=1.0,
                          min_area=50), disp)
