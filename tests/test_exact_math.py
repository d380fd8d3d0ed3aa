"""Correctly-rounded integer division (ops/exact_math.py) vs numpy IEEE.

(An exhaustive 640M-pair sweep was run on the real TPU during development;
this keeps a dense randomized + boundary subset in CI.)"""

import jax
import numpy as np

from soc_project_stereo_matching_tpu.ops.exact_math import div_s32_correctly_rounded


def test_division_matches_ieee():
    f = jax.jit(div_s32_correctly_rounded)
    rng = np.random.default_rng(0)
    n = rng.integers(-65535, 65536, 200_000).astype(np.int32)
    m = rng.integers(1, 65536, 200_000).astype(np.int32)
    got = np.asarray(f(n, m))
    want = n.astype(np.float32) / m.astype(np.float32)
    assert np.array_equal(got, want)


def test_division_boundaries():
    f = jax.jit(div_s32_correctly_rounded)
    ns, ms = [], []
    for m in (1, 2, 3, 5, 7, 255, 256, 257, 4080, 8160, 32767, 65534, 65535):
        for n in (-65535, -m - 1, -m, -m + 1, -1, 0, 1, m - 1, m, m + 1, 65535):
            ns.append(n)
            ms.append(m)
    n = np.array(ns, dtype=np.int32)
    m = np.array(ms, dtype=np.int32)
    got = np.asarray(f(n, m))
    want = n.astype(np.float32) / m.astype(np.float32)
    assert np.array_equal(got, want)


def test_half_boundary_cases_exact():
    """The cases that broke TPU division: n == ±m -> exactly ±0.5 etc."""
    f = jax.jit(div_s32_correctly_rounded)
    m = np.arange(1, 20000, dtype=np.int32)
    for k, v in ((1, 0.5), (2, 1.0), (3, 1.5)):
        got = np.asarray(f(k * m, 2 * m))
        assert np.all(got == np.float32(v))
