"""Pytest configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths (parallel/) are exercised without TPU hardware, mirroring how
the reference runs its ARM firmware under QEMU to test without a board
(SURVEY.md section 4.5).  Real-TPU tests are marked ``tpu`` and opt in via
``--tpu``.
"""

import os

# Must happen before jax initializes its backends.  NB: the tunnelled TPU
# plugin ("axon") overrides the JAX_PLATFORMS env var, so force the platform
# through the config API as well.
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if os.environ.get("SOC_SGM_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REFERENCE = Path(os.environ.get("SOC_SGM_REFERENCE", "/root/reference"))
GOLDEN_NPZ = REPO / "tests" / "golden" / "_cache" / "cone_goldens.npz"


def pytest_addoption(parser):
    parser.addoption("--tpu", action="store_true", default=False,
                     help="run tests that need a real TPU")


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--tpu"):
        skip = pytest.mark.skip(reason="needs --tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture(scope="session")
def reference_dir() -> Path:
    if not REFERENCE.exists():
        pytest.skip(f"reference tree not available at {REFERENCE}")
    return REFERENCE


@pytest.fixture(scope="session")
def cone_pair(reference_dir):
    """The cone stereo pair, loaded exactly as the reference CLI does."""
    from soc_project_stereo_matching_tpu.data.imageio import load_image_gray_stb

    base = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    return (load_image_gray_stb(base / "im2.png"),
            load_image_gray_stb(base / "im6.png"))


def _load_goldens(pair: str):
    npz = GOLDEN_NPZ.parent / f"{pair}_goldens.npz"
    if not npz.exists():
        import sys
        sys.path.insert(0, str(REPO / "tests" / "golden"))
        try:
            from generate import generate
            generate(REFERENCE, npz.parent, pair)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"cannot generate goldens: {e}")
        finally:
            sys.path.pop(0)
    return np.load(npz)


@pytest.fixture(scope="session")
def goldens(reference_dir):
    """Cone golden intermediate buffers from the (padded) reference C build.

    Auto-generated on first use; requires gcc + the reference tree.
    """
    return _load_goldens("cone")


@pytest.fixture(scope="session")
def load_goldens(reference_dir):
    """Per-pair golden loader (cone / Cloth3 / Wood2)."""
    return _load_goldens


@pytest.fixture(scope="session")
def small_pair(cone_pair):
    """A cropped pair for fast exact-equality tests (full DP structure,
    ~20x less work)."""
    left, right = cone_pair
    return left[:96, :160].copy(), right[:96, :160].copy()
