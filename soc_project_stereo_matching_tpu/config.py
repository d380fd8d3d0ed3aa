"""Configuration dataclasses for the TPU-native SGM stereo engine.

The reference keeps its configuration in a C struct ``SGMOption``
(``SemiGlobalMatching/SemiGlobalMatching/SemiGlobalMatching.h:24-40``) filled
literally in ``main.c:48-65``, plus compile-time ``#define`` capacity caps
(``SemiGlobalMatching.h:14-19``).  Here the option struct becomes a frozen,
hashable dataclass so it can be passed as a static argument through ``jax.jit``
— the whole pipeline is traced once per configuration, never per frame.

Capacity is *not* statically capped: shapes are taken from the inputs and the
framework tiles over HBM (and over devices, see ``parallel/``) instead of
relying on fixed global buffers.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# Matches the reference's INVALID_FLOAT (SemiGlobalMatching.h:12): disparity
# values that fail validation are set to +inf.
INVALID_FLOAT = float("inf")


@dataclasses.dataclass(frozen=True)
class SGMOptions:
    """Field-for-field mirror of the reference ``SGMOption`` struct.

    Defaults reproduce the reference CLI configuration (``main.c:48-65``).
    """

    num_paths: int = 8                # 4 or 8 aggregation directions
    min_disparity: int = 0
    max_disparity: int = 64

    is_check_unique: bool = True
    uniqueness_ratio: float = 0.99

    is_check_lr: bool = True
    lrcheck_thres: float = 1.0

    is_remove_speckles: bool = True
    min_speckle_area: int = 50

    p1: int = 10
    p2_init: int = 150

    # --- framework-only knobs (no reference equivalent) ------------------
    # Median behaviour: the reference calls MedianFilter in place
    # (SGM_Match, SemiGlobalMatching.c:120) so later pixels read already
    # filtered neighbours.  ``median_inplace=True`` reproduces that raster
    # recurrence exactly on device via a t=2i+j wavefront
    # (ops/postprocess.median_filter_3x3_inplace) — ~2H+W sequential steps,
    # so it is the bit-parity mode; the TPU-native default stays the
    # standard out-of-place median (divergence between the two is
    # quantified in PARITY.md).
    median_inplace: bool = False

    def __post_init__(self) -> None:
        if self.min_disparity < 0:
            # the reference's min_disparity is uint16_t (SemiGlobalMatching.h
            # :28); negative values would also break the lane-roll LR check
            # (ops/postprocess.lr_check bounds its select by max_disparity)
            raise ValueError(
                f"min_disparity ({self.min_disparity}) must be >= 0")
        if self.max_disparity <= self.min_disparity:
            raise ValueError(
                f"max_disparity ({self.max_disparity}) must exceed "
                f"min_disparity ({self.min_disparity})"
            )
        if self.num_paths not in (4, 8):
            raise ValueError("num_paths must be 4 or 8")
        if self.p1 < 0 or self.p2_init < 0:
            raise ValueError("p1/p2_init must be non-negative")

    @property
    def disp_range(self) -> int:
        return self.max_disparity - self.min_disparity

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SGMOptions":
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"unknown SGMOptions fields: {sorted(unknown)}")
        return cls(**d)


# Reference CLI configuration, for convenience in tests/benchmarks.
REFERENCE_CLI_OPTIONS = SGMOptions()


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Execution configuration for the TPU engine (no reference equivalent:
    the reference hardcodes everything at compile time)."""

    # Use Pallas TPU kernels for the hot ops; False falls back to the pure
    # jnp implementations (used on CPU test meshes).
    use_pallas: bool = True

    # Spatial tiling across devices (see parallel/tiles.py):
    #  'none'      : whole image per device
    #  'exact'     : H-tiles, K-round chained cross-tile scan carries
    #  'pipelined' : H-tiles, exact, microbatch wavefront through the ring
    #  'local'     : H-tiles with tile-local path restarts (overlap SGM)
    tile_mode: str = "none"

    # Diagonal path geometry (see ops/aggregation.py):
    #  'wrap'    : the reference's mod-W edge-wrapping diagonals (default)
    #  'restart' : standard SGM — paths restart at image edges
    diagonal_mode: str = "wrap"

    # Run the DP-scan recurrence in packed int16 vregs (bit-equal by range
    # analysis + tests, see ops/pallas_kernels._scan_group_kernel).  Only
    # affects the Pallas path.
    compute16: bool = False

    def __post_init__(self) -> None:
        if self.tile_mode not in ("none", "exact", "pipelined", "local"):
            raise ValueError(f"unknown tile_mode {self.tile_mode!r}")
        if self.diagonal_mode not in ("wrap", "restart"):
            raise ValueError(f"unknown diagonal_mode {self.diagonal_mode!r}")


def load_yaml_config(path) -> Tuple[SGMOptions, EngineConfig]:
    """Load ``{sgm: {...}, engine: {...}}`` YAML into config dataclasses.

    The reference has no config files at all (constants + struct literals,
    SURVEY.md section 5); this is the framework's YAML/CLI layer."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    opts = SGMOptions.from_dict(raw.get("sgm", {}))
    eng_raw = dict(raw.get("engine", {}))
    known = {f.name for f in dataclasses.fields(EngineConfig)}
    unknown = set(eng_raw) - known
    if unknown:
        raise ValueError(f"unknown EngineConfig fields: {sorted(unknown)}")
    return opts, EngineConfig(**eng_raw)


def save_yaml_config(path, options: SGMOptions,
                     engine: EngineConfig = EngineConfig()) -> None:
    import yaml

    with open(path, "w") as f:
        yaml.safe_dump(
            {"sgm": dataclasses.asdict(options),
             "engine": dataclasses.asdict(engine)}, f, sort_keys=False)
