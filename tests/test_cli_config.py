"""CLI, YAML config, and profiling-utility tests."""

import numpy as np
import pytest
from PIL import Image

from soc_project_stereo_matching_tpu import SGMOptions
from soc_project_stereo_matching_tpu.config import (
    EngineConfig, load_yaml_config, save_yaml_config)


def test_yaml_roundtrip(tmp_path):
    opts = SGMOptions(num_paths=4, max_disparity=32, p1=7)
    cfg = tmp_path / "cfg.yaml"
    save_yaml_config(cfg, opts, EngineConfig(tile_mode="exact"))
    opts2, eng2 = load_yaml_config(cfg)
    assert opts2 == opts
    assert eng2.tile_mode == "exact"


def test_yaml_rejects_unknown_fields(tmp_path):
    cfg = tmp_path / "bad.yaml"
    cfg.write_text("sgm:\n  nonsense: 1\n")
    with pytest.raises(ValueError, match="nonsense"):
        load_yaml_config(cfg)


def test_cli_match(tmp_path, capsys):
    from soc_project_stereo_matching_tpu.cli import main

    rng = np.random.default_rng(0)
    for name in ("l.png", "r.png"):
        Image.fromarray(
            rng.integers(0, 255, (32, 48), dtype=np.uint8), mode="L"
        ).save(tmp_path / name)
    out = tmp_path / "out.d.png"
    rc = main(["match", str(tmp_path / "l.png"), str(tmp_path / "r.png"),
               "-o", str(out), "--max-disparity", "16",
               "--min-speckle-area", "8"])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 48) and img.dtype == np.uint8
    assert "valid=" in capsys.readouterr().out


def test_cli_match_with_yaml_config(tmp_path):
    from soc_project_stereo_matching_tpu.cli import main

    rng = np.random.default_rng(1)
    for name in ("l.png", "r.png"):
        Image.fromarray(
            rng.integers(0, 255, (20, 40), dtype=np.uint8), mode="L"
        ).save(tmp_path / name)
    cfg = tmp_path / "cfg.yaml"
    save_yaml_config(cfg, SGMOptions(max_disparity=8, min_speckle_area=4,
                                     num_paths=4))
    out = tmp_path / "o.png"
    rc = main(["match", str(tmp_path / "l.png"), str(tmp_path / "r.png"),
               "-o", str(out), "--config", str(cfg)])
    assert rc == 0 and out.exists()


def test_engine_config_validation_and_diagonal_mode():
    import numpy as np
    import pytest

    from soc_project_stereo_matching_tpu import EngineConfig, SGMOptions
    from soc_project_stereo_matching_tpu.models.sgm import SGMEngine

    with pytest.raises(ValueError, match="tile_mode"):
        EngineConfig(tile_mode="bogus")
    with pytest.raises(ValueError, match="diagonal_mode"):
        EngineConfig(diagonal_mode="bogus")
    with pytest.raises(ValueError, match="min_disparity"):
        SGMOptions(min_disparity=-2)

    # diagonal_mode flows through the engine: both modes run and differ on
    # content where paths wrap image edges
    opts = SGMOptions(max_disparity=16, min_speckle_area=8)
    rng = np.random.default_rng(11)
    l = rng.integers(0, 256, (24, 64), dtype=np.uint8)
    r = rng.integers(0, 256, (24, 64), dtype=np.uint8)
    wrap = np.asarray(SGMEngine(opts, EngineConfig()).match(l, r))
    restart = np.asarray(
        SGMEngine(opts, EngineConfig(diagonal_mode="restart")).match(l, r))
    assert wrap.shape == restart.shape == l.shape
    assert not np.array_equal(
        np.nan_to_num(wrap, posinf=-1), np.nan_to_num(restart, posinf=-1))


def test_chained_time_and_stagetimer():
    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu.utils.profiling import (
        StageTimer, chained_time)

    dt = chained_time(lambda x: x * 2.0 + 1.0, jnp.ones((8, 8)), iters=3)
    assert dt > 0

    t = StageTimer()
    with t.span("a"):
        pass
    with t.span("a"):
        pass
    assert t.counts["a"] == 2
    assert "a" in t.report()
