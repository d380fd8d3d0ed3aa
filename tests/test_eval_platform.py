"""Evaluation-platform parity tests.

Where possible the framework's data/eval modules are cross-validated against
the reference's *own* Python modules (imported read-only from
/root/reference/HostScript_Server — never copied)."""

import importlib.util
import json
import sys

import numpy as np
import pytest

from soc_project_stereo_matching_tpu.data import calib as calib_mod
from soc_project_stereo_matching_tpu.data import datasets, pfm
from soc_project_stereo_matching_tpu.eval import metrics as M

CALIB_TEXT = """\
cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]
cam1=[3997.684 0 1307.839; 0 3997.684 1011.728; 0 0 1]
doffs=131.111
baseline=193.001
width=2964
height=1988
ndisp=280
"""


@pytest.fixture(scope="module")
def ref_host(reference_dir):
    """Import the reference HostScript_Server modules for cross-checks."""
    sys.path.insert(0, str(reference_dir / "HostScript_Server"))
    try:
        import stereo_calibration as ref_calib  # noqa: F401
        import depth_image as ref_depth  # noqa: F401
        yield {"calib": ref_calib, "depth": ref_depth}
    finally:
        sys.path.pop(0)
        for m in ("stereo_calibration", "depth_image", "stereo_image"):
            sys.modules.pop(m, None)


def test_calib_parse_and_pack_match_reference(tmp_path, ref_host):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TEXT)
    ours = calib_mod.StereoCalib.from_file(p)
    theirs = ref_host["calib"].StereoCalib(str(p))
    assert np.allclose(ours.cam0, theirs.cam0)
    assert np.allclose(ours.cam1, theirs.cam1)
    assert ours.doffs == theirs.doffs and ours.baseline == theirs.baseline
    assert ours.pack() == theirs.pack()


def test_calib_scaling_matches_reference(tmp_path, ref_host):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TEXT)
    ours = calib_mod.StereoCalib.from_file(p).scaled(1280, 720)
    theirs = ref_host["calib"].StereoCalib(str(p))
    theirs.scale_calib(1280, 720)
    assert np.allclose(ours.cam0, theirs.cam0)
    assert np.allclose(ours.doffs, theirs.doffs)
    assert (ours.width, ours.height) == (theirs.width, theirs.height)


def test_calib_unpack_roundtrip(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TEXT)
    c = calib_mod.StereoCalib.from_file(p)
    c2 = calib_mod.StereoCalib.unpack(c.pack(), c.width, c.height)
    assert np.allclose(c2.cam0, c.cam0) and np.allclose(c2.cam1, c.cam1)
    assert c2.doffs == pytest.approx(c.doffs, rel=1e-6)


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 300, (37, 53)).astype(np.float32)
    img[rng.uniform(size=img.shape) < 0.1] = np.inf
    path = tmp_path / "d.pfm"
    pfm.write_pfm(path, img)
    back = pfm.read_pfm(path)
    assert back.shape == img.shape
    assert np.array_equal(np.isinf(back), np.isinf(img))
    assert np.allclose(back[np.isfinite(img)], img[np.isfinite(img)])


def test_pfm_read_matches_reference_reader(tmp_path, ref_host):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 128, (24, 31)).astype(np.float32)
    path = tmp_path / "d.pfm"
    pfm.write_pfm(path, img)
    ours = pfm.read_pfm(path)
    theirs = ref_host["depth"].read_disp_image(str(path))
    assert np.array_equal(ours, theirs)


def test_compare_depth_matches_reference(ref_host):
    import logging
    rng = np.random.default_rng(2)
    gt = rng.uniform(500, 5000, (64, 64)).astype(np.float32)
    test = gt + rng.normal(0, 20, gt.shape).astype(np.float32)
    gt[rng.uniform(size=gt.shape) < 0.2] = np.nan
    test[rng.uniform(size=gt.shape) < 0.1] = np.nan
    rmse, bpr, n = ref_host["depth"].compare_img(gt, test, logging.getLogger())
    ours = M.compare_depth(gt, test)
    assert ours.rmse == pytest.approx(rmse, rel=1e-6)
    assert ours.bpr == pytest.approx(bpr, rel=1e-6)
    assert ours.n_valid == n


def test_compare_depth_jnp_matches_numpy():
    rng = np.random.default_rng(3)
    gt = rng.uniform(500, 5000, (48, 48)).astype(np.float32)
    test = gt + rng.normal(0, 30, gt.shape).astype(np.float32)
    gt[rng.uniform(size=gt.shape) < 0.2] = np.nan
    got = {k: float(v) for k, v in M.compare_depth_jnp(gt, test).items()}
    want = M.compare_depth(gt, test)
    assert got["rmse"] == pytest.approx(want.rmse, rel=1e-5)
    assert got["bpr"] == pytest.approx(want.bpr, rel=1e-6)
    assert int(got["n_valid"]) == want.n_valid


def test_depth_conversion_matches_reference(tmp_path, ref_host):
    p = tmp_path / "calib.txt"
    p.write_text(CALIB_TEXT)
    ours_c = calib_mod.StereoCalib.from_file(p)
    theirs_c = ref_host["calib"].StereoCalib(str(p))
    disp = np.random.default_rng(4).uniform(1, 200, (16, 16)).astype(np.float32)
    ours = M.disparity_to_depth(disp, ours_c, 0)
    theirs = ref_host["depth"].disparity_to_depth(disp, theirs_c, 0)
    assert np.allclose(ours, theirs, rtol=1e-6)


def test_depth_png16_matches_reference(tmp_path, ref_host):
    """save_depth_png16 reproduces convert_and_save_depth_image
    (depth_image.py:231-269) bit-for-bit, auto and explicit norm."""
    import logging

    import cv2

    from soc_project_stereo_matching_tpu.data.imageio import (
        load_depth_png16, save_depth_png16)

    rng = np.random.default_rng(7)
    depth = rng.uniform(500.0, 5000.0, (24, 32)).astype(np.float32)
    depth[3, 4] = np.nan
    depth[5, 6] = np.inf

    log = logging.getLogger("t")
    for kwargs in ({}, {"min_depth": 800.0, "max_depth": 4000.0}):
        ours_p = tmp_path / "ours.png"
        refs_p = tmp_path / "refs.png"
        lo, hi = save_depth_png16(ours_p, depth, **kwargs)
        rlo, rhi = ref_host["depth"].convert_and_save_depth_image(
            refs_p, depth.copy(), log, **kwargs)
        ours = load_depth_png16(ours_p)
        refs = cv2.imread(str(refs_p), cv2.IMREAD_UNCHANGED)
        assert ours.dtype == np.uint16 and refs.dtype == np.uint16
        assert np.array_equal(ours, refs), (kwargs, np.abs(
            ours.astype(int) - refs.astype(int)).max())
        assert np.isclose(lo, rlo) and np.isclose(hi, rhi)


def test_resize_depth_matches_cv2_nearest():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 100, (55, 83)).astype(np.float32)
    ours = M.resize_depth_nearest(img, 128, 72)
    theirs = cv2.resize(img, (128, 72), interpolation=cv2.INTER_NEAREST)
    assert np.array_equal(ours, theirs)


def test_dataset_discovery(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "b" / "calib.txt").write_text(CALIB_TEXT)
    (tmp_path / "c").mkdir()
    found = datasets.discover_datasets(tmp_path)
    assert found == [tmp_path / "a" / "b"]


def test_load_legacy_pair(reference_dir):
    pair = datasets.load_pair(
        reference_dir / "SemiGlobalMatching" / "Data" / "cone")
    assert pair.img_left.shape == (375, 450)
    assert pair.dmax == 64
    gt = pair.gt_disp_left
    fin = np.isfinite(gt)
    assert fin.mean() > 0.9 and gt[fin].max() < 64


def test_harness_batched_matches_per_pair(reference_dir, tmp_path):
    """run_batched (same-shape pairs through match_batch with prefetch)
    produces the same per-pair metrics as the per-pair run."""
    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.eval.harness import (
        EvaluationHarness, HarnessConfig)

    cone = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    folders = [cone, cone, cone]
    opts = SGMOptions(is_remove_speckles=False)
    cfg = HarnessConfig(max_disparity=64, batch_size=2,
                        stats_path=tmp_path / "b.json",
                        timing_iters=2, timing_repeats=1)
    stats_b = EvaluationHarness(opts, cfg).run_batched(folders)
    assert stats_b["total_frames"] == 3
    single = EvaluationHarness(opts, HarnessConfig(
        max_disparity=64, timing_iters=2, timing_repeats=1)).run(
        [cone])["measurements"][0]
    for m in stats_b["measurements"]:
        assert m["rmse_mm"] == single["rmse_mm"]
        assert m["bpr"] == single["bpr"]
        assert m["disp_bad3"] == single["disp_bad3"]
        assert m["duration_s"] > 0


def test_harness_batched_fully_resumed_renumbers(reference_dir, tmp_path):
    """A resumed batched run whose todo list is empty must still emit
    unique contiguous seq ids (the in-loop renumber never runs; the final
    write covers it)."""
    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.eval.harness import (
        EvaluationHarness, HarnessConfig)

    cone = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    stats_path = tmp_path / "b.json"
    opts = SGMOptions(is_remove_speckles=False)
    cfg = HarnessConfig(max_disparity=64, batch_size=2,
                        stats_path=stats_path,
                        timing_iters=2, timing_repeats=1)
    EvaluationHarness(opts, cfg).run_batched([cone, cone])

    # poison the stored seq ids, then resume with everything already done
    stored = json.loads(stats_path.read_text())
    for m in stored["measurements"]:
        m["seq"] = 7
    stats_path.write_text(json.dumps(stored))
    cfg2 = HarnessConfig(max_disparity=64, batch_size=2, resume=True,
                         stats_path=stats_path,
                         timing_iters=2, timing_repeats=1)
    stats = EvaluationHarness(opts, cfg2).run_batched([cone, cone])
    assert [m["seq"] for m in stats["measurements"]] == [0, 1]


def test_harness_end_to_end_and_resume(reference_dir, tmp_path):
    from soc_project_stereo_matching_tpu.eval.harness import (
        EvaluationHarness, HarnessConfig)
    from soc_project_stereo_matching_tpu import SGMOptions

    stats_path = tmp_path / "stats.json"
    h = EvaluationHarness(
        SGMOptions(is_remove_speckles=False),
        HarnessConfig(stats_path=stats_path, max_disparity=64,
                      timing_iters=2, timing_repeats=1),
    )
    folders = [reference_dir / "SemiGlobalMatching" / "Data" / "cone"]
    stats = h.run(folders)
    assert stats["total_frames"] == 1
    m = stats["measurements"][0]
    assert m["disp_bad3"] < 0.10 and m["n_valid"] > 0
    assert json.loads(stats_path.read_text())["fps"] > 0

    # resume: second run must reuse the stored measurement (no recompute)
    h2 = EvaluationHarness(
        SGMOptions(is_remove_speckles=False),
        HarnessConfig(stats_path=stats_path, resume=True, max_disparity=64,
                      timing_iters=2, timing_repeats=1),
    )
    stats2 = h2.run(folders)
    assert stats2["measurements"][0]["rmse_mm"] == m["rmse_mm"]
    assert stats2["measurements"][0]["duration_s"] == m["duration_s"]


def test_harness_resume_refuses_foreign_timing_methodology(
        reference_dir, tmp_path):
    """Resuming a stats file written under another timing definition
    (e.g. a pre-stamp wall-clock file) must refuse, not silently blend
    RTT-inclusive and RTT-cancelled durations (ADVICE r3)."""
    import pytest

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.eval.harness import (
        EvaluationHarness, HarnessConfig, TIMING_METHODOLOGY)

    cone = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    stats_path = tmp_path / "old.json"
    stats_path.write_text(json.dumps({
        "client": "x", "total_frames": 1, "total_time_s": 1.0, "fps": 1.0,
        "measurements": [{"name": "cone", "seq": 0, "duration_s": 1.0}],
    }))  # no timing_methodology field = old wall-clock definition
    cfg = HarnessConfig(max_disparity=64, resume=True, stats_path=stats_path,
                        timing_iters=2, timing_repeats=1)
    h = EvaluationHarness(SGMOptions(is_remove_speckles=False), cfg)
    with pytest.raises(ValueError, match="timing methodology"):
        h.run([cone])
    with pytest.raises(ValueError, match="timing methodology"):
        h.run_batched([cone])

    # an empty prior file is harmless regardless of its stamp
    stats_path.write_text(json.dumps({"measurements": []}))
    stats = h.run([cone])
    assert stats["timing_methodology"] == TIMING_METHODOLOGY


def test_harness_measure_retry_ladder(reference_dir, monkeypatch):
    """A transiently-failing measurement retries (after a backend
    re-probe) instead of killing the run; a persistent failure still
    raises after the configured attempts."""
    import pytest

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.eval import harness as H
    from soc_project_stereo_matching_tpu.utils import relay

    probes = []
    monkeypatch.setattr(relay, "wait_for_backend",
                        lambda max_wait_s=0, log=None: probes.append(1))

    import soc_project_stereo_matching_tpu.utils.profiling as prof

    real = prof.chained_match_time
    calls = []

    def flaky(match_fn, left, right, *, iters, repeats):
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError("UNAVAILABLE: relay blip")
        return real(match_fn, left, right, iters=iters, repeats=repeats)

    monkeypatch.setattr(prof, "chained_match_time", flaky)

    cone = reference_dir / "SemiGlobalMatching" / "Data" / "cone"
    h = H.EvaluationHarness(
        SGMOptions(is_remove_speckles=False),
        H.HarnessConfig(max_disparity=64, timing_iters=2, timing_repeats=1,
                        measure_retries=1))
    stats = h.run([cone])
    assert stats["total_frames"] == 1
    assert len(calls) == 2 and len(probes) == 1     # failed, probed, retried

    calls.clear()
    probes.clear()
    monkeypatch.setattr(
        prof, "chained_match_time",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("dead")))
    h2 = H.EvaluationHarness(
        SGMOptions(is_remove_speckles=False),
        H.HarnessConfig(max_disparity=64, timing_iters=2, timing_repeats=1,
                        measure_retries=2))
    with pytest.raises(RuntimeError, match="dead"):
        h2.run([cone])
    assert len(probes) == 2                          # probed between attempts


def test_kitti2015_layout(tmp_path):
    import numpy as np
    from PIL import Image

    from soc_project_stereo_matching_tpu.data.datasets import (
        discover_kitti, load_pair, load_pair_kitti)
    from soc_project_stereo_matching_tpu.eval.harness import (
        EvaluationHarness, HarnessConfig)
    from soc_project_stereo_matching_tpu import SGMOptions

    rng = np.random.default_rng(0)
    h, w = 24, 48
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (tmp_path / sub).mkdir()
    for fid in ("000000", "000001"):
        for sub in ("image_2", "image_3"):
            Image.fromarray(rng.integers(0, 255, (h, w), dtype=np.uint8),
                            mode="L").save(tmp_path / sub / f"{fid}_10.png")
        gt = rng.integers(0, 16 * 256, (h, w)).astype(np.uint16)
        gt[0, 0] = 0  # unknown marker
        Image.fromarray(gt, mode="I;16").save(
            tmp_path / "disp_occ_0" / f"{fid}_10.png")

    ids = discover_kitti(tmp_path)
    assert ids == ["000000", "000001"]
    pair = load_pair_kitti(tmp_path, "000000")
    assert pair.shape == (h, w) and pair.dmax == 192
    assert np.isnan(pair.gt_disp_left[0, 0])
    assert np.nanmax(pair.gt_disp_left) < 16.0

    # directory dispatch + harness run over explicit pairs
    assert load_pair(tmp_path).name == "kitti2015/000000"
    harness = EvaluationHarness(
        SGMOptions(min_speckle_area=8),
        HarnessConfig(max_disparity=16))
    stats = harness.run([load_pair_kitti(tmp_path, fid) for fid in ids])
    assert stats["total_frames"] == 2
    assert all(np.isfinite(m["disp_bad3"]) for m in stats["measurements"])


def test_chain_cache_releases_owners():
    """The chained-timing cache must not pin engines or plain callables:
    the cached chain (and the inner cache-dict key) may only reference its
    WeakKeyDictionary key weakly (ADVICE r2; extended to non-bound
    callables, whose leak rode the inner dict key)."""
    import gc
    import weakref

    import jax
    import jax.numpy as jnp

    from soc_project_stereo_matching_tpu import SGMOptions
    from soc_project_stereo_matching_tpu.models.sgm import SGMEngine
    from soc_project_stereo_matching_tpu.utils import profiling as prof

    l = np.zeros((1, 16, 32), np.uint8)
    r = np.ones((1, 16, 32), np.uint8)

    f = jax.jit(lambda a, b: jnp.abs(a.astype(jnp.float32) -
                                     b.astype(jnp.float32)))
    prof.chained_match_time(f, l, r, iters=2, repeats=1)
    wf = weakref.ref(f)
    del f
    gc.collect()
    assert wf() is None

    eng = SGMEngine(SGMOptions(max_disparity=16, min_speckle_area=4))
    prof.chained_match_time(eng.match_batch, l, r, iters=2, repeats=1)
    we = weakref.ref(eng)
    del eng
    gc.collect()
    assert we() is None
