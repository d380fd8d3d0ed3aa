"""Golden parity: the numpy oracle vs the compiled reference C.

These tests pin the bit-exact contract.  The goldens come from the padded
reference build (tests/golden/generate.py) whose observable behaviour equals
the reference's in-bounds semantics — see the OOB analysis in
``oracle._walk_diagonal``'s docstring.
"""

import numpy as np
import pytest

from soc_project_stereo_matching_tpu import SGMOptions, oracle

OPTS = SGMOptions(median_inplace=True)


def _disp_equal(a, b):
    return np.all((a == b) | (np.isinf(a) & np.isinf(b)))


@pytest.mark.golden
def test_census_exact(cone_pair, goldens):
    left, right = cone_pair
    assert np.array_equal(oracle.census_5x5(left), goldens["census_left"])
    assert np.array_equal(oracle.census_5x5(right), goldens["census_right"])


@pytest.mark.golden
def test_cost_volume_exact(cone_pair, goldens):
    left, right = cone_pair
    cl, cr = oracle.census_5x5(left), oracle.census_5x5(right)
    cost = oracle.hamming_cost_volume(cl, cr, OPTS.min_disparity, OPTS.max_disparity)
    assert np.array_equal(cost, goldens["cost_init"])


@pytest.fixture(scope="module")
def golden_walk_aggr(cone_pair, goldens):
    left, right = cone_pair
    cl, cr = oracle.census_5x5(left), oracle.census_5x5(right)
    cost = oracle.hamming_cost_volume(cl, cr, OPTS.min_disparity, OPTS.max_disparity)
    return oracle.aggregate_paths_reference_walk(cost, left, OPTS)


@pytest.mark.golden
@pytest.mark.slow
def test_aggregation_reference_walk_exact(golden_walk_aggr, goldens):
    assert np.array_equal(golden_walk_aggr, goldens["cost_aggr"])


@pytest.mark.golden
@pytest.mark.slow
def test_wta_and_postprocessing_exact(golden_walk_aggr, goldens):
    aggr = golden_walk_aggr
    disp_r = oracle.compute_disparity(aggr, OPTS, inverse=True)
    assert _disp_equal(disp_r, goldens["disp_right"])

    disp_l = oracle.compute_disparity(aggr, OPTS, inverse=False)
    disp_l = oracle.lr_check(disp_l, disp_r, OPTS.lrcheck_thres)
    disp_l = oracle.remove_speckles(disp_l, 1.0, OPTS.min_speckle_area)
    disp_l = oracle.median_filter_3x3(disp_l, inplace=True)
    assert _disp_equal(disp_l, goldens["disp_left_full"])


@pytest.mark.golden
@pytest.mark.slow
def test_wta_median_only_exact(golden_walk_aggr, goldens):
    """Run B golden: LR check and speckle removal disabled."""
    disp = oracle.compute_disparity(golden_walk_aggr, OPTS, inverse=False)
    disp = oracle.median_filter_3x3(disp, inplace=True)
    assert _disp_equal(disp, goldens["disp_left_wta_median"])


@pytest.mark.golden
def test_lr_median_exact(cone_pair, goldens, golden_walk_aggr):
    """Run A golden (LR on, speckle off): pins the LR stage in isolation —
    including the float32-subtraction threshold semantics (LRCheck computes
    ``fabs((float)(disp - disp_r))``, SemiGlobalMatching.c:461)."""
    aggr = golden_walk_aggr
    disp_r = oracle.compute_disparity(aggr, OPTS, inverse=True)
    disp_l = oracle.compute_disparity(aggr, OPTS, inverse=False)
    disp_l = oracle.lr_check(disp_l, disp_r, OPTS.lrcheck_thres)
    disp_l = oracle.median_filter_3x3(disp_l, inplace=True)
    assert _disp_equal(disp_l, goldens["disp_left_lr_median"])


@pytest.mark.golden
@pytest.mark.slow
@pytest.mark.parametrize("pair,images", [
    ("Cloth3", ("view1.png", "view5.png")),
    ("Wood2", ("view1.png", "view5.png")),
])
def test_big_pair_chain_exact(reference_dir, load_goldens, pair, images):
    """Cloth3/Wood2 goldens (the other two pairs whose outputs the
    reference checks in, ``Data/{Cloth3,Wood2}/view1.png.d.png``): the full
    oracle chain is bit-equal at sizes 2x beyond the reference's static
    450x375 capacity.  No full-pipeline (speckle) golden exists at this
    size — the reference's RemoveSpeckles stack arrays overflow there
    (see tests/golden/gen_golden.c header); Wood2's LR stage is what
    caught the float32-threshold semantics (oracle.lr_check docstring)."""
    from soc_project_stereo_matching_tpu.data.imageio import load_image_gray_stb

    base = reference_dir / "SemiGlobalMatching" / "Data" / pair
    left = load_image_gray_stb(base / images[0])
    right = load_image_gray_stb(base / images[1])
    g = load_goldens(pair)

    cl, cr = oracle.census_5x5(left), oracle.census_5x5(right)
    assert np.array_equal(cl, g["census_left"])
    assert np.array_equal(cr, g["census_right"])
    cost = oracle.hamming_cost_volume(cl, cr, OPTS.min_disparity,
                                      OPTS.max_disparity)
    assert np.array_equal(cost, g["cost_init"])
    aggr = oracle.aggregate_paths_reference_walk(cost, left, OPTS)
    assert np.array_equal(aggr, g["cost_aggr"])

    disp_r = oracle.compute_disparity(aggr, OPTS, inverse=True)
    assert _disp_equal(disp_r, g["disp_right"])
    disp_l = oracle.compute_disparity(aggr, OPTS, inverse=False)
    lr = oracle.lr_check(disp_l, disp_r, OPTS.lrcheck_thres)
    assert _disp_equal(oracle.median_filter_3x3(lr, inplace=True),
                       g["disp_left_lr_median"])
    assert _disp_equal(oracle.median_filter_3x3(disp_l, inplace=True),
                       g["disp_left_wta_median"])


@pytest.mark.golden
@pytest.mark.slow
def test_clean_wrap_mode_close_to_reference(cone_pair, goldens):
    """The production aggregation (mod-W wrapping diagonals, reference bug
    fixed) must stay close to the buggy reference output: the divergence is
    confined to post-wrap diagonal path segments."""
    left, right = cone_pair
    out = oracle.sgm_match(left, right, OPTS, return_intermediates=True)
    aggr_same = (out["cost_aggr"] == goldens["cost_aggr"]).mean()
    assert aggr_same > 0.97

    disp, gold = out["disp_left"], goldens["disp_left_full"]
    validity_agree = (np.isinf(disp) == np.isinf(gold)).mean()
    assert validity_agree > 0.995
    both = np.isfinite(disp) & np.isfinite(gold)
    frac_big = (np.abs(disp[both] - gold[both]) > 1.0).mean()
    assert frac_big < 1e-3
