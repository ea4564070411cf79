"""Metrics tests: exact HV vs hand-computed + Monte-Carlo oracles, native/
Python parity, GD/IGD/Spread/Coverage semantics, Tchebycheff ranking
(SURVEY.md §4 tier 3 golden-value strategy)."""

import numpy as np
import pandas as pd
import pytest

from cmoop_audio_processing_tpu.metrics import hypervolume as H
from cmoop_audio_processing_tpu.metrics import quality as Q
from cmoop_audio_processing_tpu.metrics.tchebycheff import rank_front


# --- Hypervolume -------------------------------------------------------------

def test_hv2d_single_point():
    assert H.hypervolume([[0.0, 0.0]], [1.0, 1.0]) == pytest.approx(1.0)
    assert H.hypervolume([[0.5, 0.5]], [1.0, 1.0]) == pytest.approx(0.25)


def test_hv2d_staircase_hand_computed():
    pts = [[0.0, 0.75], [0.25, 0.5], [0.5, 0.25], [0.75, 0.0]]
    # union of boxes to ref (1,1): 4 steps of 0.25 width with heights
    # 0.25/0.5/0.75/1.0 = 0.25*(0.25+0.5+0.75+1.0) = 0.625
    assert H.hypervolume(pts, [1.0, 1.0]) == pytest.approx(0.625)


def test_hv_dominated_and_duplicate_points_no_extra():
    base = [[0.2, 0.2]]
    withdup = [[0.2, 0.2], [0.2, 0.2], [0.5, 0.5], [0.9, 0.3]]
    r = [1.0, 1.0]
    assert H.hypervolume(withdup, r) == pytest.approx(H.hypervolume(base, r))


def test_hv_point_outside_ref_ignored():
    assert H.hypervolume([[2.0, 0.1], [0.5, 0.5]], [1.0, 1.0]) == pytest.approx(0.25)
    assert H.hypervolume([[2.0, 2.0]], [1.0, 1.0]) == 0.0


def test_hv3d_single_point():
    assert H.hypervolume([[0.0, 0.0, 0.0]], [1.0, 1.0, 1.0]) == pytest.approx(1.0)
    assert H.hypervolume([[0.5, 0.5, 0.5]], [2.0, 2.0, 2.0]) == pytest.approx(1.5 ** 3)


def test_hv3d_two_disjoint_boxes_inclusion_exclusion():
    pts = [[0.0, 0.5, 0.5], [0.5, 0.0, 0.5]]
    r = [1.0, 1.0, 1.0]
    # each box: 1*0.5*0.5=0.25; overlap box max(p1,p2)=(0.5,0.5,0.5): 0.125
    assert H.hypervolume(pts, r) == pytest.approx(0.25 + 0.25 - 0.125)


def _mc_hv(pts, ref, n=200_000, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.asarray(pts)
    ref = np.asarray(ref)
    lo = pts.min(axis=0)
    samples = lo + rng.random((n, pts.shape[1])) * (ref - lo)
    dominated = np.zeros(n, dtype=bool)
    for p in pts:
        dominated |= np.all(samples >= p, axis=1)
    return dominated.mean() * np.prod(ref - lo)


@pytest.mark.parametrize("d", [2, 3])
def test_hv_monte_carlo_oracle(d):
    rng = np.random.default_rng(42)
    pts = rng.random((12, d))
    ref = np.ones(d) * 1.1
    exact = H.hypervolume(pts, ref)
    approx = _mc_hv(pts, ref)
    assert exact == pytest.approx(approx, rel=0.02)


def test_hv3d_degenerate_fronts_fuzz_vs_mc():
    """3-D fuzz over deliberately degenerate fronts — duplicates, collinear
    points, axis-tied coordinates, points outside the box — at 1e-3 relative
    vs a large Monte-Carlo oracle (and exactly vs the WFG recursion)."""
    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(2, 12))
        pts = rng.random((n, 3))
        # inject degeneracies
        pts[rng.integers(n)] = pts[rng.integers(n)]  # duplicate
        k = rng.integers(n)
        pts[k, rng.integers(3)] = pts[rng.integers(n), rng.integers(3)]  # tie
        a, b = pts[rng.integers(n)], pts[rng.integers(n)]
        pts[rng.integers(n)] = (a + b) / 2  # collinear
        if trial % 3 == 0:
            pts[rng.integers(n)] += 1.5  # outside the reference box
        # snap to a coarse grid so coordinate ties are common
        pts = np.round(pts * 8) / 8
        ref = np.ones(3) * 1.0625
        exact = H.hypervolume(pts, ref)
        assert exact == pytest.approx(
            H._hv_wfg(pts, ref), rel=1e-12, abs=1e-15
        )
        approx = _mc_hv(pts, ref, n=400_000, seed=int(trial))
        assert exact == pytest.approx(approx, rel=1e-3, abs=2e-3)


def test_wfg_large_front_warns():
    rng = np.random.default_rng(5)
    pts = rng.random((H._WFG_WARN_SIZE + 2, 4)) * 0.5  # all inside the box
    with pytest.warns(RuntimeWarning, match="exponential-time"):
        H._hv_wfg(pts, np.ones(4))


def test_hv3d_matches_wfg_recursion():
    rng = np.random.default_rng(3)
    for trial in range(10):
        pts = rng.random((int(rng.integers(1, 10)), 3))
        ref = np.ones(3) * (1.0 + rng.random())
        assert H._hv3d(pts, ref) == pytest.approx(H._hv_wfg(pts, ref), rel=1e-12)


def test_hv_4d_wfg_vs_mc():
    rng = np.random.default_rng(9)
    pts = rng.random((6, 4))
    ref = np.ones(4) * 1.1
    assert H.hypervolume(pts, ref) == pytest.approx(_mc_hv(pts, ref), rel=0.03)


def test_native_python_parity():
    from cmoop_audio_processing_tpu.native.build import build

    if not build():
        pytest.skip("no native toolchain")
    H._NATIVE_TRIED = False  # reset loader cache: .so may postdate first load
    lib = H._load_native()
    assert lib is not None, "libhv.so built but not loadable"
    rng = np.random.default_rng(11)
    for d in (2, 3):
        for _ in range(20):
            pts = rng.random((int(rng.integers(1, 40)), d))
            ref = np.ones(d) * (1.0 + rng.random())
            py = H._hv2d(pts, ref) if d == 2 else H._hv3d(pts, ref)
            nat = H.hypervolume(pts, ref)  # uses native when loaded
            assert nat == pytest.approx(py, rel=1e-14, abs=1e-15)


def test_reference_point_rule():
    f1 = np.array([[0.0, 1.0, 2.0]])
    f2 = np.array([[3.0, -1.0, 0.5]])
    r = H.reference_point([f1, f2])
    assert np.allclose(r, [3.001, 1.001, 2.001])


# --- GD / IGD / Spread / Coverage -------------------------------------------

def test_gd_igd_zero_when_front_is_true_front():
    front = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert Q.generational_distance(front, front) == 0.0
    assert Q.inverted_gd(front, front) == 0.0


def test_gd_is_rms_of_min_distances():
    true = np.array([[0.0, 0.0]])
    front = np.array([[3.0, 4.0], [0.0, 1.0]])  # dists 5 and 1
    assert Q.generational_distance(front, true) == pytest.approx(
        np.sqrt((25 + 1) / 2)
    )


def test_igd_penalizes_missing_coverage():
    true = np.array([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
    full = Q.inverted_gd(true, true)
    partial = Q.inverted_gd(np.array([[0.0, 1.0]]), true)
    assert full == 0.0 and partial > 0.0


def test_coverage():
    a = np.array([[0.0, 0.0]])
    b = np.array([[1.0, 1.0], [0.0, 0.0], [-1.0, 5.0]])
    # a dominates (1,1) only; (0,0) equal (no strict), (-1,5) incomparable
    assert Q.coverage_metric(a, b) == pytest.approx(1 / 3)
    assert Q.coverage_metric(b, a) == pytest.approx(0.0)


def test_true_front_union():
    f1 = np.array([[0.0, 1.0], [2.0, 2.0]])
    f2 = np.array([[1.0, 0.0], [0.5, 0.5]])
    tf = Q.true_front([f1, f2])
    assert sorted(map(tuple, tf)) == [(0.0, 1.0), (0.5, 0.5), (1.0, 0.0)]


def test_compare_fronts_end_to_end():
    rng = np.random.default_rng(0)
    fronts = {
        "A": np.column_stack(
            [0.9 + 0.05 * rng.random(8), 0.5 + rng.random(8), 0.05 * rng.random(8)]
        ),
        "B": np.column_stack(
            [0.8 + 0.05 * rng.random(6), 1.5 + rng.random(6), 0.1 * rng.random(6)]
        ),
    }
    rep = Q.compare_fronts(fronts)
    assert set(rep["hypervolume"]) == {"A", "B"}
    # A strictly better everywhere -> more hypervolume, full coverage of B
    assert rep["hypervolume"]["A"] > rep["hypervolume"]["B"]
    assert rep["coverage"]["C(A covers B)"] == 1.0
    assert rep["coverage"]["C(B covers A)"] == 0.0
    # true front is drawn entirely from A (A dominates all of B), so the
    # nondominated subset of A has GD contribution 0 and B's GD is positive.
    assert rep["gd"]["B"] > rep["gd"]["A"]
    nd_a = Q.true_front([Q.to_min_space(fronts["A"])])
    assert Q.generational_distance(nd_a, Q.true_front(
        [Q.to_min_space(fronts["A"]), Q.to_min_space(fronts["B"])]
    )) == pytest.approx(0.0)


def test_spread_self_front_is_one():
    # front == true front -> all d_i = 0, so numerator = denominator = df+dl
    # (distances to the per-axis min/max CORNER points, which lie off the
    # front). The notebook's spread therefore evaluates to exactly 1.0 for a
    # perfect front — matching the published 2_stage values of 1.000000
    # (BASELINE.md Spread rows).
    true = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert Q.spread_metric(true, true) == pytest.approx(1.0)
    true3 = np.array([[0.0, 1.0], [0.5, 0.5], [1.0, 0.0]])
    assert Q.spread_metric(true3, true3) == pytest.approx(1.0)
    # single point -> nan by definition
    assert np.isnan(Q.spread_metric(true[:1], true))


# --- Tchebycheff ranking -----------------------------------------------------

def test_tchebycheff_ranking():
    df = pd.DataFrame(
        {
            "Accuracy": [0.95, 0.90, 0.92],
            "Size_MB": [1.0, 0.5, 0.7],
            "FPR": [0.05, 0.08, 0.06],
            "filters": [16, 32, 64],
        }
    )
    out = rank_front(df)
    # z* = (0.05, 0.5, 0.05); scores: max(w*|f-z*|) with w=1/3
    # row0: max(0, 0.5, 0)/3 = 0.5/3; row1: max(0.05, 0, 0.03)/3 = 0.05/3
    # row2: max(0.03, 0.2, 0.01)/3 = 0.2/3 -> rank order: row1, row2, row0
    assert list(out.index) == [1, 2, 0]
    assert list(out["Rank"]) == [1, 2, 3]
    assert out["Tchebycheff Score"].iloc[0] == pytest.approx(0.05 / 3)


def test_tchebycheff_tie_shares_min_rank():
    df = pd.DataFrame(
        {"Accuracy": [0.9, 0.9, 0.8], "Size_MB": [1.0, 1.0, 0.0], "FPR": [0.1, 0.1, 0.2]}
    )
    out = rank_front(df)
    # rows 0 and 1 are identical -> tied score; z*=(0.1, 0.0, 0.1) gives
    # row2 score 0.1/3 (best), rows 0/1 score 1/3 -> ranks [1, 2, 2]
    assert sorted(out["Rank"]) == [1, 2, 2]
