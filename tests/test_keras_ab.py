"""Pins the committed Keras-vs-engine A/B oracles (examples/keras_ab.json
and examples/keras_ab_birdclef.json, produced by examples/run_keras_ab.py:
the reference's ACTUAL compile+fit+EarlyStopping evaluator,
sa_nsga_penalty.py:205-229, head to head with engine/ on a shared dataset
— synthetic GSC-v2-shaped 44x13 for the KWS report, the real 501x40
wav->h5 corpus for the BirdCLEF one).

Asserted contract (VERDICT r2 directive #1, widened per r3 directive #7):
* per-(genome, template): mean accuracies agree within a distributional
  band of max(2 x pooled seed sigma, ACC_FLOOR) — the engines differ
  legitimately in shuffle streams/padded final batch (trainer.py docstring
  'Deviation'), so seed-level equality is not expected, distribution-level
  agreement is;
* the genome RANKING matches on accuracy AND on macro-FPR (tie-aware
  Spearman >= 0.9) — the search only consumes relative fitness, so
  ranking fidelity on every searched objective is what transfers Pareto
  fronts;
* macro-FPR stays in the same band per genome;
* the KWS report covers the search-space boundary (the biggest program,
  the smallest, and the off-diagonal width/depth extremes), not just a
  diverse interior slice.
"""

import json
import os

import numpy as np
import pytest

_EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
AB_PATH = os.path.join(_EXAMPLES, "keras_ab.json")
AB_BIRDCLEF_PATH = os.path.join(_EXAMPLES, "keras_ab_birdclef.json")
ACC_FLOOR = 0.02  # two val-set percentage points; 500-sample val quantum .002
FPR_FLOOR = 0.02

# The four search-space boundary genomes the KWS report must include
# (examples/run_keras_ab.py BOUNDARY_GENOMES; VERDICT r3 directive #7).
BOUNDARY = [
    {"filters": 64, "kernel_size": 5, "use_bn": True,
     "residual_blocks": 3, "fc_layers": 4, "use_dropout": True},
    {"filters": 16, "kernel_size": 3, "use_bn": False,
     "residual_blocks": 1, "fc_layers": 1, "use_dropout": False},
    {"filters": 64, "kernel_size": 3, "use_bn": False,
     "residual_blocks": 1, "fc_layers": 4, "use_dropout": False},
    {"filters": 16, "kernel_size": 5, "use_bn": True,
     "residual_blocks": 3, "fc_layers": 1, "use_dropout": True},
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(AB_PATH), reason="keras_ab.json not generated"
)

_REPORTS = [p for p in (AB_PATH, AB_BIRDCLEF_PATH) if os.path.exists(p)]


@pytest.fixture(scope="module", params=_REPORTS,
                ids=[os.path.basename(p) for p in _REPORTS])
def report(request):
    with open(request.param) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def kws_report():
    with open(AB_PATH) as f:
        return json.load(f)


def _by_genome(report):
    """group results -> {(genome_key, template): {'keras': [...], 'ours': [...]}}"""
    groups = {}
    for r in report["results"]:
        key = (tuple(sorted(r["genome"].items())), r["template"])
        g = groups.setdefault(key, {"keras_acc": [], "ours_acc": [],
                                    "keras_fpr": [], "ours_fpr": []})
        g["keras_acc"].append(r["keras"]["acc"])
        g["ours_acc"].append(r["ours"]["acc"])
        g["keras_fpr"].append(r["keras"]["fpr"])
        g["ours_fpr"].append(r["ours"]["fpr"])
    return groups


def test_report_shape(report):
    n = report["n_genomes"] * len(report.get("templates", ["A", "B"])) \
        * len(report["seeds"])
    assert len(report["results"]) == n
    assert report["epochs"] >= 25 and len(report["seeds"]) >= 3


def test_kws_report_covers_search_space_boundary(kws_report):
    """>= 12 genomes, including all four boundary genomes (the 64-filter/
    3-block/4-FC maximal program, the 16/1/1 all-flags-off minimal one,
    and the two width/depth off-diagonal extremes)."""
    assert kws_report["n_genomes"] >= 12
    seen = {tuple(sorted(r["genome"].items()))
            for r in kws_report["results"]}
    missing = [b for b in BOUNDARY if tuple(sorted(b.items())) not in seen]
    assert not missing, f"boundary genomes absent from the A/B: {missing}"


def test_per_genome_accuracy_band(report):
    """|mean_ours - mean_keras| <= max(2 * pooled seed sigma, ACC_FLOOR)."""
    failures = []
    for (gkey, template), g in _by_genome(report).items():
        ka, oa = np.array(g["keras_acc"]), np.array(g["ours_acc"])
        pooled = np.sqrt((ka.var(ddof=1) + oa.var(ddof=1)) / 2)
        band = max(2 * pooled, ACC_FLOOR)
        diff = abs(ka.mean() - oa.mean())
        if diff > band:
            failures.append((template, dict(gkey), round(diff, 4),
                             round(band, 4)))
    assert not failures, f"accuracy bands violated: {failures}"


def test_per_genome_fpr_band(report):
    failures = []
    for (gkey, template), g in _by_genome(report).items():
        kf, of = np.array(g["keras_fpr"]), np.array(g["ours_fpr"])
        pooled = np.sqrt((kf.var(ddof=1) + of.var(ddof=1)) / 2)
        band = max(2 * pooled, FPR_FLOOR)
        diff = abs(kf.mean() - of.mean())
        if diff > band:
            failures.append((template, dict(gkey), round(diff, 4),
                             round(band, 4)))
    assert not failures, f"FPR bands violated: {failures}"


def _avg_ranks(x):
    """Average ranks with ties shared — the boundary genomes saturate
    (acc 1.0 / FPR 0.0 on both engines), so plain argsort ranks would
    order ties arbitrarily and poison the correlation."""
    x = np.asarray(x, dtype=float)
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x))
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2.0
        i = j + 1
    return ranks


def _spearman(a, b):
    ar, br = _avg_ranks(a), _avg_ranks(b)
    ar -= ar.mean()
    br -= br.mean()
    return float((ar * br).sum() / np.sqrt((ar ** 2).sum() * (br ** 2).sum()))


def test_genome_ranking_matches(report):
    """Spearman >= 0.9 on per-(genome, template) mean accuracy — the search
    consumes relative fitness, so ranking fidelity is what transfers."""
    groups = _by_genome(report)
    if len(groups) < 4:
        pytest.skip("too few genome groups for a meaningful rank correlation")
    keras_means = [np.mean(g["keras_acc"]) for g in groups.values()]
    ours_means = [np.mean(g["ours_acc"]) for g in groups.values()]
    rho = _spearman(np.array(keras_means), np.array(ours_means))
    assert rho >= 0.9, f"accuracy Spearman {rho:.3f} < 0.9"


def test_genome_fpr_ranking_matches(report):
    """Same ranking fidelity on the macro-FPR objective (VERDICT r3 #7):
    FPR is a searched objective too, so its relative ordering must
    transfer, not just accuracy's."""
    groups = _by_genome(report)
    if len(groups) < 4:
        pytest.skip("too few genome groups for a meaningful rank correlation")
    keras_means = [np.mean(g["keras_fpr"]) for g in groups.values()]
    ours_means = [np.mean(g["ours_fpr"]) for g in groups.values()]
    rho = _spearman(np.array(keras_means), np.array(ours_means))
    assert rho >= 0.9, f"FPR Spearman {rho:.3f} < 0.9"
