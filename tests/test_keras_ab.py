"""Pins the committed Keras-vs-engine A/B oracle (examples/keras_ab.json,
produced by examples/run_keras_ab.py: the reference's ACTUAL
compile+fit+EarlyStopping evaluator, sa_nsga_penalty.py:205-229, head to
head with engine/ on the shared synthetic dataset).

Asserted contract (VERDICT r2 directive #1):
* per-(genome, template): mean accuracies agree within a distributional
  band of max(2 x pooled seed sigma, ACC_FLOOR) — the engines differ
  legitimately in shuffle streams/padded final batch (trainer.py docstring
  'Deviation'), so seed-level equality is not expected, distribution-level
  agreement is;
* the genome RANKING by accuracy matches (Spearman >= 0.9) — the search
  only consumes relative fitness, so ranking fidelity is what transfers
  Pareto fronts;
* macro-FPR stays in the same band per genome.
"""

import json
import os

import numpy as np
import pytest

AB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "keras_ab.json",
)
ACC_FLOOR = 0.02  # two val-set percentage points; 500-sample val quantum .002
FPR_FLOOR = 0.02

pytestmark = pytest.mark.skipif(
    not os.path.exists(AB_PATH), reason="keras_ab.json not generated"
)


@pytest.fixture(scope="module")
def report():
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
    n = report["n_genomes"] * 2 * len(report["seeds"])
    assert len(report["results"]) == n
    assert report["epochs"] >= 25 and len(report["seeds"]) >= 3


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


def _spearman(a, b):
    ar = np.argsort(np.argsort(a)).astype(float)
    br = np.argsort(np.argsort(b)).astype(float)
    ar -= ar.mean()
    br -= br.mean()
    return float((ar * br).sum() / np.sqrt((ar ** 2).sum() * (br ** 2).sum()))


def test_genome_ranking_matches(report):
    """Spearman >= 0.9 on per-(genome, template) mean accuracy — the search
    consumes relative fitness, so ranking fidelity is what transfers."""
    groups = _by_genome(report)
    keras_means = [np.mean(g["keras_acc"]) for g in groups.values()]
    ours_means = [np.mean(g["ours_acc"]) for g in groups.values()]
    rho = _spearman(np.array(keras_means), np.array(ours_means))
    assert rho >= 0.9, f"Spearman {rho:.3f} < 0.9"
