"""EA core unit + property tests on hand-built populations with known fronts
(SURVEY.md §4 tiers 1-2)."""

import random

import numpy as np
import pytest

from cmoop_audio_processing_tpu.algorithms import ea
from cmoop_audio_processing_tpu.core.config import Constraints, PenaltySchedule
from cmoop_audio_processing_tpu.core.genome import all_genomes
from cmoop_audio_processing_tpu.core.records import make_individual


def ind(objs, cv=0.0):
    return {"hparams": {}, "objs": list(objs), "CV": cv}


def test_dominates_basic():
    a, b = ind([1.0, 1.0]), ind([2.0, 2.0])
    assert ea.dominates(a, b, 1.0)
    assert not ea.dominates(b, a, 1.0)
    # equal -> no strict domination either way
    assert not ea.dominates(a, ind([1.0, 1.0]), 1.0)
    # partial trade-off -> incomparable
    assert not ea.dominates(ind([1.0, 3.0]), ind([2.0, 2.0]), 1.0)


def test_dominates_penalty_flips_order():
    # b has better objectives but a large CV; with big lambda, a dominates.
    a = ind([1.0, 1.0], cv=0.0)
    b = ind([0.5, 0.5], cv=1.0)
    assert not ea.dominates(a, b, 0.1)
    assert ea.dominates(b, a, 0.1)
    assert ea.dominates(a, b, 10.0)


def test_nds_known_fronts():
    pop = [
        ind([1, 5]),  # front 0
        ind([5, 1]),  # front 0
        ind([2, 6]),  # dominated by 0
        ind([6, 2]),  # dominated by 1
        ind([7, 7]),  # dominated by all above
    ]
    fronts = ea.fast_non_dominated_sort(pop, lam=1.0)
    assert fronts == [[0, 1], [2, 3], [4]]


def test_nds_matches_bruteforce_property():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(3, 25))
        m = int(rng.integers(2, 4))
        objs = rng.random((n, m))
        cvs = np.where(rng.random(n) < 0.5, 0.0, rng.random(n))
        pop = [ind(objs[i], cvs[i]) for i in range(n)]
        lam = float(rng.random() * 10)
        fronts = ea.fast_non_dominated_sort(pop, lam)
        # front 0 == brute-force nondominated set under penalized objectives
        pen = objs + lam * cvs[:, None]
        brute = set(np.nonzero(ea.nondominated_mask(pen))[0].tolist())
        assert set(fronts[0]) == brute
        # fronts partition the population
        flat = [i for f in fronts for i in f]
        assert sorted(flat) == list(range(n))


def test_crowding_boundaries_inf():
    pop = [ind([0, 4]), ind([1, 3]), ind([2, 2]), ind([3, 1]), ind([4, 0])]
    d = ea.crowding_distance([0, 1, 2, 3, 4], pop)
    assert d[0] == float("inf") and d[4] == float("inf")
    # interior symmetric points have equal finite distance
    assert d[1] == pytest.approx(d[3])
    assert np.isfinite(d[1]) and np.isfinite(d[2])


def test_crowding_degenerate_range_skipped():
    # all identical along objective 0 -> that objective contributes nothing
    pop = [ind([1, 0]), ind([1, 1]), ind([1, 2])]
    d = ea.crowding_distance([0, 1, 2], pop)
    assert d[0] == float("inf") and d[2] == float("inf")
    assert d[1] == pytest.approx(1.0)  # normalized gap (2-0)/2 from objective 1


def test_tournament_first_wins_ties():
    pop = [ind([1, 2]), ind([2, 1])]  # incomparable
    rng = random.Random(0)
    winners = {ea.tournament_selection(pop, 1.0, rng) for _ in range(50)}
    assert winners == {0, 1}  # both can win depending on draw order
    # dominated individual can never beat the dominator when both drawn
    pop2 = [ind([5, 5]), ind([1, 1])]
    for _ in range(50):
        w = ea.tournament_selection(pop2, 1.0, rng)
        assert w in (0, 1)
        # if 0 was drawn first and 1 second, 1 dominates -> 1 wins; 1 first
        # always wins. So over many draws, 0 must never win... unless drawn
        # alone, impossible with k=2 distinct. Hence:
        assert w == 1


def test_crossover_swaps_genes_only():
    rng = random.Random(1)
    g1 = all_genomes()[0]
    g2 = all_genomes()[-1]
    c1, c2 = ea.crossover(g1, g2, rng)
    for k in g1:
        assert {c1[k], c2[k]} == {g1[k], g2[k]} or (c1[k] == g2[k] and c2[k] == g1[k])


def test_mutate_stays_in_space():
    rng = random.Random(2)
    g = all_genomes()[100]
    for _ in range(100):
        m = ea.mutate(g, rng, 0.5)
        from cmoop_audio_processing_tpu.core.genome import validate
        validate(m)


def test_make_offspring_counts():
    rng = random.Random(0)
    pop = [ind([i, -i]) for i in range(7)]
    for p in pop:
        p["hparams"] = all_genomes()[0]
    for pairing in ("adjacent", "resample"):
        off = ea.make_offspring(pop, list(range(7)), rng, pairing=pairing, pop_size=7)
        assert len(off) == 7


def test_environmental_selection_elitism():
    # best front must survive; truncation keeps boundary (inf-crowding) points
    pop = [ind([0, 4]), ind([4, 0]), ind([1, 1]), ind([2, 2]), ind([3, 3]), ind([5, 5])]
    sel = ea.environmental_selection(pop, 3, lam=1.0)
    objs = [tuple(s["objs"]) for s in sel]
    assert (0, 4) in objs and (4, 0) in objs and (1, 1) in objs


def test_extract_final_pareto_filters_feasible():
    pop = [
        ind([1, 1], cv=0.5),  # infeasible, best objs
        ind([2, 3], cv=0.0),
        ind([3, 2], cv=0.0),
        ind([4, 4], cv=0.0),  # dominated
    ]
    front = ea.extract_final_pareto(pop, 50.0)
    assert len(front) == 2
    assert all(f["CV"] == 0 for f in front)


def test_penalty_schedule():
    sched = PenaltySchedule()
    assert sched.lam(0, 30) == pytest.approx(1.0)
    assert sched.lam(29, 30) == pytest.approx(50.0)
    # linear midpoint (gen 14.5 not integral; check gen 15)
    assert sched.lam(15, 30) == pytest.approx(1.0 + 15 / 29 * 49)
    assert PenaltySchedule(final_sort_multiplier=100.0).final_sort_lambda == 5000.0


def test_constraints_cv():
    c = Constraints(0.9, 2.5, 0.09)
    assert c.violation(0.95, 2.0, 0.05) == 0.0
    assert c.violation(0.85, 3.0, 0.10) == pytest.approx(0.05 + 0.5 + 0.01)
    # disabled constraint contributes nothing (bi-objective variants)
    c2 = Constraints(0.9, 2.5, None)
    assert c2.violation(0.95, 2.0, 0.5) == 0.0


def test_make_individual_objective_subsets():
    c = Constraints(0.9, 2.5, None)
    r = make_individual({"x": 1}, 0.95, 1.5, 0.2, c, objectives=("acc", "size"))
    assert r["objs"] == [-0.95, 1.5]
    assert r["metrics"]["fpr"] == 0.2
    assert r["CV"] == 0.0
