"""End-to-end driver tests on the deterministic FakeEvaluator over the
enumerable 288-genome space (SURVEY.md §4 item 4: the reference-faithful
analogue of a fake backend). The exact Pareto set is computable, so these
are real correctness checks, not smoke tests."""

import os

import numpy as np
import pandas as pd
import pytest

from cmoop_audio_processing_tpu.algorithms import ea
from cmoop_audio_processing_tpu.algorithms.initializers import lhs_init, psi_init
from cmoop_audio_processing_tpu.algorithms.mobo import run_mobo
from cmoop_audio_processing_tpu.algorithms.nsga2 import run_nsga2
from cmoop_audio_processing_tpu.algorithms.sa_nsga2 import (
    run_sa_nsga2,
    select_infill_points,
)
from cmoop_audio_processing_tpu.core.config import (
    Constraints,
    MoboConfig,
    SearchConfig,
)
from cmoop_audio_processing_tpu.core.genome import (
    GENE_ORDER,
    HPARAM_SPACE,
    all_genomes,
    genome_key,
)
from cmoop_audio_processing_tpu.core.records import make_individual
from cmoop_audio_processing_tpu.core.rng import RunRng
from cmoop_audio_processing_tpu.engine.evaluator import FakeEvaluator
from cmoop_audio_processing_tpu.surrogate.gp import GPConfig
from cmoop_audio_processing_tpu.utils.reporting import RunReporter

FAST_GP = GPConfig(n_restarts=2, steps=60)
CONS = Constraints(0.85, 2.5, 0.09)

GEN_COLUMNS = [
    "Generation", "Accuracy", "Size_MB", "FPR", "CV",
    "filters", "kernel_size", "use_bn", "residual_blocks", "fc_layers",
    "use_dropout",
]


def true_pareto_keys(cons=CONS):
    fake = FakeEvaluator()
    data = [
        make_individual(g, *fake.fitness(g), cons) for g in all_genomes()
    ]
    feas = [d for d in data if d["CV"] == 0]
    mask = ea.nondominated_mask(np.array([d["objs"] for d in feas]))
    return {genome_key(feas[i]["hparams"]) for i in range(len(feas)) if mask[i]}


def test_nsga2_end_to_end(tmp_path):
    cfg = SearchConfig(pop_size=10, max_gen=8, constraints=CONS, seed=3)
    reporter = RunReporter(str(tmp_path), "nsga2_test")
    pareto, gen_dfs = run_nsga2(cfg, FakeEvaluator(), reporter)
    assert pareto, "no feasible front found"
    assert all(p["CV"] == 0 for p in pareto)
    # the returned front is internally nondominated (front 0 of the final
    # population; it may legitimately contain globally-dominated points the
    # search never got to compare against better ones)
    objs = np.array([p["objs"] for p in pareto])
    assert ea.nondominated_mask(objs).all()
    # and the search actually found true-Pareto genomes
    found = {genome_key(p["hparams"]) for p in pareto}
    assert len(found & true_pareto_keys()) >= 3
    # reporting contract
    assert len(gen_dfs) == 8
    assert list(gen_dfs[0].columns) == GEN_COLUMNS
    assert os.path.exists(tmp_path / "nsga2_test" / "final_pareto.csv")
    assert os.path.exists(tmp_path / "nsga2_test" / "pareto_iteration_5.csv")
    final = pd.read_csv(tmp_path / "nsga2_test" / "final_pareto.csv")
    assert list(final.columns) == GEN_COLUMNS[1:4] + GEN_COLUMNS[5:]


def test_nsga2_bi_objective_tracked_metric():
    cfg = SearchConfig(
        pop_size=8,
        max_gen=4,
        objectives=("acc", "size"),
        constraints=Constraints(0.85, 2.5, None),
        pairing="adjacent",
        seed=1,
    )
    pareto, _ = run_nsga2(cfg, FakeEvaluator())
    assert pareto
    for p in pareto:
        assert len(p["objs"]) == 2
        assert "fpr" in p["metrics"]  # tracked but not an objective


def test_nsga2_true_eval_budget():
    fake = FakeEvaluator()
    cfg = SearchConfig(pop_size=6, max_gen=5, constraints=CONS)
    run_nsga2(cfg, fake)
    # init + gens * offspring (nsga_penalty budget: 15 + 30*15)
    assert fake.total_true_evals == 6 + 5 * 6


def test_sa_nsga2_budget_and_front():
    fake = FakeEvaluator()
    cfg = SearchConfig(
        pop_size=9, max_gen=5, infill_percent=0.334, constraints=CONS, seed=5
    )
    pareto, _ = run_sa_nsga2(cfg, fake, gp_config=FAST_GP)
    # 9 init + 5 gens * max(1, int(9*0.334))=3 infill
    assert fake.total_true_evals == 9 + 5 * 3
    assert pareto
    # final front: every individual either truly evaluated or predicted;
    # all reported CV == 0
    assert all(p["CV"] == 0 for p in pareto)


def test_sa_nsga2_local_search_runs():
    fake = FakeEvaluator()
    cfg = SearchConfig(
        pop_size=6,
        max_gen=3,
        infill_percent=0.334,
        local_search=True,
        constraints=CONS,
        seed=7,
    )
    pareto, gen_dfs = run_sa_nsga2(cfg, fake, gp_config=FAST_GP)
    assert len(gen_dfs) == 0 or True  # no reporter passed
    assert fake.total_true_evals == 6 + 3 * 2


def test_select_infill_points_ranking():
    def rec(objs, cv):
        return {"hparams": {"id": len(objs)}, "objs": list(objs), "CV": cv}

    predicted = [
        rec([0.9, 0.9, 0.9], 0.0),   # feasible, worst normalized sum
        rec([0.1, 0.1, 0.1], 0.0),   # feasible, best
        rec([0.0, 0.0, 0.0], 0.5),   # infeasible, small CV
        rec([0.5, 0.5, 0.5], 0.0),   # feasible, middle
        rec([0.0, 0.0, 0.0], 2.0),   # infeasible, big CV
    ]
    idx, _ = select_infill_points(predicted, 4)
    # feasible by normalized score (1, 3, 0), then infeasible by CV (2)
    assert idx == [1, 3, 0, 2]


def test_mobo_end_to_end(tmp_path):
    fake = FakeEvaluator()
    cfg = MoboConfig(
        initial_samples=8, max_iterations=4, candidate_batch=100,
        constraints=CONS, seed=2,
    )
    reporter = RunReporter(str(tmp_path), "mobo_test")
    pareto, dfs = run_mobo(cfg, fake, reporter)
    assert fake.total_true_evals == 8 + 4
    assert len(dfs) == 4
    assert len(dfs[-1]) == 12  # full archive each iteration
    # archive pareto correctness: recompute brute force over the archive
    arch = dfs[-1]
    feas = arch[arch["CV"] <= 1e-8]
    pts = np.column_stack([-feas["Accuracy"], feas["Size_MB"], feas["FPR"]])
    expected = int(ea.nondominated_mask(pts).sum())
    assert len(pareto) == expected
    assert os.path.exists(tmp_path / "mobo_test" / "mobo_pareto.csv")
    # periodic exports carry the reference's mobo_iteration_{it+1} naming
    # (mobo_penalty.py:464), not the NSGA-II pareto_iteration_ pattern
    assert os.path.exists(tmp_path / "mobo_test" / "mobo_iteration_4.csv")


def test_mobo_periodic_gate_is_single_knob(tmp_path):
    """MoboConfig.periodic_save_every is the schedule of record: saves must
    not be silently re-gated by the reporter's (EA-oriented) periodic_every
    when the two knobs disagree."""
    cfg = MoboConfig(
        initial_samples=4, max_iterations=4, candidate_batch=50,
        constraints=CONS, seed=2, periodic_save_every=2,
    )
    reporter = RunReporter(str(tmp_path), "mobo_gate", periodic_every=5)
    run_mobo(cfg, FakeEvaluator(), reporter)
    assert os.path.exists(tmp_path / "mobo_gate" / "mobo_iteration_2.csv")
    assert os.path.exists(tmp_path / "mobo_gate" / "mobo_iteration_4.csv")


def test_mobo_checkpoint_resume_rebuilds_sheets(tmp_path):
    """A resumed MOBO run must reproduce the uninterrupted run exactly —
    including the per-iteration workbook sheets for iterations completed
    BEFORE the resume (each sheet is an archive snapshot, reconstructible
    from the restored archive)."""
    from cmoop_audio_processing_tpu.utils.xlsx import read_xlsx, sheet_names

    def mk_cfg(iters):
        return MoboConfig(
            initial_samples=5, max_iterations=iters, candidate_batch=50,
            constraints=CONS, seed=4,
        )

    pareto_full, dfs_full = run_mobo(mk_cfg(4), FakeEvaluator())

    ck = str(tmp_path / "ck.json")
    run_mobo(mk_cfg(2), FakeEvaluator(), checkpoint_path=ck)
    reporter = RunReporter(str(tmp_path), "mobo_resume")
    pareto_res, dfs_res = run_mobo(
        mk_cfg(4), FakeEvaluator(), reporter, checkpoint_path=ck
    )

    assert [p["hparams"] for p in pareto_res] == [
        p["hparams"] for p in pareto_full
    ]
    assert len(dfs_res) == len(dfs_full) == 4
    for a, b in zip(dfs_res, dfs_full):
        pd.testing.assert_frame_equal(a, b)
    wb = str(tmp_path / "mobo_resume" / "all_generations.xlsx")
    assert sheet_names(wb) == [f"Gen_{i}" for i in range(4)]
    # the pre-resume iterations' sheets carry the right archive prefixes
    assert len(read_xlsx(wb, "Gen_0")) == 6 and len(read_xlsx(wb, "Gen_3")) == 9


def test_nsga2_checkpoint_resume_exact(tmp_path):
    """Resumed runs must continue the exact RNG/selection sequence: a run
    interrupted at gen 3 and resumed matches an uninterrupted run."""
    cfg_full = SearchConfig(pop_size=6, max_gen=6, constraints=CONS, seed=11)
    pareto_full, _ = run_nsga2(cfg_full, FakeEvaluator())

    ck = str(tmp_path / "ck.json")
    cfg_half = SearchConfig(pop_size=6, max_gen=3, constraints=CONS, seed=11)
    run_nsga2(cfg_half, FakeEvaluator(), checkpoint_path=ck)
    # resume with the full horizon
    pareto_resumed, _ = run_nsga2(cfg_full, FakeEvaluator(), checkpoint_path=ck)

    k1 = sorted(genome_key(p["hparams"]) for p in pareto_full)
    k2 = sorted(genome_key(p["hparams"]) for p in pareto_resumed)
    assert k1 == k2
    o1 = sorted(tuple(p["objs"]) for p in pareto_full)
    o2 = sorted(tuple(p["objs"]) for p in pareto_resumed)
    np.testing.assert_allclose(np.array(o1), np.array(o2), rtol=1e-12)


def test_sa_nsga2_checkpoint_resume(tmp_path):
    ck = str(tmp_path / "ck_sa.json")
    cfg_half = SearchConfig(
        pop_size=6, max_gen=2, infill_percent=0.334, constraints=CONS, seed=13
    )
    run_sa_nsga2(cfg_half, FakeEvaluator(), checkpoint_path=ck, gp_config=FAST_GP)
    cfg_full = SearchConfig(
        pop_size=6, max_gen=4, infill_percent=0.334, constraints=CONS, seed=13
    )
    fake = FakeEvaluator()
    pareto, _ = run_sa_nsga2(
        cfg_full, fake, checkpoint_path=ck, gp_config=FAST_GP
    )
    # only generations 2-3 re-evaluated: 2 gens * 2 infill
    assert fake.total_true_evals == 2 * 2
    assert pareto is not None


def test_lhs_initialization_strata():
    rng = RunRng(0)
    pop = lhs_init(12, rng.numpy)
    assert len(pop) == 12
    # LHS floor-scaling: each gene's option counts are as balanced as 12
    # samples over k options allow (each stratum hit floor/ceil times)
    for gene in GENE_ORDER:
        opts = HPARAM_SPACE[gene]
        counts = {o: 0 for o in opts}
        for g in pop:
            counts[g[gene]] += 1
        lo = 12 // len(opts)
        hi = -(-12 // len(opts))
        assert all(lo <= c <= hi for c in counts.values()), (gene, counts)


def test_psi_init_from_csv(tmp_path):
    rows = []
    for g in all_genomes()[:5]:
        rows.append(
            {"Accuracy": 0.92, "Size_MB": 1.0, "FPR": 0.05,
             **{k: g[k] for k in GENE_ORDER}}
        )
    path = tmp_path / "Final.csv"
    pd.DataFrame(rows).to_csv(path, index=False)
    pop = psi_init(str(path), CONS)
    assert len(pop) == 5
    assert all(p["CV"] == 0 for p in pop)
    assert pop[0]["objs"][0] == pytest.approx(-0.92)
    assert isinstance(pop[0]["hparams"]["use_bn"], bool)
    # no re-training happened: records came straight from the file
    assert pop[2]["metrics"]["size"] == 1.0


def test_predicted_records_get_analytic_size():
    """GP-predicted offspring carry the exact analytic size, and a real size
    violation is never masked by an optimistic predicted CV."""
    from cmoop_audio_processing_tpu.algorithms.sa_nsga2 import _use_analytic_size
    from cmoop_audio_processing_tpu.models.genome_arch import model_size_mb

    big = all_genomes()[-1]  # 64 filters, 3 blocks, 4 fc -> >> 2.5 MB
    small = all_genomes()[0]
    recs = [
        {"hparams": dict(big), "objs": [-0.95, -0.4, 0.01], "CV": 0.0,
         "metrics": {"acc": 0.95, "size": -0.4, "fpr": 0.01}, "predicted": True},
        {"hparams": dict(small), "objs": [-0.9, 9.9, 0.01], "CV": 0.3,
         "metrics": {"acc": 0.9, "size": 9.9, "fpr": 0.01}, "predicted": True},
    ]
    fake = FakeEvaluator()
    cfg = SearchConfig(constraints=CONS)
    _use_analytic_size(recs, fake, cfg)
    true_big = model_size_mb(big, 10, "A")
    assert recs[0]["objs"][1] == true_big
    assert recs[0]["metrics"]["size"] == true_big
    # known size violation now reflected in CV despite predicted CV == 0
    assert recs[0]["CV"] >= true_big - 2.5 > 0
    # small genome: true size replaces nonsense prediction, CV untouched
    assert recs[1]["objs"][1] == model_size_mb(small, 10, "A")
    assert recs[1]["CV"] == 0.3


class _SeedRecordingEvaluator(FakeEvaluator):
    """FakeEvaluator that records the seed of every true-eval call."""

    def __init__(self):
        super().__init__()
        self.seeds = []

    def evaluate(self, genomes, seed=0):
        self.seeds.append(int(seed))
        return super().evaluate(genomes, seed=seed)


def test_eval_seed_fixes_every_true_evaluation():
    """Common random numbers (examples/run_all8.py): SearchConfig.eval_seed
    pins EVERY true evaluation (init + all generations) to one seed, while
    the default keeps the per-generation seed + gen + 1 stream."""
    ev = _SeedRecordingEvaluator()
    run_nsga2(SearchConfig(pop_size=6, max_gen=3, seed=5, eval_seed=42,
                           constraints=CONS), ev)
    assert ev.seeds and set(ev.seeds) == {42}

    ev2 = _SeedRecordingEvaluator()
    run_nsga2(SearchConfig(pop_size=6, max_gen=3, seed=5,
                           constraints=CONS), ev2)
    assert ev2.seeds == [5, 6, 7, 8]  # init, then seed + gen + 1


def test_eval_seed_fixes_mobo_true_evaluations():
    ev = _SeedRecordingEvaluator()
    run_mobo(MoboConfig(initial_samples=4, max_iterations=2, seed=5,
                        eval_seed=42, constraints=CONS), ev)
    assert ev.seeds and set(ev.seeds) == {42}
