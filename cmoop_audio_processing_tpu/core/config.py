"""Experiment configuration.

The reference has no config system: every script hand-edits module-level
constants, with values drifting between scripts (SURVEY.md §5). Here each
reference script becomes a named preset over shared dataclasses, reproducing
that script's exact constants (sources cited per preset below).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple


@dataclass(frozen=True)
class Constraints:
    """Constraint thresholds; ``None`` disables a constraint (the bi-objective
    ablation scripts drop one constraint each, e.g. acc_size_nsga_1.py:148-149
    keeps only min_accuracy and max_model_size)."""

    min_accuracy: Optional[float] = 0.90
    max_model_size_mb: Optional[float] = 2.5
    max_fpr: Optional[float] = 0.09

    def violation(self, acc: float, size_mb: float, fpr: float) -> float:
        """CV = sum(max(0, violation)) (reference: sa_nsga_penalty.py:246-250)."""
        cv = 0.0
        if self.min_accuracy is not None:
            cv += max(0.0, self.min_accuracy - acc)
        if self.max_model_size_mb is not None:
            cv += max(0.0, size_mb - self.max_model_size_mb)
        if self.max_fpr is not None:
            cv += max(0.0, fpr - self.max_fpr)
        return cv


@dataclass(frozen=True)
class PenaltySchedule:
    """Linear adaptive penalty λ(gen) (reference: nsga_penalty.py:214-219)."""

    lambda_initial: float = 1.0
    lambda_final: float = 50.0
    # Multiplier applied to lambda_final for the final Pareto extraction sort;
    # the bi-objective scripts use LAMBDA_FINAL*100 (acc_size_nsga_1.py:511).
    final_sort_multiplier: float = 1.0

    def lam(self, gen: int, max_gen: int) -> float:
        frac = gen / float(max_gen - 1) if max_gen > 1 else 1.0
        return self.lambda_initial + frac * (self.lambda_final - self.lambda_initial)

    @property
    def final_sort_lambda(self) -> float:
        return self.lambda_final * self.final_sort_multiplier


@dataclass(frozen=True)
class TrainConfig:
    """Candidate-training budget (reference: nsga_penalty.py:176-179)."""

    epochs: int = 300
    batch_size: int = 64
    patience: int = 5
    learning_rate: float = 1e-3  # keras compile(optimizer='adam') default
    num_classes: int = 10
    # sa_nsga_penalty.py:215 restores best weights and reports model.evaluate
    # accuracy; nsga_penalty.py:384 reports last-epoch val_accuracy without
    # restoring. Default to the corrected (restore-best) behavior.
    restore_best_weights: bool = True
    accuracy_from: str = "best"  # "best" (model.evaluate) | "last_epoch"
    template: str = "A"  # CNN template: "A" 2-conv stem | "B" 1-conv stem
    dropout_rate: float = 0.3  # nsga_penalty.py:323
    # TPU engine knobs (no reference counterpart):
    compute_dtype: str = "bfloat16"  # matmul/conv dtype; params stay f32
    # Genes whose values select a compiled program (the rest become traced
    # per-lane flags). Depth in the bucket key means every program is fully
    # specialized to its genomes' residual depth — measured +19% generation
    # throughput once the fused single-launch dispatch made extra buckets
    # cheap (PERF.md round 3; it was wall-neutral back when each bucket cost
    # a 3-4 launch chain). Drop back to ("filters", "kernel_size") to halve
    # the cold-compile universe on fresh caches.
    bucket_genes: Tuple[str, ...] = (
        "filters", "kernel_size", "residual_blocks",
    )
    max_models_per_program: int = 16  # pad bucket sub-populations to <= this
    # When a bucket overflows max_models_per_program and splits into several
    # launches, order its genomes by their last observed stop epoch (the
    # evaluator records epochs_ran per genome) so genomes with similar stop
    # epochs share a launch: a lockstep program bills every lane until its
    # slowest lane stops, so separating fast stoppers from slow ones lets
    # the fast launch exit early instead of every launch carrying one
    # straggler (PERF.md "lockstep waste"; VERDICT r3 #3). Genomes with no
    # history sort last (treated as slow), input order breaking ties.
    pack_by_stop_epoch: bool = True
    parallel_impl: str = "grouped"  # "grouped" (one grouped-conv net) | "vmap"
    # Epochs between early-stop lane compactions. Compaction re-launches
    # survivors in smaller programs; worthwhile for large per-bucket
    # populations / long epoch budgets (PERF.md: pop 16 / 300-epoch cap
    # -> -26% wall), ~neutral at pop<=4 where chunk quantization cancels
    # the savings. -1 (default) = adaptive: the evaluator chunks a bucket
    # (every 2*patience epochs) only when its padded lane count is >= 8
    # and the epoch budget is long; 0 = always one-shot; N>0 = fixed chunk.
    compaction_chunk: int = -1
    # Upper bound (seconds, FLOPs-estimated at a conservative sustained
    # device rate) on any single one-shot training launch. Launches whose
    # estimated duration exceeds it run chunked instead — same exact results
    # (compaction == one-shot is test-pinned) in bounded slices. Motivated
    # by remote-TPU workers that kill device programs running longer than
    # ~1-2 min (observed at BirdCLEF 501x40 shapes with 300-epoch budgets;
    # KWS-sized launches never come close). 0 disables the bound.
    launch_seconds_budget: float = 20.0


@dataclass(frozen=True)
class SearchConfig:
    """EA driver parameters (reference: nsga_penalty.py:199-208 etc.)."""

    pop_size: int = 15
    max_gen: int = 30
    crossover_prob: float = 0.9
    mutation_prob: float = 0.2
    epsilon: float = 1e-6
    infill_percent: Optional[float] = None  # None = plain NSGA-II (no surrogate)
    local_search: bool = False
    lcb_k: float = 1.0  # LCB exploration factor (sa_nsga_local.py:368)
    local_search_rounds: int = 5  # sa_nsga_local.py:404
    initializer: str = "random"  # "random" | "lhs" | "psi"
    psi_seed_file: Optional[str] = None
    # Objective subset: which of (acc, size, fpr) are objectives; the rest are
    # tracked metrics only (ablation_study/acc_size_nsga_1.py:284-311).
    objectives: Tuple[str, ...] = ("acc", "size", "fpr")
    # Parent pairing: "adjacent" pairs tournament winners 0&1, 2&3, ...
    # (nsga_penalty.py:641); "resample" draws random pairs from the winner pool
    # until pop_size offspring exist (sa_nsga_penalty.py:552-559).
    pairing: str = "resample"
    constraints: Constraints = field(default_factory=Constraints)
    penalty: PenaltySchedule = field(default_factory=PenaltySchedule)
    seed: int = 0
    # Common-random-numbers knob: when set, EVERY true evaluation uses this
    # fixed seed instead of the per-generation `seed + gen + 1` stream, so a
    # genome's fitness is one pure draw for the whole run — and identical
    # across methods sharing the value. Used by the all-8 comparison harness
    # (examples/run_all8.py) to cut cross-method variance; None (default)
    # keeps the reference-like fresh-draw-per-generation behavior.
    eval_seed: Optional[int] = None
    periodic_save_every: int = 5  # nsga_penalty.py:738


@dataclass(frozen=True)
class MoboConfig:
    """MOBO driver parameters (reference: mobo_penalty.py:109-123)."""

    initial_samples: int = 15
    max_iterations: int = 30
    candidate_batch: int = 500
    constraints: Constraints = field(default_factory=Constraints)
    penalty: PenaltySchedule = field(default_factory=PenaltySchedule)
    psi_seed_file: Optional[str] = None
    seed: int = 0
    eval_seed: Optional[int] = None  # see SearchConfig.eval_seed
    periodic_save_every: int = 5


@dataclass(frozen=True)
class DataConfig:
    """Dataset source. ``synthetic`` generates a deterministic class-separable
    spectrogram-like dataset with the reference's KWS shapes when the
    reference's private data directories are unavailable."""

    source: str = "synthetic"  # "npy" | "hdf5" | "synthetic"
    path: Optional[str] = None
    # Standardization variant: "train_only" fits the scaler on train and
    # transforms val/test (acc_size_nsga_1.py:81-100, mobo_penalty.py:64-80);
    # "leaky" re-fits per split (nsga_penalty.py:111-137). Default corrected.
    scaler: str = "train_only"
    num_classes: int = 10
    synthetic_train: int = 2000
    synthetic_eval: int = 500
    time_steps: int = 44
    features: int = 13
    seed: int = 1234
    # HDF5 split fractions (sa_nsga_penalty.py:71-85): 50/25/25 stratified.
    hdf5_test_size: float = 0.5


@dataclass(frozen=True)
class ExperimentConfig:
    name: str
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    mobo: Optional[MoboConfig] = None
    algorithm: str = "nsga2"  # "nsga2" | "sa_nsga2" | "mobo"
    output_dir: str = "results"
    # Each reference script names its final artifacts with its own suffix
    # (final_pareto_surrogate.csv sa_nsga_penalty.py:664, _2_obj
    # acc_size_nsga_1.py:555, _surrogate_ls sa_nsga_local.py:577, _memetic,
    # _acc_fpr, _size_fpr; all_generations_* likewise). The canonical
    # final_pareto.csv / all_generations.xlsx are always written; when this
    # is set, the CLI additionally emits copies under the script's literal
    # names.
    artifact_suffix: Optional[str] = None

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def _kws_data() -> DataConfig:
    return DataConfig(num_classes=10)


def _bird_data() -> DataConfig:
    # BirdCLEF mel_spec.h5 (sa_nsga_penalty.py:38-102): 11 classes of 5-s
    # clips -> 40-mel maps. At 16 kHz / hop 160 / centered framing that is
    # 501x40 per clip — the synthetic fallback defaults to the same geometry
    # so the preset exercises the script's actual shape point, not the
    # KWS-sized 44x13 default (round-3 verdict: the old defaults mislabeled
    # a KWS-shaped run as "BirdCLEF-shaped").
    return DataConfig(
        num_classes=11, source="synthetic", time_steps=501, features=40
    )


# ---------------------------------------------------------------------------
# Presets: one per reference script, with that script's exact constants.
# ---------------------------------------------------------------------------

def _presets() -> Dict[str, ExperimentConfig]:
    kws_constraints = Constraints(0.90, 2.5, 0.09)
    p: Dict[str, ExperimentConfig] = {}

    # nsga_penalty.py: 3-objective constrained NSGA-II on KWS; MAX_FPR=0.1
    # (nsga_penalty.py:206-208), adjacent pairing (641), last-epoch accuracy
    # without restore-best (382-384).
    p["nsga_penalty"] = ExperimentConfig(
        name="nsga_penalty",
        data=_kws_data(),
        train=TrainConfig(restore_best_weights=False, accuracy_from="last_epoch"),
        search=SearchConfig(
            constraints=Constraints(0.90, 2.5, 0.10), pairing="adjacent"
        ),
        algorithm="nsga2",
    )

    # sa_nsga_penalty.py: SA-NSGA-II on BirdCLEF; MIN_ACCURACY=0.75,
    # MAX_FPR=0.09 (122-124), infill 0.2 (116), template B (137-177).
    p["sa_nsga_penalty"] = ExperimentConfig(
        name="sa_nsga_penalty",
        data=_bird_data(),
        train=TrainConfig(num_classes=11, template="B"),
        search=SearchConfig(
            infill_percent=0.2, constraints=Constraints(0.75, 2.5, 0.09)
        ),
        algorithm="sa_nsga2",
    )

    # mobo_penalty.py: penalty-scalarized MOBO on KWS (109-123); template A
    # with restore-best early stopping but last-epoch accuracy (227-236).
    p["mobo_penalty"] = ExperimentConfig(
        name="mobo_penalty",
        data=_kws_data(),
        train=TrainConfig(accuracy_from="last_epoch"),
        search=SearchConfig(constraints=kws_constraints),
        mobo=MoboConfig(constraints=kws_constraints),
        algorithm="mobo",
    )

    # ablation_study/sa_nsga_local.py: SA-NSGA-II + LCB local search on KWS;
    # infill 0.334 (89), template B (110-133).
    p["sa_nsga_local"] = ExperimentConfig(
        name="sa_nsga_local",
        data=_kws_data(),
        train=TrainConfig(template="B"),
        search=SearchConfig(
            infill_percent=0.334, local_search=True, constraints=kws_constraints
        ),
        algorithm="sa_nsga2",
    )

    # ablation_study/sa_nsga_init.py: LHS-initialized SA-NSGA-II (372-396).
    p["sa_nsga_init"] = ExperimentConfig(
        name="sa_nsga_init",
        data=_kws_data(),
        train=TrainConfig(template="B"),
        search=SearchConfig(
            infill_percent=0.334, initializer="lhs", constraints=kws_constraints
        ),
        algorithm="sa_nsga2",
    )

    # ablation_study/init_sa_nsga_local.py: LHS init + local search (memetic).
    p["init_sa_nsga_local"] = ExperimentConfig(
        name="init_sa_nsga_local",
        data=_kws_data(),
        train=TrainConfig(template="B"),
        search=SearchConfig(
            infill_percent=0.334,
            initializer="lhs",
            local_search=True,
            constraints=kws_constraints,
        ),
        algorithm="sa_nsga2",
    )

    # ablation_study/psi_init_sa_nsga.py: 2-stage (PSI) Excel-seeded SA-NSGA-II
    # (365-379); infill 0.334 (116).
    p["psi_init_sa_nsga"] = ExperimentConfig(
        name="psi_init_sa_nsga",
        data=_kws_data(),
        train=TrainConfig(template="B"),
        search=SearchConfig(
            infill_percent=0.334, initializer="psi", constraints=kws_constraints
        ),
        algorithm="sa_nsga2",
    )

    # ablation_study/psi_sa_nsga_local.py: 2-stage init + local search.
    p["psi_sa_nsga_local"] = ExperimentConfig(
        name="psi_sa_nsga_local",
        data=_kws_data(),
        train=TrainConfig(template="B"),
        search=SearchConfig(
            infill_percent=0.334,
            initializer="psi",
            local_search=True,
            constraints=kws_constraints,
        ),
        algorithm="sa_nsga2",
    )

    # ablation_study/psi_mobo_2.py: 2-stage init + MOBO (357-404).
    p["psi_mobo_2"] = ExperimentConfig(
        name="psi_mobo_2",
        data=_kws_data(),
        train=TrainConfig(accuracy_from="last_epoch"),
        search=SearchConfig(constraints=kws_constraints),
        mobo=MoboConfig(constraints=kws_constraints, psi_seed_file="Final.xlsx"),
        algorithm="mobo",
    )

    # Bi-objective stage-1 scripts (acc_size/acc_fpr/size_fpr_nsga_1.py):
    # template A, adjacent pairing, last-epoch accuracy, final sort at
    # LAMBDA_FINAL*100 (acc_size_nsga_1.py:511).
    bi_train = TrainConfig(restore_best_weights=False, accuracy_from="last_epoch")
    bi_penalty = PenaltySchedule(final_sort_multiplier=100.0)
    p["acc_size_nsga_1"] = ExperimentConfig(
        name="acc_size_nsga_1",
        data=_kws_data(),
        train=bi_train,
        search=SearchConfig(
            objectives=("acc", "size"),
            constraints=Constraints(0.90, 2.5, None),
            penalty=bi_penalty,
            pairing="adjacent",
        ),
        algorithm="nsga2",
    )
    p["acc_fpr_nsga_1"] = ExperimentConfig(
        name="acc_fpr_nsga_1",
        data=_kws_data(),
        train=bi_train,
        search=SearchConfig(
            objectives=("acc", "fpr"),
            constraints=Constraints(0.90, None, 0.09),
            penalty=bi_penalty,
            pairing="adjacent",
        ),
        algorithm="nsga2",
    )
    p["size_fpr_nsga_1"] = ExperimentConfig(
        name="size_fpr_nsga_1",
        data=_kws_data(),
        train=bi_train,
        search=SearchConfig(
            objectives=("size", "fpr"),
            constraints=Constraints(None, 2.5, 0.09),
            penalty=bi_penalty,
            pairing="adjacent",
        ),
        algorithm="nsga2",
    )

    # per-script literal artifact names (see ExperimentConfig.artifact_suffix)
    for preset_name, suffix in {
        "sa_nsga_penalty": "surrogate",      # sa_nsga_penalty.py:647,664
        "sa_nsga_init": "surrogate",         # sa_nsga_init.py
        "psi_init_sa_nsga": "surrogate",     # psi_init_sa_nsga.py
        "sa_nsga_local": "surrogate_ls",     # sa_nsga_local.py:561,577
        "psi_sa_nsga_local": "surrogate_ls",  # psi_sa_nsga_local.py
        "init_sa_nsga_local": "memetic",     # init_sa_nsga_local.py
        "acc_size_nsga_1": "2_obj",          # acc_size_nsga_1.py:528,555
        "acc_fpr_nsga_1": "acc_fpr",         # acc_fpr_nsga_1.py
        "size_fpr_nsga_1": "size_fpr",       # size_fpr_nsga_1.py
    }.items():
        p[preset_name] = p[preset_name].replace(artifact_suffix=suffix)
    return p


PRESETS: Dict[str, ExperimentConfig] = _presets()


def get_preset(name: str) -> ExperimentConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
    return PRESETS[name]
