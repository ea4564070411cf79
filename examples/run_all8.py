"""Distributional quality-parity harness: all 8 published method variants.

The reference paper's quality claim (BASELINE.md / compare.ipynb cell-1
outputs) is an ORDERING of 8 method variants by HV/IGD on one dataset — the
2-stage (PSI) variants dominate plain SA-NSGA-II. The authors' front .xlsx
files are not in the repo, so exact golden values are unreachable; this
harness reproduces the comparison distributionally instead: seeded runs of
every method preset with REAL candidate training on ONE shared synthetic
KWS dataset (DataConfig defaults, data seed 1234), then the compare
pipeline (cli/compare.py = compare.ipynb semantics) over the 8 fronts.

    python examples/run_all8.py [--out /tmp/all8] [--pop 10] [--gen 8]
        [--epochs 30] [--seed 7] [--fake-eval]

Produces <out>/compare_report_all8.json; the committed copy at
examples/compare_report_all8.json is pinned by
tests/test_examples_artifacts.py::test_all8_report_reproduces_paper_ordering.

Method -> preset map (BASELINE.md names on the left):

    SA_NSGA-II            sa_nsga_penalty's algorithm constants (infill 0.2,
                          template B; sa_nsga_penalty.py:114-124) re-hosted on
                          the shared KWS dataset/constraints so all 8 fronts
                          are comparable (the preset itself is BirdCLEF)
    SA_NSGA-II_LS         sa_nsga_local
    INIT_SA_NSGA-II       sa_nsga_init        (LHS init)
    INIT_SA_NSGA-II_LS    init_sa_nsga_local  (memetic)
    2_stage_SA_NSGA-II    psi_init_sa_nsga    (PSI seed from stage 1)
    2_stage_SA-NSGA-II_LS psi_sa_nsga_local
    MOBO                  mobo_penalty
    2_stage_MOBO          psi_mobo_2

Stage 1 (the PSI seed) is the three bi-objective presets
(acc_size/acc_fpr/size_fpr_nsga_1) merged via cli/psi_merge — the merge the
reference performed by hand (SURVEY.md §3.4).

Common random numbers (VERDICT r3 #6): one fixed eval_seed per replica is
shared by all methods, and a shared per-(replica, evaluation-semantics)
fitness cache replays any genome's first materialized draw everywhere it
re-appears — within a replica, a genome's fitness is one number for every
method that measures fitness the same way (the mobo/stage-1/template-B
preset groups each share one file; see run_one).

Everything runs sequentially in ONE process (one TPU attach; CLAUDE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--cpu" in sys.argv:
    # Forcing the backend must precede any jax API call; the env-var route
    # is ignored by the axon plugin (CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

from cmoop_audio_processing_tpu.cli import compare as compare_cli
from cmoop_audio_processing_tpu.cli import psi_merge
from cmoop_audio_processing_tpu.cli.main import make_evaluator, run
from cmoop_audio_processing_tpu.core.config import (
    Constraints,
    DataConfig,
    SearchConfig,
    TrainConfig,
    get_preset,
)

STAGE1 = ["acc_size_nsga_1", "acc_fpr_nsga_1", "size_fpr_nsga_1"]

# method display name (compare.ipynb labels) -> (preset, needs_psi_seed)
METHODS = [
    ("SA_NSGA-II", "sa_nsga_penalty", False),
    ("SA_NSGA-II_LS", "sa_nsga_local", False),
    ("INIT_SA_NSGA-II", "sa_nsga_init", False),
    ("INIT_SA_NSGA-II_LS", "init_sa_nsga_local", False),
    ("2_stage_SA_NSGA-II", "psi_init_sa_nsga", True),
    ("2_stage_SA-NSGA-II_LS", "psi_sa_nsga_local", True),
    ("MOBO", "mobo_penalty", False),
    ("2_stage_MOBO", "psi_mobo_2", True),
]


def build_cfg(preset: str, args, seed_file: str | None = None):
    cfg = get_preset(preset)
    if preset == "sa_nsga_penalty":
        # Re-host the plain SA-NSGA-II algorithm on the shared KWS dataset so
        # its front is comparable with the other 7 (see module docstring).
        cfg = cfg.replace(
            data=DataConfig(num_classes=10),
            train=dataclasses.replace(cfg.train, num_classes=10),
            search=dataclasses.replace(
                cfg.search, constraints=Constraints(0.90, 2.5, 0.09)
            ),
        )
    train = dataclasses.replace(cfg.train, epochs=args.epochs)
    # Common random numbers (VERDICT r3 #6): one fixed eval seed per replica
    # shared by all 8 methods (and all generations), so any genome gets the
    # IDENTICAL fitness draw wherever it appears — the methods are compared
    # on search behavior, not on evaluation-noise luck.
    search = dataclasses.replace(
        cfg.search, seed=args.seed, pop_size=args.pop, max_gen=args.gen,
        eval_seed=args.seed,
        psi_seed_file=seed_file if cfg.algorithm != "mobo" else None,
    )
    mobo = cfg.mobo
    if mobo is not None:
        mobo = dataclasses.replace(
            mobo, seed=args.seed, initial_samples=args.pop,
            max_iterations=args.gen * 3,  # ~match SA's per-gen infill budget
            eval_seed=args.seed,
            psi_seed_file=seed_file,
        )
    return cfg.replace(
        data=dataclasses.replace(cfg.data, source="synthetic"),
        train=train, search=search, mobo=mobo, output_dir=args.out,
    )


def run_one(cfg, args):
    t0 = time.perf_counter()
    # One shared fitness cache per (replica, evaluation semantics): every
    # method whose TrainConfig produces identical fitnesses appends to the
    # same file, so a genome re-appearing in ANY of those methods replays
    # the identical draw. With eval_seed fixed (CRN) this makes the
    # cross-method comparison EXACT per genome — it also neutralizes the
    # TPU program-shape numerics drift (PERF.md round 4: different bucket
    # compositions can retile matmuls and move accuracy ~1 val sample),
    # since the first materialized value wins everywhere. The filename tag
    # hashes every config field of the cache's own fingerprint (utils/
    # fitness_cache.evaluator_fingerprint) so methods with different
    # evaluation semantics (template A/B; the mobo presets' restore_best
    # vs the stage-1 presets' last-epoch accuracy) get separate files
    # instead of a fingerprint-mismatch crash; the dataset hash — the one
    # field not in the tag — is shared by construction (one dataset per
    # replica).
    cache = None
    if not args.fake_eval:
        fp = {
            f: getattr(cfg.train, f)
            for f in ("epochs", "batch_size", "patience", "learning_rate",
                      "num_classes", "restore_best_weights", "accuracy_from",
                      "template", "dropout_rate", "compute_dtype")
        }
        tag = hashlib.sha1(
            json.dumps(fp, sort_keys=True, default=str).encode()
        ).hexdigest()[:8]
        cache = os.path.join(args.out, f"fitness_cache_{tag}.jsonl")
    evaluator = make_evaluator(cfg, args.fake_eval, fitness_cache_path=cache)
    pareto, _ = run(cfg, evaluator)
    wall = time.perf_counter() - t0
    front = os.path.join(
        args.out, cfg.name,
        "mobo_pareto.csv" if cfg.algorithm == "mobo" else "final_pareto.csv",
    )
    print(f"[all8] {cfg.name}: {len(pareto)} front rows, {wall:.1f}s",
          file=sys.stderr)
    return front


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/all8")
    p.add_argument("--pop", type=int, default=10)
    p.add_argument("--gen", type=int, default=8)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--fake-eval", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (handled at import time)")
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    # a fresh harness run starts over (CLI semantics): stale caches from a
    # previous run in the same --out must not replay into this replica
    import glob

    for stale in glob.glob(os.path.join(args.out, "fitness_cache_*.jsonl")):
        os.unlink(stale)

    # ---- stage 1: three bi-objective runs -> merged PSI seed -------------
    stage1_fronts = [run_one(build_cfg(s, args), args) for s in STAGE1]
    seed_file = os.path.join(args.out, "Final.csv")
    psi_merge.merge(
        stage1_fronts, dedup=True, limit=args.pop, interleave=True
    ).to_csv(seed_file, index=False)
    print(f"[all8] PSI seed merged -> {seed_file}", file=sys.stderr)

    # ---- stage 2: the 8 method variants ----------------------------------
    fronts = {}
    for name, preset, needs_seed in METHODS:
        cfg = build_cfg(preset, args, seed_file if needs_seed else None)
        fronts[name] = run_one(cfg, args)

    # ---- compare (compare.ipynb pipeline) ---------------------------------
    report_path = os.path.join(args.out, "compare_report_all8.json")
    compare_argv = []
    for name, path in fronts.items():
        compare_argv += ["--front", f"{name}={path}"]
    compare_argv += ["--out", report_path,
                     "--plots", os.path.join(args.out, "plots")]
    compare_cli.main(compare_argv)

    # compare_cli skips empty fronts (and writes no report if ALL were
    # empty), so every lookup below must tolerate absent methods — reach
    # the INCOMPLETE verdict instead of a traceback.
    if not os.path.exists(report_path):
        print("[all8] no report written (every front was empty) — "
              "ordering check incomplete", file=sys.stderr)
        return 1
    with open(report_path) as f:
        rep = json.load(f)
    if "SA_NSGA-II" not in rep.get("hypervolume", {}):
        print("[all8] plain SA_NSGA-II front empty/missing — "
              "ordering check incomplete", file=sys.stderr)
        return 1
    sa_hv = rep["hypervolume"]["SA_NSGA-II"]
    sa_igd = rep["igd"]["SA_NSGA-II"]
    print("[all8] HV:", {k: round(v, 7) for k, v in rep["hypervolume"].items()},
          file=sys.stderr)
    print("[all8] IGD:", {k: round(v, 6) for k, v in rep["igd"].items()},
          file=sys.stderr)
    two_stage = ("2_stage_SA_NSGA-II", "2_stage_SA-NSGA-II_LS", "2_stage_MOBO")
    present = [m for m in two_stage if m in rep["hypervolume"]]
    missing = [m for m in two_stage if m not in rep["hypervolume"]]
    if missing:
        print(f"[all8] WARNING: empty/missing fronts for {missing} — "
              f"ordering check incomplete", file=sys.stderr)
    ok = bool(present) and all(
        rep["hypervolume"][m] >= sa_hv and rep["igd"][m] <= sa_igd
        for m in present
    )
    print(f"[all8] paper ordering (2-stage >= plain SA on HV and IGD): "
          f"{'HOLDS' if ok and not missing else 'VIOLATED/INCOMPLETE'}",
          file=sys.stderr)
    return 0 if ok and not missing else 1


if __name__ == "__main__":
    sys.exit(main())
