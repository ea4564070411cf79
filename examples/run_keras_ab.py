"""A/B oracle: the reference's ACTUAL Keras training loop vs this engine.

Round 2 proved structural parity (the reference's own ``build_model``
executed for all 288 genomes, test_keras_oracle.py); this script closes the
remaining fidelity gap by TRAINING with the reference's real evaluator —
``compile('adam', 'sparse_categorical_crossentropy')`` + ``fit(...,
EarlyStopping(monitor='val_loss', patience=5, restore_best_weights=True),
batch_size=64)`` (sa_nsga_penalty.py:205-229; nsga_penalty.py:368-395) — and
the same genomes with ``engine/`` on the SAME dataset, then comparing
accuracy/FPR distributions and the genome ranking.

``build_model`` is AST-extracted from /root/reference at RUN time (never
copied into the repo); the training calls below are the reference's
documented hot loop re-invoked through public Keras APIs.

    python examples/run_keras_ab.py [--out examples/keras_ab.json]
        [--epochs 30] [--seeds 3] [--genomes 8]
        [--phase keras|ours|both] [--backend cpu|tpu]

    # typical split (TF fits are CPU-hours; the engine is TPU-seconds):
    python examples/run_keras_ab.py --phase keras          # CPU, resumable
    python examples/run_keras_ab.py --phase ours --backend tpu

The committed JSON is pinned by tests/test_keras_ab.py: per-genome accuracy
agreement within a distributional band, and Spearman rank agreement of the
genome ordering — the last unproven faithfulness claim of the rebuild
(VERDICT r2 "What's missing" #1).
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = "/root/reference"
REF_SCRIPTS = {"A": "nsga_penalty.py", "B": "sa_nsga_penalty.py"}


def _gkey(genome) -> tuple:
    """Content key for checkpoint records: ``pick_genomes`` is not
    prefix-stable across different ``--genomes`` counts, so keying fits by
    positional index could silently pair a Keras result with a DIFFERENT
    genome on resume. Sorted (gene, value) items are unambiguous."""
    return tuple(sorted((k, int(v)) for k, v in genome.items()))


# Search-space boundary cases (VERDICT r3 directive #7): the biggest program
# XLA will ever specialize for this space, the smallest (every optional layer
# off), and the two off-diagonal width/depth extremes.
BOUNDARY_GENOMES = [
    {"filters": 64, "kernel_size": 5, "use_bn": True,
     "residual_blocks": 3, "fc_layers": 4, "use_dropout": True},
    {"filters": 16, "kernel_size": 3, "use_bn": False,
     "residual_blocks": 1, "fc_layers": 1, "use_dropout": False},
    {"filters": 64, "kernel_size": 3, "use_bn": False,
     "residual_blocks": 1, "fc_layers": 4, "use_dropout": False},
    {"filters": 16, "kernel_size": 5, "use_bn": True,
     "residual_blocks": 3, "fc_layers": 1, "use_dropout": True},
]

# The BirdCLEF-shaped (501x40, 11-class) template-B pair: the committed
# end-to-end run's winning genome (examples/birdclef_e2e/) and a mid-size
# contrast point — the A/B validates the engine at the reference's hardest
# shape (sa_nsga_penalty.py:38-102), not just the KWS 44x13 one.
BIRDCLEF_PAIR = [
    {"filters": 16, "kernel_size": 3, "use_bn": True,
     "residual_blocks": 1, "fc_layers": 1, "use_dropout": True},
    {"filters": 32, "kernel_size": 5, "use_bn": False,
     "residual_blocks": 2, "fc_layers": 2, "use_dropout": False},
]


def pick_genomes(n: int, include_boundary: bool = True):
    """Deterministic diverse slice: spread over buckets, depths and flags
    (every gene takes multiple values across the slice), plus the
    search-space boundary genomes appended (dedup by content)."""
    from cmoop_audio_processing_tpu.core.genome import all_genomes

    gs = all_genomes()
    chosen, seen_keys = [], set()
    i = 0
    while len(chosen) < n:
        g = gs[(i * 37) % len(gs)]
        key = (g["filters"], g["kernel_size"], g["residual_blocks"])
        i += 1
        if key in seen_keys and len(seen_keys) < n:
            continue
        seen_keys.add(key)
        if g not in chosen:
            chosen.append(g)
    if include_boundary:
        have = {_gkey(g) for g in chosen}
        chosen += [g for g in BOUNDARY_GENOMES if _gkey(g) not in have]
    return chosen


def extract_build_model(template: str, input_hw, num_classes: int):
    """Pull the reference's ``build_model`` function out of the script
    (side-effect-free: only the function def is exec'd) and bind the module
    globals it closes over."""
    path = os.path.join(REF_DIR, REF_SCRIPTS[template])
    with open(path) as fh:
        tree = ast.parse(fh.read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "build_model"
    )
    from tensorflow.keras import Model, layers

    ns = {
        "layers": layers,
        "Model": Model,
        "X_train": np.zeros((1,) + tuple(input_hw), np.float32),
        "CLASSES": num_classes,
    }
    exec(compile(ast.Module([fn], type_ignores=[]), path, "exec"), ns)
    return ns["build_model"]


def macro_fpr_np(y_true, y_pred, num_classes: int) -> float:
    """calculate_fpr semantics (nsga_penalty.py:351-364) in plain numpy."""
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (y_true, y_pred), 1)
    total = cm.sum()
    col = cm.sum(axis=0)
    row = cm.sum(axis=1)
    diag = np.diagonal(cm)
    fp = col - diag
    tn = total - (row + col - diag)
    denom = fp + tn
    with np.errstate(invalid="ignore"):
        vals = np.where(denom > 0, fp / np.maximum(denom, 1), 0.0)
    return float(vals.mean())


def keras_eval(build_model, genome, data, epochs, batch_size, patience, seed):
    """The reference's evaluate_individual (sa_nsga_penalty.py:205-229):
    clear_session -> build -> compile(adam, sparse CE) -> fit with
    EarlyStopping(patience, restore_best) -> evaluate(val) accuracy + macro
    FPR from argmax val predictions."""
    import tensorflow as tf

    tf.keras.backend.clear_session()
    tf.keras.utils.set_random_seed(seed)
    model = build_model(genome)
    model.compile(
        optimizer="adam",
        loss="sparse_categorical_crossentropy",
        metrics=["accuracy"],
    )
    early = tf.keras.callbacks.EarlyStopping(
        monitor="val_loss", patience=patience, restore_best_weights=True
    )
    t0 = time.perf_counter()
    hist = model.fit(
        data["x_train"], data["y_train"],
        validation_data=(data["x_val"], data["y_val"]),
        epochs=epochs, batch_size=batch_size, callbacks=[early], verbose=0,
    )
    seconds = time.perf_counter() - t0
    _, acc = model.evaluate(data["x_val"], data["y_val"], verbose=0)
    y_pred = np.argmax(model.predict(data["x_val"], verbose=0), axis=1)
    fpr = macro_fpr_np(
        np.asarray(data["y_val"]).ravel(), y_pred,
        int(np.max(data["y_val"])) + 1,
    )
    return {
        "acc": float(acc),
        "fpr": float(fpr),
        "epochs_ran": len(hist.history["loss"]),
        "seconds": round(seconds, 2),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None,
                   help="report path (default: examples/keras_ab.json, or "
                        "examples/keras_ab_birdclef.json for "
                        "--dataset birdclef)")
    p.add_argument("--dataset", choices=["kws", "birdclef"], default="kws",
                   help="kws: synthetic 44x13 10-class maps, both templates, "
                        "diverse+boundary genomes. birdclef: a real "
                        "mel_spec.h5 (501x40, 11 classes; --h5-path), "
                        "template B only, the BIRDCLEF_PAIR genomes")
    p.add_argument("--h5-path", default="/tmp/birdclef_h5/mel_spec.h5")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--genomes", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--patience", type=int, default=5)
    # Two-phase split: the Keras fits are hours of pure-CPU TF work, while
    # the engine side is seconds per genome on TPU (but ~25 min per cold
    # XLA:CPU compile). Running --phase keras (CPU, anywhere) then
    # --phase ours --backend tpu (one TPU attach, short) keeps the chip free
    # for other work during the TF hours and avoids the CPU compile wall.
    p.add_argument("--phase", choices=["both", "keras", "ours"],
                   default="both")
    p.add_argument("--backend", choices=["cpu", "tpu"], default="cpu",
                   help="backend for the engine side ('ours')")
    p.add_argument("--partial", default=None,
                   help="keras-phase results file (written by --phase keras, "
                        "read by --phase ours); also the resume checkpoint "
                        "(default: /tmp/keras_ab_keras[_bc].json)")
    args = p.parse_args(argv)
    here = os.path.dirname(os.path.abspath(__file__))
    if args.out is None:
        args.out = os.path.join(
            here, "keras_ab.json" if args.dataset == "kws"
            else "keras_ab_birdclef.json")
    if args.partial is None:
        args.partial = ("/tmp/keras_ab_keras.json" if args.dataset == "kws"
                        else "/tmp/keras_ab_keras_bc.json")

    # Default: force the CPU backend — Keras runs on CPU here, and the
    # comparison is about TRAINING SEMANTICS (Adam/early-stop/restore-best/
    # BN dynamics), not device numerics — TPU-vs-CPU f32 parity is pinned
    # separately. --backend tpu opts the engine side onto the chip.
    # (The env var is ignored by the axon plugin; the config update works.)
    import jax

    if args.backend == "cpu" or args.phase == "keras":
        jax.config.update("jax_platforms", "cpu")

    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

    if args.dataset == "kws":
        # the bench/exhaustive shape point: GSC-v2-like 44x13 maps, 10 classes
        data = prepare_dataset(DataConfig(num_classes=10))
        genomes = pick_genomes(args.genomes)
        templates = ("A", "B")
        num_classes = 10
    else:
        # the reference's hardest shape point: real 501x40 mel maps from the
        # committed wav->h5 corpus, stratified 50/25/25, template B only
        # (sa_nsga_penalty.py's own template/geometry)
        data = prepare_dataset(DataConfig(source="hdf5", path=args.h5_path))
        genomes = list(BIRDCLEF_PAIR)
        templates = ("B",)
        num_classes = int(np.max(data["y_train"])) + 1
    seeds = list(range(args.seeds))

    # --- phase 1: the reference's Keras evaluator (resumable checkpoint) ---
    done = {}
    if os.path.exists(args.partial):
        with open(args.partial) as f:
            for r in json.load(f):
                done[(r["template"], _gkey(r["genome"]), r["seed"])] = r
        print(f"resuming: {len(done)} keras fits already in {args.partial}",
              flush=True)

    if args.phase in ("both", "keras"):
        for template in templates:
            build_model = extract_build_model(
                template, data["x_train"].shape[1:3], num_classes
            )
            for gi, g in enumerate(genomes):
                for seed in seeds:
                    if (template, _gkey(g), seed) in done:
                        continue
                    k = keras_eval(
                        build_model, g, data, args.epochs, args.batch_size,
                        args.patience, seed,
                    )
                    done[(template, _gkey(g), seed)] = {
                        "template": template, "gi": gi, "seed": seed,
                        "genome": g, "keras": k,
                    }
                    tmp = args.partial + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(list(done.values()), f)
                    os.replace(tmp, args.partial)
                    print(
                        f"[{template}] g{gi} seed{seed}: keras "
                        f"acc={k['acc']:.4f} fpr={k['fpr']:.4f} "
                        f"({k['seconds']}s, {k['epochs_ran']} ep)",
                        flush=True,
                    )
        if args.phase == "keras":
            print(f"keras phase complete: {len(done)} fits in {args.partial}")
            return 0

    # --- phase 2: this engine, same genomes/seeds ---
    missing = [
        (t, gi, s) for t in templates for gi, g in enumerate(genomes)
        for s in seeds if (t, _gkey(g), s) not in done
    ]
    if missing:
        raise SystemExit(
            f"--phase ours: {len(missing)} keras fits missing from "
            f"{args.partial} (run --phase keras first); first: {missing[0]}"
        )
    results = []
    for template in templates:
        cfg = TrainConfig(
            epochs=args.epochs, batch_size=args.batch_size,
            patience=args.patience, num_classes=num_classes,
            template=template,
            accuracy_from="best", restore_best_weights=True,
            compute_dtype="float32",
        )
        ev = PopulationEvaluator(data, cfg)
        for gi, g in enumerate(genomes):
            for seed in seeds:
                k = done[(template, _gkey(g), seed)]["keras"]
                t0 = time.perf_counter()
                acc, size, fpr = ev.evaluate([g], seed=seed)[0]
                ours = {
                    "acc": float(acc), "fpr": float(fpr),
                    "size_mb": float(size),
                    "seconds": round(time.perf_counter() - t0, 2),
                }
                results.append({
                    "genome": g, "template": template, "seed": seed,
                    "keras": k, "ours": ours,
                })
                print(
                    f"[{template}] g{gi} seed{seed}: keras acc={k['acc']:.4f}"
                    f" fpr={k['fpr']:.4f} ({k['seconds']}s, "
                    f"{k['epochs_ran']} ep) | ours acc={ours['acc']:.4f} "
                    f"fpr={ours['fpr']:.4f} ({ours['seconds']}s)",
                    flush=True,
                )

    report = {
        "description": (
            "A/B oracle: reference Keras evaluate_individual "
            "(sa_nsga_penalty.py:205-229 semantics, build_model AST-"
            "extracted at run time) vs engine/ on the shared "
            + ("synthetic GSC-v2-shaped dataset"
               if args.dataset == "kws" else
               "501x40 11-class mel_spec.h5 (examples/birdclef_e2e corpus)")
        ),
        "dataset": args.dataset, "templates": list(templates),
        "input_shape": list(data["x_train"].shape[1:]),
        "epochs": args.epochs, "seeds": seeds,
        "batch_size": args.batch_size, "patience": args.patience,
        "n_genomes": len(genomes),
        "ours_backend": jax.default_backend(),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out} ({len(results)} trainings x 2 engines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
