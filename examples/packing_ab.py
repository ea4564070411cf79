"""Same-run A/B: stop-epoch lane packing (TrainConfig.pack_by_stop_epoch)
ON vs OFF, as two PopulationEvaluator instances sharing one dataset.

One (32,5) template-B bucket of 16 genomes, max_models_per_program=8 ->
two one-shot launches per evaluate. The OFF arm evaluates in EA-arbitrary
(shuffled) order, so each launch mixes fast/slow stoppers and both
programs bill until their slowest lane stops. The ON arm sees the same
shuffled input but re-packs lanes by each genome's last observed
epochs_ran, isolating the stragglers into one launch.

Both arms get a full warm-up pass first (compiles + epoch history for the
packed arm — the packing predictor is the recorded history, so this A/B
measures the real mechanism, not an oracle). VERDICT r3 directive #3.

Committed result (TPU v5 lite, 2026-08-19, PERF.md round-4 table):
median off 11.87 s vs on 8.73 s over 5 reps — win 26.4%, adopted
(pack_by_stop_epoch defaults True). Run on a real TPU:
PYTHONPATH=/root/repo:/root/.axon_site python examples/packing_ab.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

EPOCHS = int(os.environ.get("AB_EPOCHS", "300"))
REPS = int(os.environ.get("AB_REPS", "5"))
MAXM = int(os.environ.get("AB_MAXM", "8"))


def main():
    data = prepare_dataset(
        DataConfig(synthetic_train=2000, synthetic_eval=500, num_classes=10)
    )
    genomes = []
    for rb in (1, 2, 3):
        for fc in (1, 2, 3, 4):
            genomes.append({
                "filters": 32, "kernel_size": 5,
                "use_bn": (fc + rb) % 2 == 0,
                "residual_blocks": rb, "fc_layers": fc,
                "use_dropout": rb == 2,
            })
    for fc in (1, 2, 3, 4):
        genomes.append({
            "filters": 32, "kernel_size": 5, "use_bn": fc % 2 == 1,
            "residual_blocks": 2, "fc_layers": fc, "use_dropout": False,
        })
    assert len(genomes) == 16

    def make_ev(pack):
        cfg = TrainConfig(
            epochs=EPOCHS, patience=5, compute_dtype="bfloat16",
            template="B", bucket_genes=("filters", "kernel_size"),
            max_models_per_program=MAXM, compaction_chunk=0,
            launch_seconds_budget=0, pack_by_stop_epoch=pack,
        )
        return PopulationEvaluator(data, cfg)

    ev_off = make_ev(False)
    ev_on = make_ev(True)

    # Warm-up: compiles every program shape both arms use AND records the
    # epoch history the ON arm's packer consumes.
    ev_off.evaluate(genomes, seed=1)
    rec = ev_off.timings[-1]
    epochs = []
    for launch in rec["chunks"]:
        epochs.extend(launch["epochs"])
    print(f"stop epochs (input order): {epochs}", flush=True)
    ev_on.evaluate(genomes, seed=1)   # builds its own history
    ev_on.evaluate(genomes, seed=1)   # warm the PACKED program shapes too

    rng = np.random.default_rng(0)
    off_times, on_times = [], []
    for r in range(REPS):
        sh = list(rng.permutation(16))
        gs = [genomes[i] for i in sh]
        t0 = time.perf_counter()
        f_on = ev_on.evaluate(gs, seed=1)
        t_on = time.perf_counter() - t0
        t0 = time.perf_counter()
        f_off = ev_off.evaluate(gs, seed=1)
        t_off = time.perf_counter() - t0
        # TPU numerics caveat: launch composition changes the compiled
        # program (max_blocks specialization), which perturbs bf16
        # rounding; report fitness drift instead of asserting equality.
        drift = max(
            abs(a - b) for fo, fn in zip(f_off, f_on) for a, b in zip(fo, fn)
        )
        off_times.append(t_off)
        on_times.append(t_on)
        print(f"rep {r}: off={t_off:.2f}s on={t_on:.2f}s "
              f"max_fitness_drift={drift:.4g}", flush=True)

    med = lambda xs: sorted(xs)[len(xs) // 2]
    ma, mb = med(off_times), med(on_times)
    out = {
        "config": {"epochs": EPOCHS, "max_models_per_program": MAXM,
                   "reps": REPS},
        "stop_epochs": [int(e) for e in epochs],
        "off_s": off_times, "on_s": on_times,
        "median_off_s": ma, "median_on_s": mb,
        "win_frac": (ma - mb) / ma,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
