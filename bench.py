"""Benchmark: candidate-model evaluations per hour on one chip.

Workload: one SA-NSGA-II generation's worth of candidate CNN trainings (a
15-genome population on a synthetic GSC-v2-shaped dataset, 2000x44x13
log-mel frames, batch 64, early stopping patience 5) — the hot loop that is
~99% of the reference's wall-clock (SURVEY.md §3.1).

Two measured paths, identical training settings:

* population: bucketed vmapped device programs (the framework's evaluator) —
  whole sub-populations train concurrently in one XLA program.
* serial: the same genomes trained one-per-program launch — the JAX
  equivalent of the reference's serial Keras loop (its per-candidate
  build/clear_session/fit, sa_nsga_penalty.py:205-229).

The reference publishes no wall-clock numbers (BASELINE.md), so
``vs_baseline`` reports the population/serial speedup on the same hardware —
the factor by which population batching beats the reference's execution
model. Compile time is excluded via a warmup pass (compilation caches are
cross-generation in real runs).

Prints ONE JSON line:
    {"metric": "candidate_evals_per_hour", "value": N, "unit": "evals/h",
     "vs_baseline": speedup_over_serial}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.core.rng import RunRng
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

    epochs = int(os.environ.get("BENCH_EPOCHS", "25"))
    pop_size = int(os.environ.get("BENCH_POP", "15"))
    n_serial = int(os.environ.get("BENCH_SERIAL", "4"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")

    data = prepare_dataset(
        DataConfig(synthetic_train=2000, synthetic_eval=500, num_classes=10)
    )

    rng = RunRng(0)
    genomes = [
        g for g in [all_genomes()[i * 13 % 288] for i in range(pop_size)]
    ]

    def make_eval(max_models):
        cfg = TrainConfig(
            epochs=epochs,
            patience=5,
            compute_dtype=dtype,
            max_models_per_program=max_models,
        )
        return PopulationEvaluator(data, cfg)

    # --- population path ---
    ev = make_eval(16)
    ev.evaluate(genomes, seed=0)  # warmup: compile all buckets
    t0 = time.perf_counter()
    ev.evaluate(genomes, seed=1)
    pop_seconds = time.perf_counter() - t0
    pop_rate = 3600.0 * pop_size / pop_seconds

    # --- serial path (reference execution model) ---
    # Timing all 15 genomes serially costs mostly XLA compiles (one pop-1
    # program per bucket), so measure one representative genome per bucket
    # and extrapolate by the population's bucket counts — the serial cost
    # model is exactly sum-over-genomes of per-genome time.
    ev1 = make_eval(1)
    buckets = {}
    for g in genomes:
        buckets.setdefault((g["filters"], g["kernel_size"]), []).append(g)
    serial_seconds = 0.0
    for key, members in buckets.items():
        rep = members[0]
        ev1.evaluate([rep], seed=0)  # warmup: compile this bucket
        t0 = time.perf_counter()
        ev1.evaluate([rep], seed=1)
        t_one = time.perf_counter() - t0
        serial_seconds += t_one * len(members)
    serial_rate = 3600.0 * pop_size / serial_seconds

    result = {
        "metric": "candidate_evals_per_hour",
        "value": round(pop_rate, 1),
        "unit": "evals/h",
        "vs_baseline": round(pop_rate / serial_rate, 2),
    }
    # detail for humans on stderr; the contract line on stdout
    print(
        f"population: {pop_size} evals in {pop_seconds:.1f}s ({pop_rate:.0f}/h); "
        f"serial: {n_serial} evals in {serial_seconds:.1f}s ({serial_rate:.0f}/h); "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
