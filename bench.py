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
``vs_baseline`` reports the population/serial ratio on the same hardware.
NOTE this baseline is deliberately harsh: the serial path is THIS
framework's own compiled, cached, bf16 execution — already orders of
magnitude faster per candidate than the reference's Keras loop, which
rebuilds and re-traces a fresh graph per candidate (clear_session +
build_model + fit, sa_nsga_penalty.py:211-217). On one chip the two paths
are near parity by construction (per-model cost scales linearly with
population size for TinyML-sized candidates — measured); the population
design pays off at the multi-chip mesh (pop axis sharded over ICI,
parallel/mesh.py) and through cross-generation compile amortization.
Compile time is excluded via a warmup pass over the identical seed path
(compilation caches are cross-generation in real runs).

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
    import threading

    import jax

    # Hard wall limit: a downed remote-TPU worker makes device init (or any
    # launch) hang forever, which would wedge whatever harness runs the
    # bench. Exit loudly instead — no JSON line is better than a hang or a
    # fabricated number. (Observed 2026-08-18: multi-hour axon outage.)
    wall_limit = float(os.environ.get("BENCH_WALL_LIMIT", "2400"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(wall_limit):
            print(
                f"bench: no result within BENCH_WALL_LIMIT={wall_limit:.0f}s "
                "— remote TPU worker likely unreachable; aborting",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    if wall_limit > 0:  # 0 disables the bound (repo convention)
        threading.Thread(target=_watchdog, daemon=True).start()

    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.core.rng import RunRng
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

    epochs = int(os.environ.get("BENCH_EPOCHS", "25"))
    pop_size = int(os.environ.get("BENCH_POP", "15"))
    dtype = os.environ.get("BENCH_DTYPE", "bfloat16")
    # -1 = the production adaptive policy (TrainConfig default). At the KWS
    # shape no adaptive term engages for the bench's <=4-lane buckets, so
    # the driver-facing number is unchanged vs the old hard 0; at the
    # birdclef shape the heavy-lane SPLIT policy is exactly what is being
    # measured. 0 forces fused one-shot everywhere (the pre-round-4 bench
    # and the lockstep arm of the round-4 A/B).
    compaction = int(os.environ.get("BENCH_COMPACTION", "-1"))
    # Feature geometry of the synthetic workload. "kws" is the default
    # (GSC-v2-shaped 44x13, the driver-facing contract); "birdclef" runs the
    # IDENTICAL generation at the reference's hardest shape point — 5-s
    # clips' 501x40 log-mel maps, 11 classes (sa_nsga_penalty.py:38-102) —
    # so MFU/throughput at that shape is measurable with the same harness.
    shape = os.environ.get("BENCH_SHAPE", "kws")
    shapes = {"kws": (44, 13, 10), "birdclef": (501, 40, 11)}
    if shape not in shapes:
        print(f"bench: unknown BENCH_SHAPE {shape!r}", file=sys.stderr)
        return 2
    time_steps, features, num_classes = shapes[shape]
    # Wall budget: with a warm persistent compile cache (.jax_cache) the
    # whole bench runs in ~1 min; on a cold cache the XLA compiles dominate
    # and the serial half degrades to per-bucket extrapolation to stay
    # inside the budget.
    budget = float(os.environ.get("BENCH_TIME_BUDGET", "480"))
    bench_t0 = time.perf_counter()

    data = prepare_dataset(
        DataConfig(
            synthetic_train=2000, synthetic_eval=500,
            num_classes=num_classes, time_steps=time_steps, features=features,
        )
    )

    rng = RunRng(0)
    genomes = [
        g for g in [all_genomes()[i * 13 % 288] for i in range(pop_size)]
    ]

    # bucket-key experiment knob. The default (3-gene, depth in the key)
    # fully specializes every program — measured +19% over 2-gene bucketing
    # once the fused single-launch dispatch made extra buckets cheap
    # (round-3 A/B: 9,778 -> 11,655 evals/h same-session).
    bucket_genes = tuple(
        os.environ.get(
            "BENCH_BUCKET_GENES", "filters,kernel_size,residual_blocks"
        ).split(",")
    )

    def make_eval(max_models):
        cfg = TrainConfig(
            epochs=epochs,
            patience=5,
            compute_dtype=dtype,
            max_models_per_program=max_models,
            compaction_chunk=compaction if max_models > 1 else 0,
            bucket_genes=bucket_genes,
            num_classes=num_classes,
            # the BirdCLEF script is the 1-conv-stem template (its preset
            # matches: core/config.py sa_nsga_penalty)
            template="B" if shape == "birdclef" else "A",
        )
        return PopulationEvaluator(data, cfg)

    # --- population path ---
    # Same evaluator + same seed for warmup and measurement: inits are
    # genome-keyed and the train stream seed-keyed, so both calls do
    # identical work, every program on the path is compiled AND traced by
    # the warmup, and the measurement shows steady-state throughput.
    ev = make_eval(16)
    ev.evaluate(genomes, seed=1)  # warmup: compile + trace
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "5")))
    reps = []
    for _ in range(n_reps):  # median of repeats damps tunnel-latency noise
        t0 = time.perf_counter()
        ev.evaluate(genomes, seed=1)
        reps.append(time.perf_counter() - t0)
    reps_sorted = sorted(reps)
    pop_seconds = reps_sorted[len(reps) // 2]
    # interquartile spread of the repeats — the honest per-run noise figure
    # (the tunnel's dispatch latency drifts; PERF.md measurement caveat)
    q1 = reps_sorted[len(reps) // 4]
    q3 = reps_sorted[(3 * len(reps)) // 4]
    pop_iqr_frac = (q3 - q1) / pop_seconds
    launches_per_gen = ev.timings[-1]["launches"]
    pop_rate = 3600.0 * pop_size / pop_seconds

    # --- serial path (reference execution model) ---
    # The serial cost model is the sum over genomes of each genome's own
    # training time (early stopping included), exactly like the reference's
    # one-fit-per-candidate loop. Warm up one genome per (bucket, depth):
    # single-genome launches specialize to the genome's OWN depth
    # (BucketSpec.max_blocks), so each depth is a distinct program — warming
    # only per bucket would leave compile/cache-load costs inside the timed
    # loop and unfairly inflate vs_baseline.
    ev1 = make_eval(1)
    buckets = {}
    for g in genomes:
        buckets.setdefault((g["filters"], g["kernel_size"]), []).append(g)
    programs = {}
    for g in genomes:
        programs.setdefault(
            (g["filters"], g["kernel_size"], g["residual_blocks"]), g
        )
    for g in programs.values():
        ev1.evaluate([g], seed=0)  # warmup: compile this program

    if time.perf_counter() - bench_t0 < budget - 120:
        t0 = time.perf_counter()
        for g in genomes:
            ev1.evaluate([g], seed=1)
        serial_seconds = time.perf_counter() - t0
        serial_mode = "full"
    else:
        # cold cache ate the budget: extrapolate from one timed genome per
        # bucket (conservative; per-genome stop epochs vary)
        serial_seconds = 0.0
        for members in buckets.values():
            t0 = time.perf_counter()
            ev1.evaluate([members[0]], seed=1)
            serial_seconds += (time.perf_counter() - t0) * len(members)
        serial_mode = "extrapolated"
    serial_rate = 3600.0 * pop_size / serial_seconds

    # --- hardware FLOPs / MFU (analytic, lockstep-executed work) ---
    # The masked supernet executes every bucket's MAX configuration (all 3
    # blocks + full FC chain) for every padded lane until the slowest lane
    # stops; that is the hardware work the chip actually performed.
    from cmoop_audio_processing_tpu.models.genome_arch import count_fwd_flops

    bs, ebs = ev.cfg.batch_size, ev.settings.eval_batch_size
    n_train_pad = -(-data["x_train"].shape[0] // bs) * bs
    n_val_pad = -(-data["x_val"].shape[0] // ebs) * ebs
    hw = data["x_train"].shape[1:3]
    executed = 0.0
    for ch in ev.timings[-1]["chunks"]:
        gmax = {
            "filters": ch["filters"], "kernel_size": ch["kernel"],
            "use_bn": True,
            # the program is specialized to the launch's deepest genome, so
            # the executed work is the bucket's max_blocks, not always 3
            "residual_blocks": ch.get("max_blocks", 3), "fc_layers": 4,
            "use_dropout": False,
        }
        fwd = count_fwd_flops(gmax, hw, ev.cfg.num_classes, ev.cfg.template)
        # the chunk record says whether lanes were really dropped (the raw
        # BENCH_COMPACTION env value can't: -1 resolves per bucket)
        if ch.get("compacted"):
            # compaction drops stopped lanes between chunks; per-lane billed
            # epochs approximate the executed work (slightly UNDER-counts the
            # pre-eviction lockstep epochs inside each chunk)
            lane_epochs = sum(ch["epochs"])
        else:
            # lockstep one-shot: every padded lane runs until the slowest stops
            lane_epochs = ch["pop"] * max(ch["epochs"])
        # per lane-epoch: fwd+bwd over the train set + one val forward pass
        executed += lane_epochs * (3 * fwd * n_train_pad + fwd * n_val_pad)
    # bf16 MXU peaks per chip; unknown devices get the v5e figure with a note
    peaks = {"TPU v5 lite": 197e12, "TPU v4": 275e12, "TPU v5p": 459e12,
             "TPU v6 lite": 918e12, "TPU v6e": 918e12}
    kind = jax.devices()[0].device_kind
    peak = peaks.get(kind)
    if peak is None:
        peak = 197e12
        print(f"bench: unknown device {kind!r}; MFU uses the v5e bf16 peak",
              file=sys.stderr)
    if dtype == "float32":
        peak /= 4  # f32 matmuls run at ~1/4 the bf16 MXU rate
    mfu = executed / pop_seconds / peak

    # BASELINE.json's second named metric: MFCC frames/sec/chip through the
    # fused Pallas frontend (batch of 1-second clips)
    import jax.numpy as jnp

    from cmoop_audio_processing_tpu.frontend.features import FrontendConfig, mfcc
    from cmoop_audio_processing_tpu.frontend.pallas_kernels import mfcc_fused

    fcfg = FrontendConfig()
    clips = jnp.asarray(
        np.random.default_rng(0).standard_normal((256, 16000)), jnp.float32
    )
    feats = mfcc_fused(clips, fcfg)
    n_frames_total = feats.shape[0] * feats.shape[1]
    feats.block_until_ready()
    # Sustained throughput: K calls dispatched back-to-back (JAX async
    # dispatch), one sync at the end — how bulk extraction actually runs
    # (cli/extract_features.py pipelines chunks the same way). A single
    # isolated call is per-call-overhead-bound at the 1-s clip shape (the
    # pre-round-5 numbers measured that: ~0.9 M frames/s for a ~few-ms
    # compute); the pipeline rate is the chip's real extraction rate.
    n_mfcc_reps = 16
    t0 = time.perf_counter()
    outs = [mfcc_fused(clips, fcfg) for _ in range(n_mfcc_reps)]
    outs[-1].block_until_ready()
    mfcc_seconds = time.perf_counter() - t0
    del outs
    mfcc_fps = n_mfcc_reps * n_frames_total / mfcc_seconds

    # Pallas-vs-XLA parity is part of the bench contract: a Mosaic/XLA
    # regression surfaces here as a hard failure, not silently (dB units)
    pallas_max_diff = float(
        jnp.max(jnp.abs(feats - mfcc(clips, fcfg)))
    )
    assert pallas_max_diff < 0.05, (
        f"fused Pallas MFCC drifted from the XLA path: {pallas_max_diff} dB"
    )

    result = {
        "metric": "candidate_evals_per_hour",
        "value": round(pop_rate, 1),
        "unit": "evals/h",
        "shape": shape,
        "vs_baseline": round(pop_rate / serial_rate, 2),
        "serial_mode": serial_mode,
        "repeats": n_reps,
        "iqr_frac": round(pop_iqr_frac, 3),
        "launches_per_gen": launches_per_gen,
        "mfcc_frames_per_sec": round(mfcc_fps, 0),
        "train_tflops_per_sec": round(executed / pop_seconds / 1e12, 2),
        "mfu": round(mfu, 4),
        "pallas_max_diff_db": round(pallas_max_diff, 6),
    }
    # detail for humans on stderr; the contract line on stdout
    print(
        f"population: {pop_size} evals in {pop_seconds:.1f}s ({pop_rate:.0f}/h, "
        f"IQR {pop_iqr_frac:.0%} of median, {launches_per_gen} launches); "
        f"serial[{serial_mode}]: {serial_seconds:.1f}s ({serial_rate:.0f}/h); "
        f"executed {executed/1e12:.2f} TFLOP, {executed/pop_seconds/1e12:.2f} TFLOP/s, "
        f"MFU {mfu:.1%}; mfcc: {mfcc_fps:.0f} frames/s "
        f"(pallas diff {pallas_max_diff:.2e} dB); "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(json.dumps(result))
    done.set()
    return 0


if __name__ == "__main__":
    sys.exit(main())
