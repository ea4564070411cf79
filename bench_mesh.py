"""Mesh-mode benchmark: the population engine sharded over a device mesh.

PERF.md's multi-chip claim — generation wall-clock divides by the chip
count because the pop axis shards with zero training-path collectives
(compiled-HLO-pinned by tests/test_parallel.py) — needs a harness a real
multi-chip session can run UNMODIFIED (round-3 verdict #4b). This is it:

    python bench_mesh.py                      # all devices, pop axis
    BENCH_MESH_POP=4 BENCH_MESH_DATA=2 python bench_mesh.py
    BENCH_MESH_CPU=8 python bench_mesh.py     # 8 virtual CPU devices (CI)

Workload: the same 15-genome generation as bench.py (synthetic GSC-v2-shaped
data, early stopping patience 5), measured twice with identical settings —
population engine on the (pop, data) mesh vs the same engine single-device —
and reported as ONE JSON line:

    {"metric": "mesh_evals_per_hour", "value": N, "unit": "evals/h",
     "vs_baseline": mesh_over_single_ratio, ...}

`vs_baseline` > 1 means the mesh actually divides wall-clock. On the CPU
verification mesh the ratio is meaningless (8 virtual devices share one
host's cores) — the run proves the harness + sharding execute, not speed.

Notes for the multi-chip reader: per-bucket sub-populations pad to a
multiple of the pop-axis size (engine/evaluator.py), so `lanes_per_shard`
and `padding_overhead` quantify the utilization cost of small buckets;
the default 2-gene bucketing (vs bench.py's 3-gene) keeps buckets large
enough that every shard holds >= 1 real lane. Override with
BENCH_BUCKET_GENES.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Virtual-device CPU verification must configure XLA before jax imports.
_N_CPU = int(os.environ.get("BENCH_MESH_CPU", "0"))
if _N_CPU:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={_N_CPU}"
    )

import numpy as np  # noqa: E402


def main() -> int:
    import threading

    import jax

    if _N_CPU:
        # the axon plugin ignores the JAX_PLATFORMS env var; the config
        # update is the reliable spelling (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    wall_limit = float(os.environ.get("BENCH_WALL_LIMIT", "2400"))
    done = threading.Event()

    def _watchdog():
        if not done.wait(wall_limit):
            print(
                f"bench_mesh: no result within {wall_limit:.0f}s — device "
                "init or a launch is hanging; aborting",
                file=sys.stderr, flush=True,
            )
            os._exit(3)

    if wall_limit > 0:
        threading.Thread(target=_watchdog, daemon=True).start()

    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator
    from cmoop_audio_processing_tpu.parallel.mesh import population_mesh

    n_dev = len(jax.devices())
    n_pop = int(os.environ.get("BENCH_MESH_POP", "0")) or n_dev
    n_data = int(os.environ.get("BENCH_MESH_DATA", "1"))
    if n_pop * n_data > n_dev:
        raise SystemExit(
            f"mesh {n_pop}x{n_data} needs {n_pop * n_data} devices; "
            f"only {n_dev} visible"
        )
    epochs = int(os.environ.get("BENCH_EPOCHS", "25"))
    pop_size = int(os.environ.get("BENCH_POP", "15"))
    dtype = os.environ.get("BENCH_DTYPE",
                           "float32" if _N_CPU else "bfloat16")
    bucket_genes = tuple(
        os.environ.get("BENCH_BUCKET_GENES", "filters,kernel_size").split(",")
    )
    n_reps = max(1, int(os.environ.get("BENCH_REPS", "3")))
    # CPU verification shrinks the workload: the point there is execution,
    # not timing
    if _N_CPU:
        data_cfg = DataConfig(synthetic_train=256, synthetic_eval=64,
                              num_classes=10)
        epochs = min(epochs, 3)
    else:
        data_cfg = DataConfig(synthetic_train=2000, synthetic_eval=500,
                              num_classes=10)
    data = prepare_dataset(data_cfg)
    genomes = [all_genomes()[i * 13 % 288] for i in range(pop_size)]

    cfg = TrainConfig(
        epochs=epochs, patience=5, compute_dtype=dtype,
        bucket_genes=bucket_genes,
        # mesh buckets pad to a device-count multiple anyway; allow them
        max_models_per_program=max(16, n_pop),
    )

    def timed(ev):
        ev.evaluate(genomes, seed=1)  # warmup: compile + trace
        reps = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            ev.evaluate(genomes, seed=1)
            reps.append(time.perf_counter() - t0)
        return sorted(reps)[len(reps) // 2], ev.timings[-1]

    mesh = population_mesh(n_pop, n_data)
    mesh_s, mesh_t = timed(PopulationEvaluator(data, cfg, mesh=mesh))
    single_s, single_t = timed(PopulationEvaluator(data, cfg))

    lanes = [c["pop"] for c in mesh_t["chunks"]]
    real_lanes = pop_size  # one real lane per genome; the rest is padding
    padded_lanes = sum(lanes)
    result = {
        "metric": "mesh_evals_per_hour",
        "value": round(3600.0 * pop_size / mesh_s, 1),
        "unit": "evals/h",
        "vs_baseline": round(single_s / mesh_s, 2),  # mesh speedup ratio
        "mesh": [n_pop, n_data],
        "devices": n_dev,
        "device_kind": jax.devices()[0].device_kind,
        "launches_per_gen": mesh_t["launches"],
        "lanes_per_shard": [lane // n_pop for lane in lanes],
        "padding_overhead": round(padded_lanes / real_lanes, 2),
        "single_device_seconds": round(single_s, 3),
        "mesh_seconds": round(mesh_s, 3),
        "single_launches": single_t["launches"],
        "epochs": epochs,
        "bucket_genes": list(bucket_genes),
        "repeats": n_reps,
    }
    print(
        f"mesh {n_pop}x{n_data} ({jax.devices()[0].device_kind}): "
        f"{pop_size} evals in {mesh_s:.2f}s vs single-device {single_s:.2f}s "
        f"-> x{single_s / mesh_s:.2f}; {mesh_t['launches']} launches, "
        f"lanes/shard {result['lanes_per_shard']}, "
        f"padding x{result['padding_overhead']:.2f}",
        file=sys.stderr,
    )
    print(json.dumps(result))
    done.set()
    return 0


if __name__ == "__main__":
    sys.exit(main())
