"""Controlled bisect of composition-invariance scope on TPU (PERF.md r4).

Run on a real TPU (`PYTHONPATH=/root/repo:/root/.axon_site python
examples/bisect_composition_tpu.py`; BI_DTYPE=float32 for the f32
control, BI_EPOCHS to shrink). On CPU every experiment is bitwise SAME
(that's what tests/test_compaction.py pins); on TPU the findings were:

16 genomes, one (32,5) 2-gene bucket, max_models_per_program=8 ->
two launches of 8. pack_by_stop_epoch=False so WE control the order.

E1: identical order twice            -> SAME (deterministic)
E2: reverse lanes within each launch -> SAME (lane position irrelevant)
E3: swap same-depth genomes across launches (launch max depths unchanged)
    -> only lanes whose OWN launch specialization level changed drift
E4: swap rb=3 into the max-depth-2 launch (its specialization 2 -> 3)
    -> lanes of the re-specialized launch drift (bf16 AND f32): a
       different max_blocks compiles a different XLA program, TPU matmul
       tiling rounds differently, early stopping amplifies (~1-7 val
       samples of accuracy; stop-epoch shifts up to 42->72).
"""
import os
import sys

sys.path.insert(0, "/root/repo")

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

EPOCHS = int(os.environ.get("BI_EPOCHS", "80"))
DTYPE = os.environ.get("BI_DTYPE", "bfloat16")


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
    # launch 1 = idx 0-7 (rb 1,1,1,1,2,2,2,2 -> max_blocks 2)
    # launch 2 = idx 8-15 (rb 3,3,3,3,2,2,2,2 -> max_blocks 3)

    cfg = TrainConfig(
        epochs=EPOCHS, patience=5, compute_dtype=DTYPE, template="B",
        bucket_genes=("filters", "kernel_size"),
        max_models_per_program=8,
        compaction_chunk=0,
        launch_seconds_budget=0,
        pack_by_stop_epoch=False,
    )
    ev = PopulationEvaluator(data, cfg)

    fits0 = ev.evaluate(genomes, seed=1)
    rec = ev.timings[-1]
    epochs = []
    for launch in rec["chunks"]:
        epochs.extend(launch["epochs"])
    print(f"stop epochs (input order): {epochs}", flush=True)

    def run(order, name):
        gs = [genomes[i] for i in order]
        fits = ev.evaluate(gs, seed=1)
        erec = ev.timings[-1]
        eps = []
        for launch in erec["chunks"]:
            eps.extend(launch["epochs"])
        ndiff = 0
        for pos, (i, f) in enumerate(zip(order, fits)):
            if f != fits0[i]:
                ndiff += 1
                d = tuple(a - b for a, b in zip(f, fits0[i]))
                print(
                    f"  [{name}] lane {pos} (genome {i}, rb="
                    f"{genomes[i]['residual_blocks']}): delta={d} "
                    f"epochs {eps[pos]} vs {epochs[i]}",
                    flush=True,
                )
        print(f"[{name}] {'SAME' if ndiff == 0 else f'{ndiff} lanes DIFFER'}",
              flush=True)

    run(list(range(16)), "E1 identical order")
    run([7, 6, 5, 4, 3, 2, 1, 0, 15, 14, 13, 12, 11, 10, 9, 8],
        "E2 within-launch reverse")
    o3 = list(range(16))
    o3[4], o3[12] = o3[12], o3[4]  # both rb=2; launch maxes stay 2 / 3
    run(o3, "E3 same-depth cross-launch swap")
    o4 = list(range(16))
    o4[0], o4[8] = o4[8], o4[0]  # rb3 into launch1 -> its max_blocks 2->3
    run(o4, "E4 depth-changing swap")


if __name__ == "__main__":
    main()
