"""Durable fitness cache: mid-generation crash recovery (utils/
fitness_cache.py). Soundness rests on the pinned idempotence invariant
(same genome + seed -> same fitness regardless of composition); these
tests pin the cache machinery itself: exact replay, partial-population
mixes, fingerprint safety, and crash-truncated files."""

import json
import os

import numpy as np
import pytest

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.core.genome import all_genomes
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator
from cmoop_audio_processing_tpu.utils.fitness_cache import (
    FitnessCache,
    evaluator_fingerprint,
)

CFG = TrainConfig(
    epochs=3, batch_size=32, patience=2, num_classes=4,
    compute_dtype="float32",
)


def small_data():
    return prepare_dataset(DataConfig(
        synthetic_train=64, synthetic_eval=32, time_steps=12, features=8,
        num_classes=4,
    ))


GENOMES = [g for g in all_genomes() if g["filters"] == 16][:6]


def test_cache_roundtrip_and_truncation(tmp_path):
    data = small_data()
    fp = evaluator_fingerprint(CFG, data)
    path = str(tmp_path / "cache.jsonl")
    c = FitnessCache(path, fp)
    assert len(c) == 0
    c.put_many([(GENOMES[0], 0, (0.5, 1.0, 0.1)),
                (GENOMES[1], 0, (0.6, 2.0, 0.2))])
    # reload sees both; a crash-truncated final line is skipped
    with open(path, "a") as f:
        f.write('{"g": [16, 3, true')  # no newline: torn append
    c2 = FitnessCache(path, fp)
    assert len(c2) == 2
    assert c2.get(GENOMES[0], 0) == (0.5, 1.0, 0.1)
    assert c2.get(GENOMES[1], 0) == (0.6, 2.0, 0.2)
    assert c2.get(GENOMES[0], 1) is None  # seed is part of the key
    assert c2.get(GENOMES[2], 0) is None
    # the torn tail was REPAIRED on load: an append after the resume must
    # not concatenate onto the fragment (which would permanently lose the
    # first record written after every torn-tail resume)
    c2.put_many([(GENOMES[2], 0, (0.7, 3.0, 0.3))])
    c3 = FitnessCache(path, fp)
    assert len(c3) == 3
    assert c3.get(GENOMES[2], 0) == (0.7, 3.0, 0.3)


def test_cache_rejects_foreign_fingerprint(tmp_path):
    data = small_data()
    path = str(tmp_path / "cache.jsonl")
    FitnessCache(path, evaluator_fingerprint(CFG, data))
    other = evaluator_fingerprint(
        TrainConfig(epochs=5, batch_size=32, patience=2, num_classes=4),
        data,
    )
    with pytest.raises(ValueError, match="different training config"):
        FitnessCache(path, other)
    # dataset content changes are also fatal
    data2 = dict(data)
    data2["x_train"] = data2["x_train"] + 1e-3
    with pytest.raises(ValueError, match="different training config"):
        FitnessCache(path, evaluator_fingerprint(CFG, data2))
    # mesh widths change numerics (~1e-3 tolerance pins, not equality):
    # both axes are part of the identity
    base = evaluator_fingerprint(CFG, data)
    assert evaluator_fingerprint(CFG, data, data_axis=2) != base
    assert evaluator_fingerprint(CFG, data, pop_axis=2) != base
    # and a mesh evaluator builds a pop_axis-bearing fingerprint: it must
    # reject a cache recorded without the mesh
    from cmoop_audio_processing_tpu.parallel.mesh import population_mesh

    with pytest.raises(ValueError, match="different training config"):
        PopulationEvaluator(
            data, CFG, mesh=population_mesh(2, 1), fitness_cache_path=path
        )


def test_evaluator_replays_cached_fitness_exactly(tmp_path):
    """A second evaluator process over the same cache re-launches NOTHING
    and returns bitwise-identical fitness; a partial population trains only
    the missing genomes and matches an uncached evaluation exactly."""
    data = small_data()
    path = str(tmp_path / "fits.jsonl")

    ev_plain = PopulationEvaluator(data, CFG)
    ref = np.asarray(ev_plain.evaluate(GENOMES, seed=7))

    ev1 = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    first = np.asarray(ev1.evaluate(GENOMES[:4], seed=7))
    np.testing.assert_array_equal(first, ref[:4])
    assert ev1.timings[-1]["cache_hits"] == 0
    assert ev1.total_true_evals == 4

    # "crash + resume": a fresh evaluator (fresh jit caches) over the same
    # cache file, now with the full population — only the 2 new genomes train
    ev2 = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    out = np.asarray(ev2.evaluate(GENOMES, seed=7))
    np.testing.assert_array_equal(out, ref)
    assert ev2.timings[-1]["cache_hits"] == 4
    assert ev2.total_true_evals == 2

    # full replay: zero launches
    ev3 = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    out3 = np.asarray(ev3.evaluate(GENOMES, seed=7))
    np.testing.assert_array_equal(out3, ref)
    assert ev3.timings[-1]["cache_hits"] == 6
    assert ev3.timings[-1]["launches"] == 0
    assert ev3.total_true_evals == 0

    # a different seed is a different training — nothing replays
    ev4 = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    ev4.evaluate(GENOMES[:1], seed=8)
    assert ev4.timings[-1]["cache_hits"] == 0


def test_cache_written_per_bucket_not_per_generation(tmp_path, monkeypatch):
    """Durability granularity: each bucket's trainings hit the cache as the
    bucket materializes, so a crash mid-generation loses only the buckets
    still in flight — not the whole generation."""
    from cmoop_audio_processing_tpu.utils import fitness_cache as fc_mod

    data = small_data()
    path = str(tmp_path / "fits.jsonl")
    calls = []
    orig = fc_mod.FitnessCache.put_many

    def spy(self, entries):
        calls.append(len(list(entries)))
        return orig(self, entries)

    monkeypatch.setattr(fc_mod.FitnessCache, "put_many", spy)
    ev = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    # two distinct (filters, kernel) buckets -> two launches -> two appends
    by_kernel = {}
    for g in all_genomes():
        if g["filters"] == 16 and g["residual_blocks"] == 1:
            by_kernel.setdefault(g["kernel_size"], g)
    gs = list(by_kernel.values())
    assert len({(g["filters"], g["kernel_size"]) for g in gs}) == 2
    ev.evaluate(gs, seed=0)
    assert len(calls) == 2 and all(c == 1 for c in calls), calls


def test_sync_dispatch_equal_and_durable_per_launch(tmp_path, monkeypatch):
    """CMOOP_SYNC_DISPATCH=1 materializes each launch before dispatching the
    next: results are bitwise-identical to the overlapped path, AND every
    finished launch is already durable when the next one starts — a worker
    crash at launch N loses nothing from launches < N."""
    data = small_data()

    # two distinct (filters, kernel) buckets -> two launches
    by_kernel = {}
    for g in all_genomes():
        if g["filters"] == 16 and g["residual_blocks"] == 1:
            by_kernel.setdefault(g["kernel_size"], g)
    gs = list(by_kernel.values())
    assert len(gs) == 2

    ref = np.asarray(PopulationEvaluator(data, CFG).evaluate(gs, seed=5))

    monkeypatch.setenv("CMOOP_SYNC_DISPATCH", "1")
    path = str(tmp_path / "fits.jsonl")
    ev = PopulationEvaluator(data, CFG, fitness_cache_path=path)
    out = np.asarray(ev.evaluate(gs, seed=5))
    np.testing.assert_array_equal(out, ref)

    # crash during launch 2: launch 1's result must already be on disk
    path2 = str(tmp_path / "crash.jsonl")
    ev2 = PopulationEvaluator(data, CFG, fitness_cache_path=path2)
    orig = PopulationEvaluator._run_bucket
    launches = []

    def crash_on_second(self, spec, padded, seed):
        launches.append(spec)
        if len(launches) == 2:
            raise RuntimeError("worker died")
        return orig(self, spec, padded, seed)

    monkeypatch.setattr(PopulationEvaluator, "_run_bucket", crash_on_second)
    with pytest.raises(RuntimeError, match="worker died"):
        ev2.evaluate(gs, seed=5)
    monkeypatch.setattr(PopulationEvaluator, "_run_bucket", orig)

    replay = FitnessCache(path2, ev2.fitness_cache.fingerprint)
    survived = [g for g in gs if replay.get(g, 5) is not None]
    assert len(survived) == 1  # the finished launch, not zero
    # and the resume replays it bitwise + completes the rest
    ev3 = PopulationEvaluator(data, CFG, fitness_cache_path=path2)
    out3 = np.asarray(ev3.evaluate(gs, seed=5))
    np.testing.assert_array_equal(out3, ref)
    assert ev3.timings[-1]["cache_hits"] == 1


def test_cli_resume_uses_cache(tmp_path, monkeypatch):
    """The cache is on by default for every real run (so a first run that
    crashes already has its finished trainings on disk); a fresh run
    truncates a stale cache, --resume opens and replays it."""
    import dataclasses

    from cmoop_audio_processing_tpu.cli.main import main
    from cmoop_audio_processing_tpu.core.config import PRESETS, get_preset

    base = get_preset("nsga_penalty")
    tiny = base.replace(
        data=dataclasses.replace(
            base.data, synthetic_train=64, synthetic_eval=32,
            time_steps=12, features=8, num_classes=4,
        ),
        train=dataclasses.replace(
            base.train, epochs=2, batch_size=32, patience=2, num_classes=4,
            compute_dtype="float32",
        ),
    )
    monkeypatch.setitem(PRESETS, "nsga_penalty", tiny)

    out = str(tmp_path / "run")
    args = [
        "--preset", "nsga_penalty", "--out", out, "--seed", "3",
        "--pop-size", "4", "--max-gen", "2", "--resume",
    ]
    # default-on even WITHOUT --resume: a stale cache under a different
    # fingerprint is truncated (not an error) and the run records into it
    cache = os.path.join(out, "nsga_penalty", "fitness_cache.jsonl")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    with open(cache, "w") as f:
        f.write('{"fingerprint": {"format": 0, "stale": true}}\n')
    assert main(args[:-1]) == 0  # no --resume
    with open(cache) as f:
        lines = [json.loads(x) for x in f.read().splitlines() if x]
    assert lines[0]["fingerprint"].get("format") == 2  # truncated + rewritten
    assert len(lines) > 1
    assert main(args) == 0
    assert os.path.exists(cache)
    with open(cache) as f:
        lines = [json.loads(x) for x in f.read().splitlines() if x]
    assert "fingerprint" in lines[0]
    assert len(lines) > 1  # trainings recorded
    # a second --resume pass opens the same cache (fingerprint accepted)
    # and completes as a no-op continuation
    assert main(args) == 0
    # --fake-eval with an explicit cache path is rejected outright (the
    # fake path records nothing and must never delete a real run's cache)
    with pytest.raises(SystemExit, match="real evaluator"):
        main([
            "--preset", "nsga_penalty", "--out", out, "--seed", "3",
            "--pop-size", "4", "--max-gen", "1", "--fake-eval",
            "--fitness-cache", cache,
        ])
    assert os.path.exists(cache)  # untouched
    # --fitness-cache off disables wiring even under --resume
    out2 = str(tmp_path / "run2")
    assert main([
        "--preset", "nsga_penalty", "--out", out2, "--seed", "3",
        "--pop-size", "4", "--max-gen", "1", "--resume",
        "--fitness-cache", "off",
    ]) == 0
    assert not os.path.exists(
        os.path.join(out2, "nsga_penalty", "fitness_cache.jsonl")
    )
