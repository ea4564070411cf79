"""Lane-compaction must not change results: chunked execution with
compaction reproduces the one-shot program's fitness exactly — including
with dropout active (shuffle streams are keyed by global epoch and dropout
streams by genome uid, so chunk boundaries and lane positions are invisible
to the math)."""

import jax
import numpy as np
import pytest

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

GENOMES = [
    dict(filters=16, kernel_size=3, use_bn=False, residual_blocks=1,
         fc_layers=1, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=2,
         fc_layers=2, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=False, residual_blocks=3,
         fc_layers=1, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=1,
         fc_layers=3, use_dropout=False),
]


@pytest.fixture(scope="module")
def data():
    return prepare_dataset(
        DataConfig(synthetic_train=192, synthetic_eval=64, time_steps=16,
                   features=8, num_classes=4)
    )


def _cfg(chunk):
    # 2-gene bucketing on purpose: the mixed-depth GENOMES then share ONE
    # multi-lane bucket, so the chunked path really compacts (4 -> 2 -> 1
    # lanes); the depth-bucketed default would split them into single-lane
    # buckets and leave nothing to compact
    return TrainConfig(
        epochs=12, batch_size=32, patience=2, num_classes=4,
        compute_dtype="float32", compaction_chunk=chunk,
        bucket_genes=("filters", "kernel_size"),
    )


def test_compaction_matches_oneshot(data):
    # low patience + easy data force staggered early stops, so the chunked
    # path actually compacts (4 -> 2 -> 1 lanes)
    fits_oneshot = PopulationEvaluator(data, _cfg(0)).evaluate(GENOMES, seed=3)
    fits_chunked = PopulationEvaluator(data, _cfg(3)).evaluate(GENOMES, seed=3)
    np.testing.assert_allclose(
        np.asarray(fits_chunked), np.asarray(fits_oneshot), rtol=1e-5, atol=1e-6
    )


def test_compaction_matches_oneshot_vmap(data):
    import dataclasses

    fits_oneshot = PopulationEvaluator(
        data, dataclasses.replace(_cfg(0), parallel_impl="vmap")
    ).evaluate(GENOMES, seed=3)
    fits_chunked = PopulationEvaluator(
        data, dataclasses.replace(_cfg(3), parallel_impl="vmap")
    ).evaluate(GENOMES, seed=3)
    np.testing.assert_allclose(
        np.asarray(fits_chunked), np.asarray(fits_oneshot), rtol=1e-5, atol=1e-6
    )


def test_compaction_epochs_respected(data):
    ev = PopulationEvaluator(data, _cfg(4))
    fits = ev.evaluate(GENOMES[:2], seed=1)
    assert all(np.isfinite(np.asarray(fits)).all() for fits in fits)


def test_compaction_matches_oneshot_with_dropout(data):
    """Dropout streams are keyed by genome uid, not lane position, so
    compaction remains exactly result-preserving with dropout ACTIVE."""
    genomes = [dict(g, use_dropout=True) for g in GENOMES]
    fits_oneshot = PopulationEvaluator(data, _cfg(0)).evaluate(genomes, seed=3)
    fits_chunked = PopulationEvaluator(data, _cfg(3)).evaluate(genomes, seed=3)
    np.testing.assert_allclose(
        np.asarray(fits_chunked), np.asarray(fits_oneshot), rtol=1e-5, atol=1e-6
    )


def test_adaptive_chunk_policy(data):
    """-1 resolves per bucket: at small feature maps (where a lockstep epoch
    costs ~nothing, so the heavy-epochs term stays quiet) chunking engages
    only for pop >= 8 lanes AND a long epoch budget; explicit values and a
    device mesh pass through/force off."""
    import dataclasses

    long_cfg = TrainConfig(num_classes=4, compute_dtype="float32")  # 300 ep
    ev = PopulationEvaluator(data, long_cfg)
    spec = ev._bucket_spec(16, 3, 3)
    assert ev._effective_chunk(4, spec) == 0
    assert ev._effective_chunk(8, spec) == 10  # 2*patience(5)
    assert ev._effective_chunk(16, spec) == 10
    short = PopulationEvaluator(data, dataclasses.replace(long_cfg, epochs=30))
    assert short._effective_chunk(16, spec) == 0
    fixed = PopulationEvaluator(
        data, dataclasses.replace(long_cfg, compaction_chunk=3)
    )
    assert fixed._effective_chunk(16, spec) == 3
    off = PopulationEvaluator(
        data, dataclasses.replace(long_cfg, compaction_chunk=0)
    )
    assert off._effective_chunk(16, spec) == 0


def test_launch_duration_bound(data):
    """The adaptive policy also chunks any bucket whose estimated one-shot
    launch time exceeds launch_seconds_budget — even below the 8-lane
    compaction gate (remote workers kill long device programs; the chunked
    path is exactly one-shot-equal, so bounding duration is free)."""
    import dataclasses

    big = prepare_dataset(
        DataConfig(synthetic_train=96, synthetic_eval=48, time_steps=501,
                   features=40, num_classes=11)
    )
    cfg = TrainConfig(num_classes=11, template="B")  # 300-epoch default
    ev = PopulationEvaluator(big, cfg)
    heavy = ev._bucket_spec(64, 5, 1)
    chunk = ev._effective_chunk(2, heavy)
    assert 0 < chunk < cfg.epochs  # bounded launches for the heavy bucket
    # per-chunk estimated seconds stay within the budget
    assert ev._est_epoch_seconds(2, heavy) * chunk <= cfg.launch_seconds_budget
    # the bound scales: more lanes -> shorter chunks
    assert ev._effective_chunk(8, heavy) <= chunk
    # budget 0 disables the duration term entirely
    off = PopulationEvaluator(
        big, dataclasses.replace(cfg, launch_seconds_budget=0.0)
    )
    assert off._effective_chunk(2, heavy) == 0
    # KWS-sized launches at the bench budget never engage it
    kws = PopulationEvaluator(
        data, TrainConfig(num_classes=4, epochs=25, compute_dtype="float32")
    )
    assert kws._effective_chunk(4, kws._bucket_spec(16, 3, 3)) == 0


def test_heavy_lane_split():
    """Under the adaptive policy, big-feature-map buckets split into
    per-genome single-lane launches instead of fusing: at the BirdCLEF
    501x40 shape lockstep fusion bills every lane for the bucket's slowest
    model (round-4 bench: ~39% wasted executed FLOPs vs the serial
    per-genome baseline) while the grouped rate at 2 lanes equals the
    single-lane rate, so fusion buys nothing there (PERF.md)."""
    import dataclasses

    big = prepare_dataset(
        DataConfig(synthetic_train=2000, synthetic_eval=500, time_steps=501,
                   features=40, num_classes=11)
    )
    cfg = TrainConfig(num_classes=11, template="B", epochs=25)
    ev = PopulationEvaluator(big, cfg)
    two = [
        dict(filters=64, kernel_size=5, use_bn=True, residual_blocks=1,
             fc_layers=1, use_dropout=False),
        dict(filters=64, kernel_size=5, use_bn=True, residual_blocks=2,
             fc_layers=2, use_dropout=False),
    ]
    assert ev._should_split_lanes(64, 5, two)
    # an explicitly forced one-shot plan is honored (the A/B baseline arm)
    forced = PopulationEvaluator(
        big, dataclasses.replace(cfg, compaction_chunk=0)
    )
    assert not forced._should_split_lanes(64, 5, two)
    # KWS-sized lanes stay fused: dispatch amortization dominates there
    kws = prepare_dataset(
        DataConfig(synthetic_train=2000, synthetic_eval=500, num_classes=10)
    )
    kws_ev = PopulationEvaluator(kws, TrainConfig(num_classes=10, epochs=25))
    assert not kws_ev._should_split_lanes(16, 3, [
        dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=b,
             fc_layers=1, use_dropout=False) for b in (1, 2)
    ])
    # split lanes remain subject to the launch-duration bound (worker-kill
    # protection chunks an over-budget single-lane program)
    long_cfg = PopulationEvaluator(
        big, dataclasses.replace(cfg, epochs=300)
    )
    assert long_cfg._effective_chunk(1, long_cfg._bucket_spec(64, 5, 2)) > 0


def test_adaptive_auto_matches_oneshot(data):
    """With 8 lanes and a long-enough budget the auto policy engages the
    chunked path — which must still reproduce one-shot fitness exactly."""
    genomes = GENOMES + [dict(g, use_dropout=True) for g in GENOMES]
    cfg_auto = TrainConfig(
        epochs=18, batch_size=32, patience=2, num_classes=4,
        compute_dtype="float32", compaction_chunk=-1,
        bucket_genes=("filters", "kernel_size"),
    )
    ev = PopulationEvaluator(data, cfg_auto)
    # policy engages for this run
    assert ev._effective_chunk(8, ev._bucket_spec(16, 3, 3)) > 0
    fits_auto = ev.evaluate(genomes, seed=3)
    fits_oneshot = PopulationEvaluator(
        data, TrainConfig(
            epochs=18, batch_size=32, patience=2, num_classes=4,
            compute_dtype="float32", compaction_chunk=0,
            bucket_genes=("filters", "kernel_size"),
        )
    ).evaluate(genomes, seed=3)
    np.testing.assert_allclose(
        np.asarray(fits_auto), np.asarray(fits_oneshot), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("impl", ["grouped", "vmap"])
def test_run_full_matches_explicit_chain(data, impl):
    """Direct pin: the fused one-shot bucket program (trainer.run_full —
    in-program genome-keyed init + epoch while_loop + restore-best metrics
    in ONE launch) returns bitwise-identical fitness to the explicit chain
    (host-side init_population_device -> trainer.train). Previously this
    was covered only transitively through compaction==one-shot's tolerance;
    a fused-path regression below that tolerance could hide. Targets the
    bit-for-bit claim at engine/evaluator.py (_run_bucket: 'matching
    _init_bucket_population's host-side folding bit for bit')."""
    import dataclasses
    import jax.numpy as jnp

    genomes = [dict(g, use_dropout=True) for g in GENOMES]
    cfg = dataclasses.replace(_cfg(0), parallel_impl=impl)
    ev = PopulationEvaluator(data, cfg)
    spec = ev._bucket_spec(16, 3, 3)
    trainer = ev._get_trainer(spec, len(genomes))
    seed = 3
    cap = jnp.asarray(cfg.epochs, jnp.int32)

    # explicit chain: whole-population init on host, then the params-in path
    params, state, flags, train_key = ev._init_bucket_population(
        spec, genomes, seed
    )
    chain = trainer.train(
        params, state, flags, *ev._train, *ev._val, train_key
    )

    # fused single-launch path: init happens INSIDE the program from uids
    from cmoop_audio_processing_tpu.models.supernet import stack_flags

    base_key = jax.random.key(seed)
    fused = trainer.run_full(
        stack_flags(genomes), *ev._train, *ev._val,
        base_key, jax.random.fold_in(base_key, 1), cap,
    )
    assert set(fused) == set(chain)
    for k in fused:
        np.testing.assert_array_equal(
            np.asarray(fused[k]), np.asarray(chain[k]), err_msg=k
        )


def test_bounded_inflight_dispatch_matches_unbounded(data, monkeypatch):
    """CMOOP_MAX_INFLIGHT bounds how many device programs are outstanding
    at once (worker-wedge protection for heavy launch plans: 15 in-flight
    BirdCLEF-501x40 programs futex-hung the remote worker, 8 survived —
    PERF.md round 4). The claim the evaluator makes — materialization order
    equals launch order, so a bounded window returns results identical to
    the unbounded overlap pass — is pinned here: the same 4-launch plan
    under window 1 vs unbounded gives bitwise-equal fitness (CPU f32)."""
    import dataclasses

    cfg = dataclasses.replace(_cfg(0), max_models_per_program=1, epochs=6)

    monkeypatch.setenv("CMOOP_MAX_INFLIGHT", "0")
    ev_free = PopulationEvaluator(data, cfg)
    fits_free = ev_free.evaluate(GENOMES, seed=3)
    assert ev_free.timings[-1]["launches"] == len(GENOMES)

    monkeypatch.setenv("CMOOP_MAX_INFLIGHT", "1")
    ev_bound = PopulationEvaluator(data, cfg)
    fits_bound = ev_bound.evaluate(GENOMES, seed=3)
    assert ev_bound.timings[-1]["launches"] == len(GENOMES)

    np.testing.assert_array_equal(
        np.asarray(fits_bound), np.asarray(fits_free)
    )


def test_training_invariant_to_population_composition(data):
    """A genome's fitness is a function of (genome, seed, dataset) alone:
    evaluating it alone or inside a population of different genomes gives
    the same result (genome-keyed init + uid-keyed dropout + shared
    seed-keyed shuffle)."""
    import dataclasses

    target = dict(GENOMES[1], use_dropout=True)
    others = [dict(g, use_dropout=True) for g in (GENOMES[0], GENOMES[2],
                                                  GENOMES[3])]
    cfg = dataclasses.replace(_cfg(0), parallel_impl="vmap")
    alone = PopulationEvaluator(data, cfg).evaluate([target], seed=3)[0]
    in_pop = PopulationEvaluator(data, cfg).evaluate(
        others[:2] + [target] + others[2:], seed=3)[2]
    np.testing.assert_allclose(np.asarray(in_pop), np.asarray(alone),
                               rtol=1e-5, atol=1e-6)


def test_stop_epoch_packing_groups_launches_and_preserves_fitness(data):
    """TrainConfig.pack_by_stop_epoch: when a bucket splits into several
    launches, genomes are grouped by their recorded stop epochs (fast
    stoppers share a launch that exits early) — and fitness is unchanged
    (composition invariance). Depth doubles as the observable here: fast
    genomes are deep, slow ones shallow, so a packed split yields one
    max_blocks=3 launch and one max_blocks=1 launch, while the unpacked
    interleaved order yields two max_blocks=3 launches.

    The bitwise fitness equality here is CPU scope; on TPU a re-packed
    launch can compile at a different max_blocks level, whose matmul
    retiling drifts fitness by ~1 val sample (bisected in
    examples/bisect_composition_tpu.py, PERF.md round 4)."""
    import dataclasses

    from cmoop_audio_processing_tpu.core.genome import genome_key

    deep_fast = [dict(filters=16, kernel_size=3, use_bn=i % 2 == 0,
                      residual_blocks=3, fc_layers=1 + i, use_dropout=False)
                 for i in range(4)]
    shallow_slow = [dict(filters=16, kernel_size=3, use_bn=i % 2 == 1,
                         residual_blocks=1, fc_layers=1 + i,
                         use_dropout=False)
                    for i in range(4)]
    # interleaved input order: every contiguous 4-chunk mixes both groups
    genomes = [g for pair in zip(deep_fast, shallow_slow) for g in pair]
    cfg = dataclasses.replace(
        _cfg(0), max_models_per_program=4, epochs=4,
    )

    def history(ev):
        for g in deep_fast:
            ev._epoch_history[genome_key(g)] = 2.0
        for g in shallow_slow:
            ev._epoch_history[genome_key(g)] = 30.0

    ev_packed = PopulationEvaluator(data, cfg)
    history(ev_packed)
    fits_packed = ev_packed.evaluate(genomes, seed=3)
    packed_blocks = sorted(
        c["max_blocks"] for c in ev_packed.timings[-1]["chunks"]
    )
    assert packed_blocks == [1, 3], ev_packed.timings[-1]["chunks"]

    ev_plain = PopulationEvaluator(
        data, dataclasses.replace(cfg, pack_by_stop_epoch=False)
    )
    history(ev_plain)  # history present but packing off -> input order
    fits_plain = ev_plain.evaluate(genomes, seed=3)
    plain_blocks = sorted(
        c["max_blocks"] for c in ev_plain.timings[-1]["chunks"]
    )
    assert plain_blocks == [3, 3], ev_plain.timings[-1]["chunks"]

    # packing must not change any genome's fitness (f32 CPU: exact)
    np.testing.assert_array_equal(
        np.asarray(fits_packed), np.asarray(fits_plain)
    )

    # with no history, unknown genomes keep input order (stable no-op)
    ev_cold = PopulationEvaluator(data, cfg)
    ev_cold.evaluate(genomes, seed=3)
    cold_blocks = sorted(
        c["max_blocks"] for c in ev_cold.timings[-1]["chunks"]
    )
    assert cold_blocks == [3, 3], ev_cold.timings[-1]["chunks"]
    # ... and the run itself populates the predictor for the next call
    assert len(ev_cold._epoch_history) == len(genomes)
