"""Grouped-conv population forward must match vmap(apply_model) exactly, and
the grouped trainer must reproduce the vmap trainer's training results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cmoop_audio_processing_tpu.models.grouped import apply_population
from cmoop_audio_processing_tpu.models.supernet import (
    BucketSpec,
    apply_model,
    init_population,
)

GENOMES = [
    dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=3,
         fc_layers=4, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=False, residual_blocks=1,
         fc_layers=1, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=2,
         fc_layers=2, use_dropout=False),
    dict(filters=16, kernel_size=3, use_bn=False, residual_blocks=3,
         fc_layers=3, use_dropout=False),
]


@pytest.mark.parametrize("template", ["A", "B"])
@pytest.mark.parametrize("train", [False, True])
def test_grouped_equals_vmap_forward(template, train):
    spec = BucketSpec(template, 16, 3, num_classes=7)
    params, state, flags = init_population(jax.random.key(0), spec, GENOMES)
    x = jax.random.normal(jax.random.key(1), (5, 20, 9, 1))

    want = jax.vmap(
        lambda p, s, f: apply_model(spec, p, s, f, x, train=train,
                                    dropout_key=jax.random.key(2))
    )(params, state, flags)
    got = apply_population(spec, params, state, flags, x, train=train,
                           dropout_key=jax.random.key(2))
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-4, atol=2e-4
    )
    if train:
        # BN running stats must agree too
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            got[1], want[1],
        )


def test_grouped_trainer_matches_vmap_trainer():
    """Full training runs (few epochs, no dropout randomness differences in
    eval metrics) must produce near-identical fitness from both impls."""
    from cmoop_audio_processing_tpu.engine.trainer import (
        TrainSettings,
        make_population_trainer,
        pad_dataset,
    )

    spec = BucketSpec("A", 16, 3, num_classes=5, compute_dtype="float32")
    genomes = GENOMES[:2]
    rng = np.random.default_rng(0)
    xtr_, ytr_ = (
        rng.standard_normal((96, 16, 8, 1)).astype(np.float32),
        rng.integers(0, 5, 96).astype(np.int32),
    )
    # inject class signal so training moves
    for c in range(5):
        xtr_[ytr_ == c, c % 16, :, 0] += 2.0
    xval_ = xtr_[:64].copy()
    yval_ = ytr_[:64].copy()

    results = {}
    for impl in ("vmap", "grouped"):
        settings = TrainSettings(
            epochs=3, batch_size=32, patience=2, eval_batch_size=32,
            parallel_impl=impl,
        )
        xtr, ytr, wtr = pad_dataset(xtr_, ytr_, 32)
        xval, yval, wval = pad_dataset(xval_, yval_, 32)
        params, state, flags = init_population(jax.random.key(3), spec, genomes)
        trainer = make_population_trainer(spec, settings, 5)
        out = jax.jit(trainer.train)(
            params, state, flags,
            jnp.asarray(xtr), jnp.asarray(ytr), jnp.asarray(wtr),
            jnp.asarray(xval), jnp.asarray(yval), jnp.asarray(wval),
            jax.random.key(4),
        )
        results[impl] = jax.tree.map(np.asarray, out)

    for key in ("acc_eval", "fpr", "val_loss"):
        np.testing.assert_allclose(
            results["grouped"][key], results["vmap"][key], rtol=2e-3, atol=2e-3,
        ), key
    np.testing.assert_array_equal(
        results["grouped"]["epochs_ran"], results["vmap"]["epochs_ran"]
    )


def test_grouped_equals_vmap_forward_with_dropout():
    """Dropout ACTIVE: grouped and vmapped forwards draw identical per-lane
    masks (both fold the genome uid into the step key), so they agree in
    train mode too."""
    genomes = [dict(g, use_dropout=True) for g in GENOMES]
    spec = BucketSpec("A", 16, 3, num_classes=7, dropout_rate=0.3)
    params, state, flags = init_population(jax.random.key(0), spec, genomes)
    x = jax.random.normal(jax.random.key(1), (5, 20, 9, 1))
    dkey = jax.random.key(2)

    lane_keys = jax.vmap(lambda u: jax.random.fold_in(dkey, u))(flags["uid"])
    want = jax.vmap(
        lambda p, s, f, k: apply_model(spec, p, s, f, x, train=True,
                                       dropout_key=k)
    )(params, state, flags, lane_keys)
    got = apply_population(spec, params, state, flags, x, train=True,
                           dropout_key=dkey)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-4, atol=2e-4
    )
