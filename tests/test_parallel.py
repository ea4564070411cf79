"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 5)."""

import jax
import numpy as np
import pytest

from cmoop_audio_processing_tpu.parallel.mesh import (
    batch_sharding,
    pop_sharding,
    population_mesh,
    replicated,
    shard_population,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_population_mesh_axes():
    mesh = population_mesh(8, 1)
    assert mesh.axis_names == ("pop", "data")
    assert mesh.devices.shape == (8, 1)
    mesh2 = population_mesh(4, 2)
    assert mesh2.devices.shape == (4, 2)


def test_population_mesh_too_many_devices():
    with pytest.raises(ValueError):
        population_mesh(16, 1)


def test_shard_population_places_leading_axis():
    mesh = population_mesh(8, 1)
    tree = {"w": np.zeros((8, 4, 4)), "b": np.zeros((8,))}
    sharded = shard_population(tree, mesh)
    # each device holds 1/8 of the leading axis
    shard_shapes = {
        k: v.sharding.shard_shape(v.shape) for k, v in sharded.items()
    }
    assert shard_shapes["w"] == (1, 4, 4)
    assert shard_shapes["b"] == (1,)


def test_sharded_computation_matches_single_device():
    mesh = population_mesh(8, 1)
    x = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    xs = jax.device_put(x, pop_sharding(mesh))

    f = jax.jit(lambda a: (a ** 2).sum(axis=1))
    np.testing.assert_allclose(np.asarray(f(xs)), np.asarray(f(x)), rtol=1e-6)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    logits = jax.jit(fn)(*args)
    assert logits.shape[0] == 4  # population axis
    assert np.isfinite(np.asarray(logits)).all()


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)  # asserts internally


def test_population_evaluator_on_mesh():
    """The full evaluator path with a device mesh: population axis sharded
    over 8 virtual devices, vmap lanes, one-shot training."""
    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

    data = prepare_dataset(
        DataConfig(synthetic_train=64, synthetic_eval=32, time_steps=12,
                   features=8, num_classes=4)
    )
    mesh = population_mesh(8, 1)
    cfg = TrainConfig(
        epochs=2, batch_size=32, patience=2, num_classes=4,
        compute_dtype="float32",
    )
    ev = PopulationEvaluator(data, cfg, mesh=mesh)
    assert ev.settings.parallel_impl == "vmap"  # mesh forces per-model lanes
    genomes = [g for g in all_genomes() if g["filters"] == 16 and g["kernel_size"] == 3][:8]
    fits = ev.evaluate(genomes, seed=0)
    arr = np.asarray(fits)
    assert arr.shape == (8, 3)
    assert np.isfinite(arr).all()
    assert (arr[:, 1] > 0).all()  # sizes positive
