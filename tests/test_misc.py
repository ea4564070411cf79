"""Coverage for the ops index, compile cache, and records helpers."""

import os

import numpy as np
import pytest


def test_ops_index_exports():
    import cmoop_audio_processing_tpu.ops as ops

    for name in ops.__all__:
        assert callable(getattr(ops, name)), name


def test_compile_cache_idempotent(tmp_path, monkeypatch):
    import jax

    from cmoop_audio_processing_tpu.utils import compile_cache as cc

    monkeypatch.setattr(cc, "_enabled", False)
    path = cc.enable_persistent_cache(str(tmp_path / "cache"))
    assert os.path.isdir(path)
    # second call is a no-op returning the active path
    path2 = cc.enable_persistent_cache(str(tmp_path / "other"))
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_metrics_of_fallback():
    from cmoop_audio_processing_tpu.core.records import metrics_of

    # legacy 3-objective record without the metrics field
    m = metrics_of({"objs": [-0.9, 1.5, 0.05], "CV": 0.0})
    assert m == {"acc": 0.9, "size": 1.5, "fpr": 0.05}


def test_front_metrics_array():
    from cmoop_audio_processing_tpu.core.config import Constraints
    from cmoop_audio_processing_tpu.core.genome import all_genomes
    from cmoop_audio_processing_tpu.core.records import (
        front_metrics_array,
        make_individual,
    )

    inds = [
        make_individual(g, 0.9 + i * 0.01, 1.0, 0.05, Constraints())
        for i, g in enumerate(all_genomes()[:3])
    ]
    arr = front_metrics_array(inds)
    assert arr.shape == (3, 3)
    np.testing.assert_allclose(arr[:, 0], [0.9, 0.91, 0.92])


def test_gather_lanes_preserves_scalars():
    import jax.numpy as jnp

    from cmoop_audio_processing_tpu.engine.trainer import gather_lanes

    carry = {
        "a": jnp.arange(8.0).reshape(8, 1),
        "epoch": jnp.asarray(5, jnp.int32),
        "nested": {"b": jnp.arange(8)},
    }
    out = gather_lanes(carry, np.array([3, 1]))
    np.testing.assert_allclose(np.asarray(out["a"]).ravel(), [3.0, 1.0])
    assert int(out["epoch"]) == 5
    np.testing.assert_array_equal(np.asarray(out["nested"]["b"]), [3, 1])


def test_evaluator_rejects_malformed_bucket_genes():
    """evaluate() reads bucket-key slots 0/1 as (filters, kernel_size); a
    reordered or unknown bucket_genes must fail loudly at construction."""
    import pytest

    from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
    from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
    from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator

    data = prepare_dataset(
        DataConfig(synthetic_train=32, synthetic_eval=32, time_steps=8,
                   features=8, num_classes=4)
    )
    for bad in (
        ("residual_blocks", "filters", "kernel_size"),
        ("filters",),
        ("filters", "kernel_size", "nope"),
    ):
        with pytest.raises(ValueError):
            PopulationEvaluator(
                data, TrainConfig(num_classes=4, bucket_genes=bad)
            )
    # depth-bucketing (extra trailing genes) is legal
    PopulationEvaluator(
        data,
        TrainConfig(
            num_classes=4,
            bucket_genes=("filters", "kernel_size", "residual_blocks"),
        ),
    )


def test_init_population_rejects_overdeep_genome():
    """A genome deeper than the bucket's max_blocks would silently select an
    all-zero GAP exit; the host-side init guard must reject it."""
    import jax
    import jax.numpy as jnp
    import pytest

    from cmoop_audio_processing_tpu.models.supernet import (
        BucketSpec,
        init_population_device,
        stack_flags,
    )

    g3 = dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=3,
              fc_layers=1, use_dropout=False)
    flags = stack_flags([g3])
    with pytest.raises(ValueError, match="max_blocks"):
        init_population_device(
            jnp.stack([jax.random.key(0)]), flags["n_blocks"],
            flags["fc_entry"], BucketSpec("A", 16, 3, 4, max_blocks=2),
        )
