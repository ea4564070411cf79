"""Train-and-export path: the saved model must reproduce the search's
reported fitness (same genome-keyed init and training streams), and the
npz round-trip must be lossless."""

import json
import os

import numpy as np
import pytest

from cmoop_audio_processing_tpu.core.config import DataConfig, TrainConfig
from cmoop_audio_processing_tpu.data.pipeline import prepare_dataset
from cmoop_audio_processing_tpu.engine.evaluator import PopulationEvaluator
from cmoop_audio_processing_tpu.engine.export import (
    load_model,
    predict,
    save_model,
    train_single,
)

GENOME = dict(filters=16, kernel_size=3, use_bn=True, residual_blocks=2,
              fc_layers=2, use_dropout=True)


@pytest.fixture(scope="module")
def data():
    return prepare_dataset(
        DataConfig(synthetic_train=128, synthetic_eval=64, time_steps=12,
                   features=8, num_classes=4)
    )


@pytest.fixture(scope="module")
def cfg():
    return TrainConfig(epochs=6, batch_size=32, patience=3, num_classes=4,
                       compute_dtype="float32")


def test_train_single_matches_search_fitness(data, cfg):
    """The exported model's metrics equal the evaluator's fitness for the
    same (genome, seed) — the export path shares every stream."""
    params, state, metrics = train_single(GENOME, data, cfg, seed=5)
    acc, size, fpr = PopulationEvaluator(data, cfg).evaluate(
        [GENOME], seed=5
    )[0]
    assert metrics["accuracy"] == pytest.approx(acc, abs=1e-6)
    assert metrics["size_mb"] == size
    assert metrics["fpr"] == pytest.approx(fpr, abs=1e-6)


def test_save_load_predict_roundtrip(tmp_path, data, cfg):
    params, state, metrics = train_single(GENOME, data, cfg, seed=5)
    out = str(tmp_path / "model")
    save_model(out, GENOME, cfg, params, state, metrics, seed=5)
    assert os.path.exists(os.path.join(out, "model.npz"))
    meta = json.load(open(os.path.join(out, "meta.json")))
    assert meta["genome"] == GENOME and meta["metrics"] == metrics

    genome2, spec, params2, state2, _ = load_model(out)
    assert genome2 == GENOME
    assert spec.max_blocks == GENOME["residual_blocks"]
    # npz round-trip is lossless: reloaded forward == in-memory forward,
    # and its val accuracy equals the reported search accuracy
    logits_mem = predict(spec, GENOME, params, state, data["x_val"])
    logits_re = predict(spec, genome2, params2, state2, data["x_val"])
    np.testing.assert_array_equal(logits_re, logits_mem)
    acc = float((logits_re.argmax(-1) == data["y_val"]).mean())
    assert acc == pytest.approx(metrics["accuracy"], abs=1e-6)


def test_train_final_cli_from_front_csv(tmp_path, data):
    import pandas as pd

    from cmoop_audio_processing_tpu.cli.train_final import main

    front = tmp_path / "front.csv"
    pd.DataFrame([{
        "Accuracy": 0.9, "Size_MB": 0.1, "FPR": 0.01,
        "filters": 16, "kernel_size": 3, "use_bn": True,
        "residual_blocks": 1, "fc_layers": 1, "use_dropout": False,
    }]).to_csv(front, index=False)
    out = str(tmp_path / "deployed")
    rc = main([
        "--preset", "nsga_penalty", "--front", str(front), "--row", "0",
        "--out", out, "--epochs", "2", "--seed", "1",
    ])
    assert rc == 0
    genome, spec, params, state, meta = load_model(out)
    assert genome["residual_blocks"] == 1 and spec.max_blocks == 1
    assert 0.0 <= meta["metrics"]["accuracy"] <= 1.0


def test_committed_deployed_artifact_loads():
    """examples/deployed/ is a real exported model from the full-budget
    front; it must stay loadable and self-consistent."""
    base = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "deployed", "model")
    if not os.path.isdir(base):
        pytest.fail(f"committed artifact missing: {base}")
    genome, spec, params, state, meta = load_model(base)
    assert meta["metrics"]["accuracy"] > 0.9
    assert spec.max_blocks == genome["residual_blocks"]
    h, w = meta["input_hw"]
    x = np.zeros((2, h, w, 1), np.float32)
    logits = predict(spec, genome, params, state, x)
    assert logits.shape == (2, meta["num_classes"])
    assert np.isfinite(logits).all()
